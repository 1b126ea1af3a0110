package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming dedup ≡ batch dedup: documents streamed in two microbatches
  * produce, across their per-batch emissions, EXACTLY the full batch
  * pairing — each pair emitted once, by the batch that completed it.
  * (Known semantic edge, documented on DedupStream: the mega-bucket cap is
  * evaluated at emission time, so a band bucket crossing the cap BETWEEN
  * batches could keep early pairs a full recompute would drop — monotone
  * emission can't retract. This corpus crosses no cap, which the equality
  * below implicitly checks.) */
class DedupStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("dedup-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("per-batch incremental pairs union to the full batch pairing, each pair exactly once") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = Files.createTempDirectory("graft-dedup-stream").toString
    docs.filter(col("doc_id") < 250).write.parquet(s"$dir/in/c0")
    docs.filter(col("doc_id") >= 250).write.parquet(s"$dir/in/c1")

    def feed(chunk: Int): Unit =
      StreamFeed.feed(s"$dir/in/c$chunk", s"$dir/docs", s"c$chunk")
    def drain(): Unit = {
      // a FRESH query per chunk (same checkpoint): deterministic one batch
      // per chunk — no mid-copy trigger race — and exercises resume
      val q = DedupStream.start(spark, s"$dir/docs", docs.schema,
        s"$dir/sigs", s"$dir/pairs", s"$dir/ckpt")
      try q.processAllAvailable() finally q.stop()
    }
    feed(0); drain()
    feed(1); drain()

    val emitted = spark.read.parquet(s"$dir/pairs")
    val got = emitted.select("a", "b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = graft.operators.DedupOps.lshVerifiedPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty && got.length == got.toSet.size, "a pair was emitted twice")
    assert(got.toSet == want.toSet, s"stream=${got.length} batch=${want.length}")

    // each pair was completed by the batch holding its LATER doc: batch 0
    // must emit only pairs fully below the split
    val byBatch = emitted.groupBy("batch_id").agg(max(col("b")).as("maxb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBatch.keySet == Set(0L, 1L))
    assert(byBatch(0L) < 250L)

    // the accumulated signature store holds each doc exactly once
    val sigCount = spark.read.parquet(s"$dir/sigs/rows").groupBy("doc_id").count()
      .filter(col("count") > 1).count()
    assert(sigCount == 0)
    // and the band index is bkey-partitioned on disk (the pruning layout)
    assert(graft.operators.DedupOps.SigStore(s"$dir/sigs").allBandPaths.nonEmpty)
  }
}
