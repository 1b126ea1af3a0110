package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.operators.{EmbDedup, SimilarityOps}

/** Streaming embedding near-dup ≡ batch: the union of per-batch emissions
  * must equal the full q20 exact pairing, each pair exactly once, cosines
  * bit-identical; the incremental read must prune to the batch's label
  * partitions; the banded opt-in must be a strict subset with identical
  * cosines. */
class EmbDedupStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select("label", "vec_id", "embedding")

  test("per-batch emissions union to the full q20 pairing, each pair exactly once") {
    val work = Files.createTempDirectory("graft-embstream").toString
    val got = EmbDedupStream.mineCorpusInChunks(spark, embs, work, chunks = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exactly once: no pair appears in two batches
    assert(got.length == got.toSet.size, "a pair was emitted more than once")
    val want = SimilarityOps.neardupPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty)
    assert(got.toSet == want, s"stream union=${got.length} batch=${want.size}")
  }

  test("incremental read prunes to the batch's label partitions; banded opt-in is a subset") {
    val store = EmbDedup.EmbStore(Files.createTempDirectory("graft-embstore").toString)
    val oldEmbs = embs.filter(col("label") >= 3)
    val newEmbs = embs.filter(col("label") < 3).localCheckpoint()
    store.append(spark, oldEmbs, 0L)
    store.append(spark, newEmbs, 1L)

    // FILES-READ AUDIT: the batch's labels hash to a strict subset of the
    // store's lkey partitions
    val touched = EmbDedup.touchedLabelKeys(spark, newEmbs)
    val pruned = store.prunedPaths(touched)
    val all = store.allPaths
    assert(pruned.nonEmpty && pruned.size < all.size,
      s"no pruning: ${pruned.size} of ${all.size} lkey dirs")

    val exact = EmbDedup.incrementalNeardupPairsStored(spark, store, newEmbs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // ≡ the full exact pairing restricted to pairs touching the batch
    val newIds = newEmbs.select("vec_id").collect().map(_.getLong(0)).toSet
    val want = SimilarityOps.neardupPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => newIds(a) || newIds(b) }.toSet
    assert(exact == want, s"incremental=${exact.size} batch-restricted=${want.size}")

    // banded opt-in: strict subset semantics, identical cosines
    val banded = EmbDedup.incrementalNeardupPairsStored(spark, store, newEmbs,
        bandPrefilter = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(banded.subsetOf(exact), "banded tier must never invent pairs")
  }

  test("batch-id append is idempotent (foreachBatch replay overwrites, never duplicates)") {
    val store = EmbDedup.EmbStore(Files.createTempDirectory("graft-embidem").toString)
    val batch = embs.filter(col("vec_id") < 100).localCheckpoint()
    store.append(spark, batch, 0L)
    store.append(spark, batch, 0L) // replay
    val n = store.rowsTouching(spark, (0 until EmbDedup.labelPartitions).toSet)
      .groupBy("vec_id").count().filter(col("count") > 1).count()
    assert(n == 0, "replayed batch id must not duplicate rows")
  }
}
