package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextIndex

class TextIndexStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("text-index-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streamed (waves + mid-corpus compaction + resume) index == batch index") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-tis"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))

    val streamed = TextIndexStream.indexCorpusInChunks(
      spark, docs, s"$root/stream", chunks = 4)

    val batchIdx = TextIndex.create(s"$root/batch", buckets = 32)
    batchIdx.append(docs, 1L)

    assert(streamed.corpusStats == batchIdx.corpusStats)
    for (terms <- Seq(Seq("spark", "join"), Seq("dup"))) {
      def res(ix: TextIndex.Index) = ix.searchAll(spark, terms)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val exp = res(batchIdx)
      assert(exp.nonEmpty)
      assert(res(streamed) == exp)
    }
    // ranked retrieval rides the streamed sidecars identically
    def top(ix: TextIndex.Index) = ix.rankedSearch(spark, Seq("spark", "join"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(streamed) == top(batchIdx))
    // the mid-corpus compaction left exactly one consolidated dir plus the
    // post-resume waves' batch dirs
    import graft.operators.BatchStore
    val live = BatchStore.liveBatchDirs(streamed.postingsDir).map(BatchStore.batchIdOf)
    assert(live.contains(1000000L), s"consolidated dir must be live, got $live")
    assert(live.size >= 2, s"post-resume microbatches must stay live, got $live")
  }
}
