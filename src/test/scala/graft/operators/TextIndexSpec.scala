package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("text-index-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft-textindex-$tag"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  /** brute-force AND search straight off the documents frame */
  private def bruteForce(docs: org.apache.spark.sql.DataFrame,
      terms: Seq[String]): Seq[(Long, Long)] =
    TextIndex.postings(docs)
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nt"), sum("tf").as("score"))
      .filter(col("nt") === terms.distinct.size)
      .select("doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("incremental build == brute force; query reads only the terms' bucket dirs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val idx = TextIndex.create(tmp("basic"), buckets = 16)
    idx.append(docs.filter(col("doc_id") % 3 =!= 0), 1L)
    idx.append(docs.filter(col("doc_id") % 3 === 0), 2L)

    for (terms <- Seq(Seq("dup"), Seq("spark", "merge"), Seq("dup", "window", "join"))) {
      val got = idx.searchAll(spark, terms)
      val exp = bruteForce(docs, terms)
      assert(exp.nonEmpty, s"test needs matches for $terms")
      assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq == exp)

      // files-read audit: every file the query scans sits under a pruned
      // tbucket dir of one of the query terms, and pruning is structural
      val pruned = idx.prunedPaths(terms)
      assert(pruned.size < idx.allPaths.size,
        s"no pruning for $terms: ${pruned.size} of ${idx.allPaths.size}")
      val files = got.inputFiles
      assert(files.nonEmpty)
      files.foreach { f =>
        val path = new java.net.URI(f).getPath
        assert(pruned.exists(path.startsWith),
          s"query read $f outside pruned dirs $pruned")
      }
    }
  }

  test("phrase search == independent sliding-window count; reads only term buckets") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val idx = TextIndex.create(tmp("phrase"), buckets = 16)
    idx.appendPositional(docs.filter(col("doc_id") % 3 =!= 0), 1L)
    idx.appendPositional(docs.filter(col("doc_id") % 3 === 0), 2L)

    // independent oracle: sliding-window count on the driver
    val toks: Seq[(Long, Array[String])] = docs
      .select(col("doc_id"), expr(TextOps.wordsSpark).as("ws"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toArray)).toSeq
    def brute(ph: Seq[String]): Seq[(Long, Long)] = toks.flatMap { case (id, ws) =>
      val n = ws.sliding(ph.size).count(_.sameElements(ph))
      if (n > 0) Some((id, n.toLong)) else None
    }.sortBy(_._1)

    for (ph <- Seq(Seq("batch", "batch"), Seq("stream", "spark"), Seq("merge", "line"))) {
      val exp = brute(ph)
      assert(exp.nonEmpty, s"test needs occurrences of $ph")
      val got = idx.phraseSearch(spark, ph)
      assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq == exp)
      val pruned = idx.prunedPositionalPaths(ph.distinct)
      assert(pruned.size < idx.allPositionalPaths.size)
      got.inputFiles.foreach { f =>
        val path = new java.net.URI(f).getPath
        assert(pruned.exists(path.startsWith), s"read $f outside $pruned")
      }
    }
  }

  test("re-appending a batch id is idempotent; duplicate query terms collapse") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val idx = TextIndex.create(tmp("idem"), buckets = 8)
    val w1 = docs.filter(col("doc_id") % 2 === 0)
    idx.append(w1, 1L)
    idx.append(w1, 1L) // foreachBatch replay: overwrite, never double-count
    idx.append(docs.filter(col("doc_id") % 2 =!= 0), 2L)
    val exp = bruteForce(docs, Seq("dup", "merge"))
    val got = idx.searchAll(spark, Seq("dup", "merge", "DUP", "merge"))
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq == exp)
  }

  test("delete: tombstone view == post-compaction physical view; ranked excludes") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val idx = TextIndex.create(tmp("del"), buckets = 8)
    idx.append(docs.filter(col("doc_id") % 2 === 0), 1L)
    idx.append(docs.filter(col("doc_id") % 2 =!= 0), 2L)
    val survivors = docs.filter(col("doc_id") % 5 =!= 1)
    idx.delete(docs.filter(col("doc_id") % 5 === 1).select("doc_id"), 10L)

    val terms = Seq("dup", "merge")
    def got() = idx.searchAll(spark, terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val exp = bruteForce(survivors, terms)
    assert(exp.nonEmpty)
    assert(got() == exp, "tombstoned docs must vanish from search immediately")
    assert(idx.rankedSearch(spark, terms, 1000).collect()
      .forall(_.getLong(0) % 5 != 1), "ranked retrieval must exclude tombstones")

    assert(idx.compactBatches(spark, 100L) == 5)
    assert(got() == exp, "physical apply must preserve the answer")
    assert(idx.deletedDocs(spark).forall(_.isEmpty),
      "applied tombstones must be cleared")
    assert(idx.corpusStats._1 == survivors.count())
  }

  test("generational tombstones: delete masks only earlier batches (update = delete+add)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val idx = TextIndex.create(tmp("gen"), buckets = 8)
    idx.append(docs, 1L)
    val terms = Seq("dup", "merge")

    // "update" a doc subset: tombstone at 10, re-append REVISED text at 11
    val upd = docs.filter(col("doc_id") % 4 === 2)
    idx.delete(upd.select("doc_id"), 10L)
    idx.append(upd.withColumn("text", concat(col("text"), lit(" dup merge merge"))), 11L)

    val expected = bruteForce(
      docs.filter(col("doc_id") % 4 =!= 2).unionByName(
        upd.withColumn("text", concat(col("text"), lit(" dup merge merge")))), terms)
    def got() = idx.searchAll(spark, terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got() == expected,
      "re-added versions must be visible; pre-tombstone versions masked")

    // a LATER tombstone masks the re-added version too
    idx.delete(docs.filter(col("doc_id") % 8 === 2).select("doc_id"), 20L)
    val expected2 = bruteForce(
      docs.filter(col("doc_id") % 4 =!= 2)
        .unionByName(upd.withColumn("text", concat(col("text"), lit(" dup merge merge"))))
        .filter(col("doc_id") % 8 =!= 2), terms)
    assert(got() == expected2, "a newer tombstone must mask the re-added version")

    // compaction applies everything physically; the answer must not move
    assert(idx.compactBatches(spark, 100L) > 0)
    assert(got() == expected2)
    assert(idx.deletedDocs(spark).forall(_.isEmpty), "applied tombstones cleared")
  }

  test("compaction crash windows keep serving the full index; recompact recovers") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val idx = TextIndex.create(tmp("crash"), buckets = 8)
    idx.append(docs.filter(col("doc_id") % 2 === 0), 1L)
    idx.append(docs.filter(col("doc_id") % 2 =!= 0), 2L)
    val terms = Seq("dup", "spark")
    val exp = bruteForce(docs, terms)

    // crash after staging, before any move: live batches untouched
    intercept[RuntimeException] {
      idx.compactBatches(spark, 100L,
        crashPoint = p => if (p == "staged") throw new RuntimeException("boom"))
    }
    assert(idx.searchAll(spark, terms).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq == exp)

    // recompact with a higher id: sweeps the stranded stage dir, collapses
    // (2 postings + 2 doclens batch dirs)
    assert(idx.compactBatches(spark, 101L) == 4)
    assert(BatchStore.liveBatchDirs(idx.postingsDir).size == 1)
    assert(idx.searchAll(spark, terms).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq == exp)

    // post-compaction append stays live and visible
    idx.append(docs.limit(0), 3L) // empty batch: no partition dirs, harmless
    val idx2 = TextIndex.loadIndex(idx.dir)
    assert(idx2.buckets == 8)
    assert(idx2.searchAll(spark, terms).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq == exp)
  }
}
