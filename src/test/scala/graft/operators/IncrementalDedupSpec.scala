package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Incremental dedup ≡ batch dedup: the persisted-signature pipeline shape
  * (signatures computed once at ingest, each new batch band-joined against
  * the accumulated table) must emit EXACTLY the full batch pairing
  * restricted to pairs touching the new docs — new-old and new-new alike,
  * with the same mega-bucket cap and Jaccard verification. */
class IncrementalDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("inc-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("incrementalVerifiedPairs == full lshVerifiedPairs restricted to the new batch") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // "ingest" split: docs < 400 are the existing corpus, >= 400 the batch
    val cut = 400L

    // the persisted signature table: written at ingest, READ BACK here so
    // the incremental path provably needs only the stored shape
    val dir = Files.createTempDirectory("graft-sigtable").toString
    DedupOps.signatures(spark, docs).write.mode("overwrite").parquet(dir)
    val sigTable = spark.read.parquet(dir)

    val newIds = docs.select("doc_id").filter(col("doc_id") >= cut)
    val inc = DedupOps.incrementalVerifiedPairs(spark, sigTable, newIds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val full = DedupOps.lshVerifiedPairs(spark, sfDir)
      .filter(col("a") >= cut || col("b") >= cut)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(inc.nonEmpty, "the sf0.001 corpus should contain near-dups touching the batch")
    assert(inc == full, s"incremental=${inc.size} batch-restricted=${full.size}")
    // and no pair between two OLD docs leaks in
    assert(inc.forall { case (a, b, _) => a >= cut || b >= cut })
  }

  test("SigStore pruning: a small batch reads only its touched band partitions, pairs unchanged") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cut = 494L // tiny batch: 6 docs × 4 bands = ≤24 band keys ≪ 64 partitions

    val store = DedupOps.SigStore(Files.createTempDirectory("graft-sigstore").toString)
    val oldSigs = DedupOps.signatures(spark, docs.filter(col("doc_id") < cut))
    val newSigs = DedupOps.signatures(spark, docs.filter(col("doc_id") >= cut))
      .localCheckpoint()
    store.append(oldSigs, batchId = 0L)
    store.append(newSigs, batchId = 1L)

    val got = DedupOps.incrementalVerifiedPairsStored(spark, store, newSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = DedupOps.lshVerifiedPairs(spark, sfDir)
      .filter(col("a") >= cut || col("b") >= cut)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"stored-pruned=${got.size} batch-restricted=${want.size}")

    // FILES-READ AUDIT: the batch's touched band keys select a strict
    // subset of the store's band partitions — the promised O(batch +
    // touched buckets) read, not O(corpus)
    val touchedPaths = {
      val nTouched = store.allBandPaths.size // every partition dir on disk
      val batchKeys = DedupOps.incrementalTouchedKeys(spark, newSigs)
      val pruned = store.prunedBandPaths(batchKeys)
      assert(batchKeys.size < DedupOps.bandPartitions / 2,
        s"batch touches ${batchKeys.size} keys — too many to demonstrate pruning")
      assert(pruned.nonEmpty && pruned.size < nTouched,
        s"pruned ${pruned.size} of $nTouched band dirs — no pruning happened")
      pruned
    }
    // every selected directory is one of the touched keys
    assert(touchedPaths.forall(p => p.contains("/bkey=")))

    // VERIFY-SIDE AUDIT: the Jaccard join's rows read is also pruned — to
    // the doc-key partitions holding the candidate pairs' ids
    val pairIds = got.flatMap { case (a, b, _) => Seq(a, b) }.toSet
    if (pairIds.nonEmpty) {
      val dkeys = pairIds.map(id =>
        graft.functions.XxHash64Host.bucketOf(Seq(id), DedupOps.docPartitions))
      val prunedRows = store.prunedDocPaths(dkeys)
      val allRows = store.allDocPaths
      assert(prunedRows.nonEmpty && prunedRows.size < allRows.size,
        s"rows side unpruned: ${prunedRows.size} of ${allRows.size} doc dirs")
    }
  }

  test("SigStore.compactBatches collapses batch dirs; pairs unchanged") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cut = 400L
    val store = DedupOps.SigStore(Files.createTempDirectory("graft-sigcompact").toString)
    store.append(DedupOps.signatures(spark, docs.filter(col("doc_id") < cut)), 0L)
    val newSigs = DedupOps.signatures(spark, docs.filter(col("doc_id") >= cut))
      .localCheckpoint()
    store.append(newSigs, 1L)
    val before = DedupOps.incrementalVerifiedPairsStored(spark, store, newSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(before.nonEmpty)

    val collapsed = store.compactBatches(spark, intoBatchId = 1000L)
    assert(collapsed == 4, s"expected 2 rows + 2 bands batch dirs collapsed, got $collapsed")
    // exactly one batch dir per side now
    def batchCount(p: String): Long =
      java.nio.file.Files.list(java.nio.file.Paths.get(p)).filter(
        f => f.getFileName.toString.startsWith("batch=")).count()
    assert(batchCount(store.rowsDir) == 1 && batchCount(store.bandsDir) == 1)
    // the SAME batch's pairing over the compacted store is identical
    val after = DedupOps.incrementalVerifiedPairsStored(spark, store, newSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after == before, s"compaction changed pairs: ${after.size} vs ${before.size}")
    // and each doc's signature survives exactly once
    val dupes = store.rows(spark).groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(dupes == 0)
  }

  test("compactBatches killed in ANY swap window: store still serves the full pair set; re-run recovers") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cut = 400L
    case object Boom extends RuntimeException("injected crash")

    Seq("staged", "moved-rows", "moved-bands").zipWithIndex.foreach { case (window, i) =>
      val store = DedupOps.SigStore(Files.createTempDirectory(s"graft-sigcrash$i").toString)
      store.append(DedupOps.signatures(spark, docs.filter(col("doc_id") < cut)), 0L)
      val newSigs = DedupOps.signatures(spark, docs.filter(col("doc_id") >= cut))
        .localCheckpoint()
      store.append(newSigs, 1L)
      val before = DedupOps.incrementalVerifiedPairsStored(spark, store, newSigs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(before.nonEmpty)

      // kill the compaction inside this window
      intercept[Boom.type] {
        store.compactBatches(spark, intoBatchId = 1000L,
          crashPoint = w => if (w == window) throw Boom)
      }
      // the crashed store must still serve the EXACT full pair set
      val crashed = DedupOps.incrementalVerifiedPairsStored(spark, store, newSigs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(crashed == before, s"[$window] crash lost/duplicated pairs: ${crashed.size} vs ${before.size}")
      // ... with no doc signatured twice (the rows side stayed consistent)
      assert(store.rows(spark).groupBy("doc_id").count()
        .filter(col("count") > 1).count() == 0, s"[$window] duplicate signatures after crash")

      // a re-run (higher id — the operator's normal next invocation)
      // completes the compaction and sweeps every stranded dir
      store.compactBatches(spark, intoBatchId = 2000L)
      import scala.jdk.CollectionConverters._
      def batchDirs(p: String): Seq[String] =
        java.nio.file.Files.list(java.nio.file.Paths.get(p)).iterator().asScala
          .map(_.getFileName.toString).filter(_.startsWith("batch=")).toSeq
      // exactly one batch dir per side: batch=1000 when the crashed run had
      // already completed both moves (re-run just sweeps), batch=2000 when
      // the re-run had to re-consolidate
      assert(batchDirs(store.rowsDir).size == 1, s"[$window] rows dirs: ${batchDirs(store.rowsDir)}")
      assert(batchDirs(store.bandsDir).size == 1, s"[$window] bands dirs: ${batchDirs(store.bandsDir)}")
      val after = DedupOps.incrementalVerifiedPairsStored(spark, store, newSigs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(after == before, s"[$window] recovery changed pairs: ${after.size} vs ${before.size}")
      assert(store.rows(spark).groupBy("doc_id").count()
        .filter(col("count") > 1).count() == 0, s"[$window] duplicate signatures after recovery")
    }
  }

  test("a batch appended AFTER compaction (resumed stream, small id) stays live through sweep and re-compaction") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cut = 400L
    val store = DedupOps.SigStore(Files.createTempDirectory("graft-sigresume").toString)
    store.append(DedupOps.signatures(spark, docs.filter(col("doc_id") < cut)), 0L)
    store.append(DedupOps.signatures(spark,
      docs.filter(col("doc_id") >= cut && col("doc_id") < 450L)), 1L)
    store.compactBatches(spark, intoBatchId = 1000L)

    // the stream resumes from its checkpoint: next microbatch id is SMALL
    val lateSigs = DedupOps.signatures(spark, docs.filter(col("doc_id") >= 450L))
      .localCheckpoint()
    store.append(lateSigs, 2L)

    import scala.jdk.CollectionConverters._
    def liveIds(p: String): Set[Long] =
      BatchStore.liveBatchDirs(p).map(BatchStore.batchIdOf).toSet
    // batch=2 < 1000 but was NOT superseded by the compaction — must be live
    assert(liveIds(store.rowsDir) == Set(2L, 1000L), s"rows live: ${liveIds(store.rowsDir)}")
    assert(liveIds(store.bandsDir) == Set(2L, 1000L))
    // ... and a recovery sweep must NOT delete it
    BatchStore.sweepSuperseded(store.dir, Seq(store.rowsDir, store.bandsDir))
    assert(liveIds(store.rowsDir) == Set(2L, 1000L), "sweep deleted a post-compaction batch")

    // the late batch's pairing sees the whole corpus (old + compacted + new)
    val got = DedupOps.incrementalVerifiedPairsStored(spark, store, lateSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = DedupOps.lshVerifiedPairs(spark, sfDir)
      .filter(col("a") >= 450L || col("b") >= 450L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"post-compaction batch mispaired: ${got.size} vs ${want.size}")

    // a second compaction folds BOTH live dirs and serves identical pairs
    store.compactBatches(spark, intoBatchId = 2000L)
    assert(liveIds(store.rowsDir) == Set(2000L))
    val after = DedupOps.incrementalVerifiedPairsStored(spark, store, lateSigs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after == got)
    assert(store.rows(spark).groupBy("doc_id").count()
      .filter(col("count") > 1).count() == 0, "duplicate signatures after re-compaction")
  }

  test("an empty batch yields no pairs (and no corpus re-pairing)") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sigTable = DedupOps.signatures(spark, docs)
    import spark.implicits._
    val none = DedupOps.incrementalVerifiedPairs(spark, sigTable,
      Seq.empty[Long].toDF("doc_id"))
    assert(none.count() == 0)
  }
}
