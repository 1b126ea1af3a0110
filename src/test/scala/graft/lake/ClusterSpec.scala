package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Clustering compaction + range-pruned reads: per-file sort bounds,
  * sound skipping under merge-on-read, and the stale-delta guard. */
class ClusterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", n).build()

  private def batch(rows: Seq[(Long, Long, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v", "seq", "op")
      .select(col("id").as("id", fid(1)), col("v").as("v", fid(2)),
        col("seq"), col("op"))
  }

  private def fresh(tag: String): String = {
    val dir = s"${Files.createTempDirectory(s"graft-$tag")}/table"
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "v", "BIGINT"))),
      Vector("id"), buckets = 4)
    dir
  }

  private def rangeRows(dir: String, lo: Long, hi: Long): Set[(Long, Long)] = {
    import spark.implicits._
    IceLite.readRange(spark, IceLite.load(dir), "v", lo, hi)
      .select("id", "v").as[(Long, Long)].collect().toSet
  }

  private def fullRows(dir: String, lo: Long, hi: Long): Set[(Long, Long)] = {
    import spark.implicits._
    IceLite.read(spark, IceLite.load(dir))
      .filter(col("v") >= lo && col("v") <= hi)
      .select("id", "v").as[(Long, Long)].collect().toSet
  }

  test("clusterBy splits buckets into bounded files; readRange skips most") {
    val dir = fresh("cluster")
    // 2000 keys, v uniform in [0, 2000)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 2000L).map(i => (i, (i * 7919) % 2000, i, "UPSERT"))),
      "seq", "op", "e-1")
    Compaction.compact(spark, dir, "cl-1", clusterBy = Some("v"), filesPerBucket = 4)
    val snap = IceLite.load(dir)
    val clustered = snap.files.filter(_.sortCol.contains("v"))
    assert(clustered.size >= 3 * 4, s"expected ~4 files/bucket, got ${clustered.size}")
    assert(clustered.forall(f => f.sortMin.isDefined && f.sortMax.isDefined))

    // a narrow range opens a small fraction of the files
    val cand = IceLite.rangeFiles(snap, "v", 100L, 200L)
    assert(cand.size * 2 <= snap.files.size,
      s"range scan must skip most files: ${cand.size}/${snap.files.size}")
    assert(rangeRows(dir, 100L, 200L) == fullRows(dir, 100L, 200L))
    // full-span range: everything survives, nothing lost
    assert(rangeRows(dir, 0L, 2000L) == fullRows(dir, 0L, 2000L))
  }

  test("later deltas stay unpruned; a key moving INTO the range is served") {
    val dir = fresh("cluster-delta")
    Merge.mergeEpoch(spark, dir,
      batch((1L to 400L).map(i => (i, i, i, "UPSERT"))), "seq", "op", "e-1")
    Compaction.compact(spark, dir, "cl-1", clusterBy = Some("v"), filesPerBucket = 4)
    // key 390 (v=390, out of [1,50]) moves INTO the range via a NEWER delta
    Merge.mergeEpoch(spark, dir,
      batch(Seq((390L, 10L, 1000L, "UPSERT"))), "seq", "op", "e-2")
    assert(rangeRows(dir, 1L, 50L) == fullRows(dir, 1L, 50L))
    assert(rangeRows(dir, 1L, 50L).contains((390L, 10L)))
  }

  test("stale-delta guard: a LATE low-seq delta disables base skipping") {
    val dir = fresh("cluster-late")
    Merge.mergeEpoch(spark, dir,
      batch((1L to 400L).map(i => (i, i + 1000, i + 1000, "UPSERT"))),
      "seq", "op", "e-1")
    Compaction.compact(spark, dir, "cl-1", clusterBy = Some("v"), filesPerBucket = 4)
    // a LATE event (seq 5, far below the base's seqs) claims key 300 had
    // v=7 — LWW must keep the base's v=1300, so a range read of [1,50]
    // must NOT serve (300, 7). Skipping 300's base file would do exactly
    // that; the guard keeps it.
    Merge.mergeEpoch(spark, dir,
      batch(Seq((300L, 7L, 5L, "UPSERT"))), "seq", "op", "e-late")
    val got = rangeRows(dir, 1L, 50L)
    assert(got == fullRows(dir, 1L, 50L))
    assert(!got.exists(_._1 == 300L), "stale late event must lose LWW")
    // re-clustering absorbs the late delta and re-enables skipping
    Compaction.compact(spark, dir, "cl-2", clusterBy = Some("v"), filesPerBucket = 4)
    val snap = IceLite.load(dir)
    val cand = IceLite.rangeFiles(snap, "v", 1001L, 1100L)
    assert(cand.size * 2 <= snap.files.size,
      s"skipping must resume after re-clustering: ${cand.size}/${snap.files.size}")
    assert(rangeRows(dir, 1001L, 1100L) == fullRows(dir, 1001L, 1100L))
  }

  test("bounds survive the snapshot JSON round-trip; deletes stay deleted") {
    import spark.implicits._
    val dir = fresh("cluster-json")
    Merge.mergeEpoch(spark, dir,
      batch((1L to 200L).map(i => (i, i, i, "UPSERT"))), "seq", "op", "e-1")
    Merge.mergeEpoch(spark, dir,
      batch(Seq((50L, 0L, 500L, "DELETE"))), "seq", "op", "e-2")
    Compaction.expire(dir, keepLast = 1)
    Compaction.compact(spark, dir, "cl-1", clusterBy = Some("v"), filesPerBucket = 2)
    val snap = IceLite.load(dir) // fresh load → JSON round-trip
    assert(snap.files.exists(f => f.sortCol.contains("v") && f.sortMin.isDefined))
    assert(!rangeRows(dir, 40L, 60L).exists(_._1 == 50L))
    assert(rangeRows(dir, 40L, 60L) == fullRows(dir, 40L, 60L))
  }
}
