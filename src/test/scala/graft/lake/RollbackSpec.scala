package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Snapshot rollback: restore an earlier state as a new head version,
  * with the epoch ledger restored so undone epochs can re-apply. */
class RollbackSpec extends AnyFunSuite {

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
    val dir = Files.createTempDirectory(s"graft-$tag").toString + "/t"
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "v", "BIGINT"))),
      Vector("id"), buckets = 4)
    dir
  }

  private def state(dir: String): Map[Long, Long] = {
    import spark.implicits._
    IceLite.read(spark, IceLite.load(dir))
      .select("id", "v").as[(Long, Long)].collect().toMap
  }

  test("rollback restores state as a new version; history and time travel survive") {
    val dir = fresh("rb")
    Merge.mergeEpoch(spark, dir, batch((1L to 50L).map(i => (i, i, i, "UPSERT"))),
      "seq", "op", "e-0") // v1
    Merge.mergeEpoch(spark, dir, batch(Seq((1L, 999L, 100L, "UPSERT"),
      (60L, 1L, 101L, "UPSERT"))), "seq", "op", "e-1") // v2 (the bad commit)
    val good = IceLite.loadVersion(dir, 1)
    val snap = IceLite.rollback(dir, 1)
    assert(snap.version == 3)
    assert(state(dir) == (1L to 50L).map(i => i -> i).toMap,
      "head must equal the v1 state")
    // the bad version is still time-travelable (audit trail)
    import spark.implicits._
    assert(IceLite.read(spark, IceLite.loadVersion(dir, 2))
      .where(col("id") === 1L).select("v").as[Long].head() == 999L)
    assert(snap.maxSeq == good.maxSeq, "maxSeq restores with the state")
  }

  test("undone epochs re-apply after rollback (ledger restored)") {
    val dir = fresh("rbre")
    Merge.mergeEpoch(spark, dir, batch(Seq((1L, 10L, 1L, "UPSERT"))), "seq", "op", "e-0")
    val b1 = batch(Seq((2L, 20L, 2L, "UPSERT")))
    Merge.mergeEpoch(spark, dir, b1, "seq", "op", "e-1")
    assert(!Merge.mergeEpoch(spark, dir, b1, "seq", "op", "e-1").applied,
      "pre-rollback replay fences")
    IceLite.rollback(dir, 1)
    assert(state(dir) == Map(1L -> 10L))
    // the rollback un-happened e-1 — its replay must now APPLY
    assert(Merge.mergeEpoch(spark, dir, b1, "seq", "op", "e-1").applied,
      "rollback must restore the ledger so undone epochs re-apply")
    assert(state(dir) == Map(1L -> 10L, 2L -> 20L))
  }

  test("rollback refuses a rolled-forward or expired target") {
    val dir = fresh("rbg")
    Merge.mergeEpoch(spark, dir, batch(Seq((1L, 1L, 1L, "UPSERT"))), "seq", "op", "e-0")
    intercept[IllegalArgumentException](IceLite.rollback(dir, 99))
    Merge.mergeEpoch(spark, dir, batch(Seq((2L, 2L, 2L, "UPSERT"))), "seq", "op", "e-1")
    Compaction.expire(dir, keepLast = 1) // only the head survives
    intercept[IllegalArgumentException](IceLite.rollback(dir, 1))
  }
}
