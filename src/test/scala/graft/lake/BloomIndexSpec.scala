package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Secondary bloom index: per-bucket value blooms, sound bucket pruning
  * for equality predicates, kept fresh across merges / compaction / DDL. */
class BloomIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", n).build()

  private def batch(rows: Seq[(Long, String, Long, String)]): DataFrame = {
    import spark.implicits._
    val df = rows.toDF("id", "v", "seq", "op")
    df.select(col("id").as("id", fid(1)), col("v").as("v", fid(2)),
      col("seq"), col("op"))
  }

  private def fresh(tag: String): String = {
    val dir = s"${Files.createTempDirectory(s"graft-$tag")}/table"
    IceLite.create(dir,
      IceLite.withCdcCols(Vector(
        IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "v", "STRING"))),
      Vector("id"), buckets = 8)
    dir
  }

  test("create/backfill, prune, and stay fresh across later merges") {
    import spark.implicits._
    val dir = fresh("bloomidx")
    // 400 keys over 8 buckets; common values + ONE needle key
    val rows = (1L to 400L).map(i =>
      (i, if (i == 137L) "needle" else s"val${i % 20}", i, "UPSERT"))
    Merge.mergeEpoch(spark, dir, batch(rows), "seq", "op", "bi-0")
    IceLite.addBloomIndex(spark, dir, "idx-0", "v")
    val snap = IceLite.load(dir)
    assert(snap.indexedCols == Set("v"))
    assert(snap.valueIndex("v").nonEmpty)

    // the needle lives in exactly one bucket — pruning must find ≤ a few
    val needleBuckets = IceLite.bucketsForValue(snap, "v", "needle")
    assert(needleBuckets.size <= 2, s"needle should prune hard: $needleBuckets")
    // common value: most buckets survive (sound, not wrong)
    assert(IceLite.bucketsForValue(snap, "v", "val3").size >= 6)
    // absent value: almost always zero buckets
    assert(IceLite.bucketsForValue(snap, "v", "no-such-value").size <= 1)

    // readWhere ≡ unpruned filter
    val got = IceLite.readWhere(spark, snap, "v", "needle")
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(got == Set((137L, "needle")))
    val full = IceLite.read(spark, snap).filter(col("v") === "needle")
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(got == full)

    // a LATER merge introduces a new rare value — the OR upkeep must index it
    Merge.mergeEpoch(spark, dir,
      batch(Seq((555L, "fresh-needle", 1000L, "UPSERT"))), "seq", "op", "bi-1")
    val snap2 = IceLite.load(dir)
    val got2 = IceLite.readWhere(spark, snap2, "v", "fresh-needle")
      .select("id").as[Long].collect().toSeq
    assert(got2 == Seq(555L), "post-index merges must keep the index fresh")
    assert(IceLite.bucketsForValue(snap2, "v", "fresh-needle").size <= 2)

    // an UPDATE that moves a key off the needle value: the OR index still
    // says may-contain (sound staleness), but readWhere serves the truth
    Merge.mergeEpoch(spark, dir,
      batch(Seq((137L, "val0", 2000L, "UPSERT"))), "seq", "op", "bi-2")
    val snap3 = IceLite.load(dir)
    assert(IceLite.readWhere(spark, snap3, "v", "needle").count() == 0)
  }

  test("compaction sheds deleted values from the index") {
    import spark.implicits._
    val dir = fresh("bloomidx-compact")
    val rows = (1L to 200L).map(i =>
      (i, if (i == 42L) "doomed" else s"val${i % 10}", i, "UPSERT"))
    Merge.mergeEpoch(spark, dir, batch(rows), "seq", "op", "c-0")
    IceLite.addBloomIndex(spark, dir, "idx-0", "v")
    assert(IceLite.bucketsForValue(IceLite.load(dir), "v", "doomed").size == 1)
    // delete the doomed key, then compact (expire first so the tombstone
    // can purge and the replace-built bloom no longer sees the value)
    Merge.mergeEpoch(spark, dir,
      batch(Seq((42L, null, 500L, "DELETE"))), "seq", "op", "c-1")
    Compaction.expire(dir, keepLast = 1)
    Compaction.compact(spark, dir, "c-2")
    val snap = IceLite.load(dir)
    assert(IceLite.readWhere(spark, snap, "v", "doomed").count() == 0)
    assert(IceLite.bucketsForValue(snap, "v", "doomed").isEmpty,
      "compaction must shed deleted values from the replaced blooms")
    // the rest still serves
    assert(IceLite.readWhere(spark, snap, "v", "val3").count() ==
      IceLite.read(spark, snap).filter(col("v") === "val3").count())
  }

  test("rename re-keys the index; dropColumn removes it; JSON round-trips") {
    import spark.implicits._
    val dir = fresh("bloomidx-ddl")
    Merge.mergeEpoch(spark, dir,
      batch(Seq((1L, "only", 1L, "UPSERT"), (2L, "other", 2L, "UPSERT"))),
      "seq", "op", "d-0")
    IceLite.addBloomIndex(spark, dir, "idx-0", "v")
    IceLite.renameColumn(dir, "ddl-0", "v", "val")
    val snap = IceLite.load(dir) // fresh load → JSON round-trip exercised
    assert(snap.indexedCols == Set("val"))
    assert(IceLite.readWhere(spark, snap, "val", "only")
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(IceLite.bucketsForValue(snap, "val", "nope").size <= 1)
    IceLite.dropColumn(dir, "ddl-1", "val")
    val snap2 = IceLite.load(dir)
    assert(snap2.indexedCols.isEmpty && snap2.valueIndex.isEmpty)
  }
}
