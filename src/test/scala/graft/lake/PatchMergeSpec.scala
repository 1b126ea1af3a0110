package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** PARTIAL-UPDATE (PATCH) merge semantics (Merge.resolvePatches, q108):
  * a PATCH row carries the key + seq + a changed-field-number mask and sets
  * EXACTLY the masked columns; unmasked columns keep their previous value.
  * UPSERT stays whole-row, DELETE clears, and the materialized result rides
  * the ordinary whole-row LWW merge. */
class PatchMergeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", n).build()

  /** (id, a, b, seq, op, mask) — mask null for whole-row ops. */
  private def batch(rows: Seq[(Long, String, String, Long, String, Seq[Int])]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "a", "b", "seq", "op", Merge.PatchMaskCol)
      .select(col("id").as("id", fid(1)), col("a").as("a", fid(2)),
        col("b").as("b", fid(3)), col("seq"), col("op"), col(Merge.PatchMaskCol))
  }

  private def fresh(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft-$tag").toString + "/t"
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "a", "STRING"),
      IceLite.ColDef(3, "b", "STRING"))), Vector("id"), buckets = 4)
    dir
  }

  private def state(dir: String): Map[Long, (String, String)] = {
    import spark.implicits._
    IceLite.read(spark, IceLite.load(dir))
      .select("id", "a", "b").as[(Long, Option[String], Option[String])].collect()
      .map { case (i, a, b) => i -> (a.orNull, b.orNull) }.toMap
  }

  test("patch sets only masked columns; unmasked keep previous values") {
    val dir = fresh("p1")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a1", "b1", 1L, "UPSERT", null),
      (2L, "a2", "b2", 2L, "UPSERT", null))), "seq", "op", "e-0")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a1x", "IGNORED", 10L, "PATCH", Seq(2)),
      (2L, "IGNORED", "b2x", 11L, "PATCH", Seq(3)))), "seq", "op", "e-1")
    assert(state(dir) === Map(1L -> ("a1x", "b1"), 2L -> ("a2", "b2x")))
  }

  test("patch to an absent key creates the row with only masked columns") {
    val dir = fresh("p2")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (7L, "a7", "b-unsent", 1L, "PATCH", Seq(2)))), "seq", "op", "e-0")
    assert(state(dir) === Map(7L -> ("a7", null)))
  }

  test("delete-then-patch in one batch patches onto cleared state") {
    val dir = fresh("p3")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a1", "b1", 1L, "UPSERT", null))), "seq", "op", "e-0")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, null, null, 5L, "DELETE", null),
      (1L, null, "b-new", 6L, "PATCH", Seq(3)))), "seq", "op", "e-1")
    // a was cleared by the delete; only b is re-set by the patch
    assert(state(dir) === Map(1L -> (null, "b-new")))
  }

  test("patch-then-delete in one batch removes the key") {
    val dir = fresh("p4")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a1", "b1", 1L, "UPSERT", null),
      (1L, "a-patched", null, 2L, "PATCH", Seq(2)),
      (1L, null, null, 3L, "DELETE", null))), "seq", "op", "e-0")
    assert(state(dir) === Map.empty)
  }

  test("multiple patches to one key in one batch compose per column") {
    val dir = fresh("p5")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a0", "b0", 1L, "UPSERT", null))), "seq", "op", "e-0")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a1", null, 10L, "PATCH", Seq(2)),
      (1L, null, "b2", 11L, "PATCH", Seq(3)),
      (1L, "a3", null, 12L, "PATCH", Seq(2)))), "seq", "op", "e-1")
    assert(state(dir) === Map(1L -> ("a3", "b2")))
  }

  test("patches chain across epochs (pre-image chaining)") {
    val dir = fresh("p6")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a0", "b0", 1L, "UPSERT", null))), "seq", "op", "e-0")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a1", null, 10L, "PATCH", Seq(2)))), "seq", "op", "e-1")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, null, "b2", 20L, "PATCH", Seq(3)))), "seq", "op", "e-2")
    assert(state(dir) === Map(1L -> ("a1", "b2")))
  }

  test("patch after a tombstoned epoch lands on proto defaults, not the corpse") {
    val dir = fresh("p7")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a0", "b0", 1L, "UPSERT", null))), "seq", "op", "e-0")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, null, null, 5L, "DELETE", null))), "seq", "op", "e-1")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a2", null, 9L, "PATCH", Seq(2)))), "seq", "op", "e-2")
    assert(state(dir) === Map(1L -> ("a2", null)))
  }

  test("mask can set a column to the explicit empty string (mask ≠ presence)") {
    val dir = fresh("p8")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a0", "b0", 1L, "UPSERT", null))), "seq", "op", "e-0")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "", null, 5L, "PATCH", Seq(2)))), "seq", "op", "e-1")
    assert(state(dir) === Map(1L -> ("", "b0")))
  }

  test("stale patch (seq below the stored row) does not clobber") {
    val dir = fresh("p9")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a-new", "b-new", 100L, "UPSERT", null))), "seq", "op", "e-0")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a-stale", null, 5L, "PATCH", Seq(2)))), "seq", "op", "e-1")
    assert(state(dir) === Map(1L -> ("a-new", "b-new")))
  }

  test("patch epochs fence (exactly-once replay)") {
    val dir = fresh("p10")
    Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a0", "b0", 1L, "UPSERT", null))), "seq", "op", "e-0")
    val st1 = Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a1", null, 10L, "PATCH", Seq(2)))), "seq", "op", "e-1")
    val st2 = Merge.mergeEpoch(spark, dir, batch(Seq(
      (1L, "a1", null, 10L, "PATCH", Seq(2)))), "seq", "op", "e-1")
    assert(st1.applied && !st2.applied)
    assert(state(dir) === Map(1L -> ("a1", "b0")))
  }

  test("batches without the mask column bypass resolution untouched") {
    val dir = fresh("p11")
    import spark.implicits._
    val plain = Seq((1L, "a0", "b0", 1L, "UPSERT")).toDF("id", "a", "b", "seq", "op")
      .select(col("id").as("id", fid(1)), col("a").as("a", fid(2)),
        col("b").as("b", fid(3)), col("seq"), col("op"))
    val resolved = Merge.resolvePatches(spark, dir, plain, "seq", "op")
    assert(resolved eq plain) // identity, no job ran
  }

  test("patch-heavy batch mixes with whole-row ops across many keys") {
    val dir = fresh("p12")
    Merge.mergeEpoch(spark, dir, batch((1L to 40L).map(i =>
      (i, s"a$i", s"b$i", i, "UPSERT", null: Seq[Int]))), "seq", "op", "e-0")
    // every 2nd key patched on a, every 4th upserted whole-row, every 8th deleted
    Merge.mergeEpoch(spark, dir, batch((1L to 40L).flatMap { i =>
      if (i % 8 == 0) Some((i, null: String, null: String, 100 + i, "DELETE", null: Seq[Int]))
      else if (i % 4 == 0) Some((i, s"A$i", s"B$i", 100 + i, "UPSERT", null: Seq[Int]))
      else if (i % 2 == 0) Some((i, s"P$i", "IGN", 100 + i, "PATCH", Seq(2)))
      else None
    }), "seq", "op", "e-1")
    val st = state(dir)
    assert(st.size === 35)
    assert(st(2L) === ("P2", "b2"))   // patched: a set, b kept
    assert(st(4L) === ("A4", "B4"))   // whole-row upsert
    assert(!st.contains(8L))          // deleted
    assert(st(3L) === ("a3", "b3"))   // untouched
  }
}
