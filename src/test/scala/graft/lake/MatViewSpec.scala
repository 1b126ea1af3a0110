package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Incremental materialized view: retraction-maintained grouped aggregate
  * over a CDC table ≡ recomputation, at O(changed keys) refresh cost. */
class MatViewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", n).build()

  private def batch(rows: Seq[(Long, String, Long, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "grp", "v", "seq", "op")
      .select(col("id").as("id", fid(1)), col("grp").as("grp", fid(2)),
        col("v").as("v", fid(3)), col("seq"), col("op"))
  }

  private def fresh(tag: String): (String, String) = {
    val root = Files.createTempDirectory(s"graft-$tag").toString
    val src = s"$root/src"
    IceLite.create(src, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "grp", "STRING"),
      IceLite.ColDef(3, "v", "BIGINT"))), Vector("id"), buckets = 8)
    (src, s"$root/mv")
  }

  private def recompute(src: String): Set[(String, Long, Long)] = {
    import spark.implicits._
    IceLite.read(spark, IceLite.load(src)).groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
      .as[(String, Long, Long)].collect().toSet
  }

  private def mvState(mv: String): Set[(String, Long, Long)] = {
    import spark.implicits._
    MatView.read(spark, mv).select("grp", "cnt", "sum_v")
      .as[(String, Long, Long)].collect().toSet
  }

  test("refresh ≡ recompute across inserts, group moves, deletes; fenced; O(delta)") {
    val (src, mv) = fresh("mv")
    // epoch 1: 120 keys over 3 groups
    Merge.mergeEpoch(spark, src,
      batch((1L to 120L).map(i => (i, s"g${i % 3}", i * 10, i, "UPSERT"))),
      "seq", "op", "e-1")
    MatView.create(src, mv, MatView.Spec(Vector("grp"), Vector("sum_v" -> "v")))
    val r1 = MatView.refresh(spark, src, mv)
    assert(r1.applied && r1.fromVersion == 0)
    assert(mvState(mv) == recompute(src))

    // epoch 2: move a key g1→g2, change a value in place, delete one key,
    // insert a NEW group, and empty group g0 entirely
    val kill = (1L to 120L).filter(_ % 3 == 0) // all of g0
    val moves = Seq((1L, "g2", 10L, 1000L, "UPSERT"),   // was g1
      (2L, "g2", 999L, 1001L, "UPSERT"),                 // value change in place
      (4L, "", 0L, 1002L, "DELETE"),                     // delete from g1
      (500L, "gNew", 7L, 1003L, "UPSERT")) ++             // new group
      kill.zipWithIndex.map { case (k, i) => (k, "", 0L, 1100L + i, "DELETE") }
    Merge.mergeEpoch(spark, src, batch(moves), "seq", "op", "e-2")
    val r2 = MatView.refresh(spark, src, mv)
    assert(r2.applied)
    // O(delta): only the batch's keys were processed, not the table
    assert(r2.changedKeys == moves.map(_._1).distinct.size,
      s"refresh must touch only changed keys, got ${r2.changedKeys}")
    assert(mvState(mv) == recompute(src))
    assert(!mvState(mv).exists(_._1 == "g0"), "emptied group must be DELETEd")

    // replayed refresh fences as a no-op
    val r3 = MatView.refresh(spark, src, mv)
    assert(!r3.applied && r3.fromVersion == r3.toVersion)
  }

  test("one refresh over several skipped epochs ≡ per-epoch refreshes") {
    val (src, mv) = fresh("mv-skip")
    Merge.mergeEpoch(spark, src,
      batch((1L to 40L).map(i => (i, s"g${i % 4}", i, i, "UPSERT"))),
      "seq", "op", "e-1")
    MatView.create(src, mv, MatView.Spec(Vector("grp"), Vector("sum_v" -> "v")))
    MatView.refresh(spark, src, mv)
    // three more epochs, NO refresh in between (insert+delete within the
    // window must net out; repeated updates must collapse to the latest)
    Merge.mergeEpoch(spark, src,
      batch(Seq((41L, "gX", 5L, 100L, "UPSERT"))), "seq", "op", "e-2")
    Merge.mergeEpoch(spark, src,
      batch(Seq((41L, "", 0L, 200L, "DELETE"), (3L, "g0", 777L, 201L, "UPSERT"))),
      "seq", "op", "e-3")
    Merge.mergeEpoch(spark, src,
      batch(Seq((3L, "g1", 888L, 300L, "UPSERT"))), "seq", "op", "e-4")
    val r = MatView.refresh(spark, src, mv)
    assert(r.applied && r.toVersion - r.fromVersion == 3)
    assert(mvState(mv) == recompute(src))
  }

  test("expired pre-image snapshot → full-rebuild fallback, then incremental resumes") {
    val (src, mv) = fresh("mv-expire")
    Merge.mergeEpoch(spark, src,
      batch((1L to 60L).map(i => (i, s"g${i % 3}", i, i, "UPSERT"))),
      "seq", "op", "e-1")
    MatView.create(src, mv, MatView.Spec(Vector("grp"), Vector("sum_v" -> "v")))
    MatView.refresh(spark, src, mv)
    Merge.mergeEpoch(spark, src,
      batch(Seq((5L, "gZ", 100L, 500L, "UPSERT"), (6L, "", 0L, 501L, "DELETE"))),
      "seq", "op", "e-2")
    // expire EVERYTHING but the head — the v2 pre-image the next refresh
    // would retract against is gone
    Compaction.expire(src, keepLast = 1)
    val r = MatView.refresh(spark, src, mv)
    assert(r.applied, "retention loss must fall back to a rebuild, not fail")
    assert(mvState(mv) == recompute(src))
    // incremental refreshes resume after the rebuild
    Merge.mergeEpoch(spark, src,
      batch(Seq((7L, "gZ", 9L, 600L, "UPSERT"))), "seq", "op", "e-3")
    val r2 = MatView.refresh(spark, src, mv)
    assert(r2.applied && r2.changedKeys == 1)
    assert(mvState(mv) == recompute(src))
  }

  test("dropping a grouped column fails the refresh loudly") {
    val (src, mv) = fresh("mv-ddl")
    Merge.mergeEpoch(spark, src,
      batch((1L to 20L).map(i => (i, s"g${i % 2}", i, i, "UPSERT"))),
      "seq", "op", "e-1")
    MatView.create(src, mv, MatView.Spec(Vector("grp"), Vector("sum_v" -> "v")))
    MatView.refresh(spark, src, mv)
    IceLite.dropColumn(src, "ddl-0", "grp")
    val e = intercept[IllegalArgumentException] {
      MatView.refresh(spark, src, mv)
    }
    assert(e.getMessage.contains("grp"))
  }

  test("a schema-only source commit (no data) advances the watermark cleanly") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-mv-ddl2").toString
    val src = s"$root/src"; val mv = s"$root/mv"
    IceLite.create(src, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "grp", "STRING"),
      IceLite.ColDef(3, "v", "BIGINT"), IceLite.ColDef(4, "note", "STRING"))),
      Vector("id"), buckets = 4)
    val b = Seq((1L, "ga", 3L, "x", 1L, "UPSERT"), (2L, "gb", 4L, "y", 2L, "UPSERT"))
      .toDF("id", "grp", "v", "note", "seq", "op")
      .select(col("id").as("id", fid(1)), col("grp").as("grp", fid(2)),
        col("v").as("v", fid(3)), col("note").as("note", fid(4)),
        col("seq"), col("op"))
    Merge.mergeEpoch(spark, src, b, "seq", "op", "e-1")
    MatView.create(src, mv, MatView.Spec(Vector("grp"), Vector("sum_v" -> "v")))
    MatView.refresh(spark, src, mv)
    // rename an UNINVOLVED column: a new src version with zero change rows
    IceLite.renameColumn(src, "ddl-1", "note", "note2")
    val r = MatView.refresh(spark, src, mv)
    assert(r.applied && r.changedKeys == 0,
      s"empty window must still advance the watermark: $r")
    assert(mvState(mv) == recompute(src))
    assert(!MatView.refresh(spark, src, mv).applied)
  }

  test("NULL group values aggregate like SQL GROUP BY") {
    val (src, mv) = fresh("mv-null")
    Merge.mergeEpoch(spark, src,
      batch(Seq((1L, null, 3L, 1L, "UPSERT"), (2L, null, 4L, 2L, "UPSERT"),
        (3L, "ga", 5L, 3L, "UPSERT"))), "seq", "op", "e-1")
    MatView.create(src, mv, MatView.Spec(Vector("grp"), Vector("sum_v" -> "v")))
    MatView.refresh(spark, src, mv)
    assert(mvState(mv) == recompute(src))
    // retraction against the NULL group (null-safe join path)
    Merge.mergeEpoch(spark, src,
      batch(Seq((1L, "", 0L, 10L, "DELETE"))), "seq", "op", "e-2")
    MatView.refresh(spark, src, mv)
    assert(mvState(mv) == recompute(src))
    assert(mvState(mv).exists(t => t._1 == null && t._2 == 1L && t._3 == 4L))
  }

  test("a LATE LWW-losing duplicate does not skew the view (and a late loser below a tombstone stays dead)") {
    val (src, mv) = fresh("mv-late")
    Merge.mergeEpoch(spark, src,
      batch(Seq((1L, "ga", 100L, 10L, "UPSERT"), (2L, "gb", 50L, 11L, "UPSERT"),
        (3L, "gb", 7L, 12L, "UPSERT"))),
      "seq", "op", "e-1")
    MatView.create(src, mv, MatView.Spec(Vector("grp"), Vector("sum_v" -> "v")))
    assert(MatView.refresh(spark, src, mv).applied)
    assert(mvState(mv) == recompute(src))
    // delete key 3 (tombstone at seq 13)
    Merge.mergeEpoch(spark, src, batch(Seq((3L, "gb", 0L, 13L, "DELETE"))),
      "seq", "op", "e-2")
    assert(MatView.refresh(spark, src, mv).applied)
    assert(mvState(mv) == recompute(src))
    // LATE epoch: a lower-seq duplicate of key 1 (amount 70 at seq 5 —
    // loses to the stored seq-10 row) and a lower-seq upsert of the
    // deleted key 3 (seq 6 < tombstone's 13). The table absorbs both with
    // NO state change; the view must not move either.
    Merge.mergeEpoch(spark, src,
      batch(Seq((1L, "ga", 70L, 5L, "UPSERT"), (3L, "gb", 999L, 6L, "UPSERT"))),
      "seq", "op", "e-late")
    val r = MatView.refresh(spark, src, mv)
    assert(r.applied, s"late window still advances the watermark: $r")
    assert(mvState(mv) == recompute(src),
      "an absorbed late loser must not retract the real state")
    assert(mvState(mv).exists(t => t._1 == "ga" && t._3 == 100L),
      "ga must still sum the seq-10 row, not the late seq-5 duplicate")
  }
}
