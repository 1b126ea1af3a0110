package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** min/max view maintenance: the threatened-extremum recompute is correct
  * and partial; the cheap path handles inserts; deletes that kill a
  * group's achiever produce the next extremum, not a stale one. */
class MatViewMinMaxSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", n).build()

  /** rows: (id, grp, v, seq, op) */
  private def batch(rows: Seq[(Long, String, Long, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "grp", "v", "seq", "op")
      .select(col("id").as("id", fid(1)), col("grp").as("grp", fid(2)),
        col("v").as("v", fid(3)), col("seq"), col("op"))
  }

  private def mkSrc(dir: String): Unit =
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "grp", "STRING"),
      IceLite.ColDef(3, "v", "BIGINT"))), Vector("id"), buckets = 4)

  private def viewState(mvDir: String): Map[String, (Long, Long, Long, Long)] =
    MatView.read(spark, mvDir).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("delete of the achiever recomputes only that group; inserts stay cheap") {
    val root = Files.createTempDirectory("graft-mvx").toString
    val src = s"$root/src"; val mv = s"$root/mv"
    mkSrc(src)
    // epoch 0: two groups; a holds min=1 at id=1, max=9 at id=3
    Merge.mergeEpoch(spark, src, batch(Seq(
      (1L, "a", 1L, 1L, "UPSERT"), (2L, "a", 5L, 2L, "UPSERT"),
      (3L, "a", 9L, 3L, "UPSERT"),
      (10L, "b", 100L, 4L, "UPSERT"), (11L, "b", 200L, 5L, "UPSERT"))),
      "seq", "op", "e-0")
    MatView.create(src, mv, MatView.Spec(Vector("grp"),
      Vector("sv" -> "v"), mins = Vector("mn" -> "v"), maxs = Vector("mx" -> "v")))
    val r0 = MatView.refresh(spark, src, mv)
    assert(r0.applied && r0.recomputedGroups == 0, s"backfill has no removals: $r0")
    assert(viewState(mv) == Map(
      "a" -> (3L, 15L, 1L, 9L), "b" -> (2L, 300L, 100L, 200L)))

    // epoch 1: delete a's min achiever; insert into b (cheap path)
    Merge.mergeEpoch(spark, src, batch(Seq(
      (1L, "a", 0L, 10L, "DELETE"), (12L, "b", 50L, 11L, "UPSERT"))),
      "seq", "op", "e-1")
    val r1 = MatView.refresh(spark, src, mv)
    assert(r1.applied && r1.recomputedGroups == 1,
      s"only group a is threatened: $r1")
    assert(viewState(mv) == Map(
      "a" -> (2L, 14L, 5L, 9L), "b" -> (3L, 350L, 50L, 200L)))

    // epoch 2: update moves a's max DOWN (removal of achiever via update);
    // also an update that changes v without touching extrema (5 -> 6)
    Merge.mergeEpoch(spark, src, batch(Seq(
      (3L, "a", 7L, 20L, "UPSERT"), (2L, "a", 6L, 21L, "UPSERT"))),
      "seq", "op", "e-2")
    val r2 = MatView.refresh(spark, src, mv)
    assert(r2.applied && r2.recomputedGroups == 1, s"$r2")
    assert(viewState(mv) == Map(
      "a" -> (2L, 13L, 6L, 7L), "b" -> (3L, 350L, 50L, 200L)))

    // epoch 3: group switch — b's min achiever moves to group a
    Merge.mergeEpoch(spark, src, batch(Seq(
      (12L, "a", 50L, 30L, "UPSERT"))), "seq", "op", "e-3")
    val r3 = MatView.refresh(spark, src, mv)
    assert(r3.applied)
    assert(viewState(mv) == Map(
      "a" -> (3L, 63L, 6L, 50L), "b" -> (2L, 300L, 100L, 200L)))

    // whole-group disappearance
    Merge.mergeEpoch(spark, src, batch(Seq(
      (10L, "b", 0L, 40L, "DELETE"), (11L, "b", 0L, 41L, "DELETE"))),
      "seq", "op", "e-4")
    val r4 = MatView.refresh(spark, src, mv)
    assert(r4.applied)
    assert(viewState(mv) == Map("a" -> (3L, 63L, 6L, 50L)))

    // fencing
    assert(!MatView.refresh(spark, src, mv).applied)
  }

  test("randomized ops: view == full recompute after every refresh wave") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-mvx").toString
    val src = s"$root/src"; val mv = s"$root/mv"
    mkSrc(src)
    val groups = Vector("g0", "g1", "g2")
    var live = Map.empty[Long, (String, Long)]
    var seq = 0L
    var created = false
    (0 until 4).foreach { wave =>
      val ops = (0 until 60).map { i =>
        val r = graft.cdc.LogGen.mix(wave * 1000L + i)
        val id = math.floorMod(r, 25).toLong
        val g = groups(math.floorMod(r >> 8, groups.length.toLong).toInt)
        val v = math.floorMod(r >> 16, 50).toLong
        seq += 1
        if (math.floorMod(r >> 24, 5) == 0 && live.contains(id)) {
          live -= id; (id, g, v, seq, "DELETE")
        } else { live += id -> (g, v); (id, g, v, seq, "UPSERT") }
      }
      Merge.mergeEpoch(spark, src, batch(ops), "seq", "op", s"e-$wave")
      if (!created) {
        MatView.create(src, mv, MatView.Spec(Vector("grp"),
          Vector("sv" -> "v"), mins = Vector("mn" -> "v"), maxs = Vector("mx" -> "v")))
        created = true
      }
      val r = MatView.refresh(spark, src, mv)
      assert(r.applied)
      val want = live.toSeq.groupBy(_._2._1).map { case (g, rows) =>
        val vs = rows.map(_._2._2)
        g -> (vs.length.toLong, vs.sum, vs.min, vs.max)
      }
      assert(viewState(mv) == want, s"wave $wave diverged")
    }
  }
}
