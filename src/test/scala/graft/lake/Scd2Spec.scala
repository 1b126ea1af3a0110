package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Type-2 SCD maintenance: incremental applies ≡ a from-scratch interval
  * derivation over the full change history, with delete-close, re-insert,
  * fencing, and multi-epoch windows. */
class Scd2Spec extends AnyFunSuite {

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
    rows.toDF("id", "v", "seq", "op")
      .select(col("id").as("id", fid(1)), col("v").as("v", fid(2)),
        col("seq"), col("op"))
  }

  private def fresh(tag: String): (String, String) = {
    val root = Files.createTempDirectory(s"graft-$tag").toString
    val src = s"$root/src"
    IceLite.create(src, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "v", "STRING"))),
      Vector("id"), buckets = 8)
    (src, s"$root/scd")
  }

  /** (id, v, valid_from, valid_to(-1 = open), is_current) */
  private def state(scd: String): Set[(Long, String, Long, Long, Boolean)] = {
    import spark.implicits._
    Scd2.read(spark, scd)
      .select(col("id"), col("v"), col("valid_from"),
        coalesce(col("valid_to"), lit(-1L)).as("valid_to"), col("is_current"))
      .as[(Long, String, Long, Long, Boolean)].collect().toSet
  }

  /** The oracle: intervals derived from the raw event list in one pass. */
  private def expected(events: Seq[(Long, String, Long, String)])
      : Set[(Long, String, Long, Long, Boolean)] =
    events.groupBy(_._1).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(_._3)
      sorted.zip(sorted.drop(1).map(e => Some(e._3)) :+ None).collect {
        case ((id, v, seq, op), next) if op != "DELETE" =>
          (id, v, seq, next.getOrElse(-1L), next.isEmpty)
      }
    }.toSet

  test("insert → update → delete → re-insert: intervals, closes, fencing") {
    val (src, scd) = fresh("scd2")
    val e1 = (1L to 30L).map(i => (i, s"a$i", i, "UPSERT"))
    Merge.mergeEpoch(spark, src, batch(e1), "seq", "op", "e-1")
    Scd2.create(src, scd)
    val s1 = Scd2.apply(spark, src, scd)
    assert(s1.applied && s1.closed == 0 && s1.opened == 30)
    assert(state(scd) == expected(e1))

    // epoch 2: update 1, delete 2, leave the rest untouched
    val e2 = Seq((1L, "a1x", 100L, "UPSERT"), (2L, "", 101L, "DELETE"))
    Merge.mergeEpoch(spark, src, batch(e2), "seq", "op", "e-2")
    val s2 = Scd2.apply(spark, src, scd)
    assert(s2.applied && s2.changedKeys == 2 && s2.closed == 2 && s2.deleted == 1)
    assert(state(scd) == expected(e1 ++ e2))

    // epoch 3: re-insert the deleted key — a NEW interval, the old one stays
    val e3 = Seq((2L, "a2back", 200L, "UPSERT"))
    Merge.mergeEpoch(spark, src, batch(e3), "seq", "op", "e-3")
    val s3 = Scd2.apply(spark, src, scd)
    assert(s3.applied && s3.closed == 0 && s3.opened == 1)
    val st = state(scd)
    assert(st == expected(e1 ++ e2 ++ e3))
    assert(st.contains((2L, "a2", 2L, 101L, false)), "deleted interval sealed at the delete's seq")
    assert(st.contains((2L, "a2back", 200L, -1L, true)), "re-insert opens a fresh interval")

    // a replayed apply fences as a no-op and the store is unchanged
    assert(!Scd2.apply(spark, src, scd).applied)
    assert(state(scd) == expected(e1 ++ e2 ++ e3))
  }

  test("one apply over several skipped epochs chains intervals inside the window") {
    val (src, scd) = fresh("scd2-skip")
    val e1 = (1L to 10L).map(i => (i, s"v$i", i, "UPSERT"))
    Merge.mergeEpoch(spark, src, batch(e1), "seq", "op", "e-1")
    Scd2.create(src, scd)
    Scd2.apply(spark, src, scd)
    // three epochs, no apply between: key 1 changes twice then dies; the
    // intermediate version must close at the NEXT change, not the window end
    val e2 = Seq((1L, "v1b", 100L, "UPSERT"))
    val e3 = Seq((1L, "v1c", 200L, "UPSERT"), (2L, "", 201L, "DELETE"))
    val e4 = Seq((1L, "", 300L, "DELETE"))
    Merge.mergeEpoch(spark, src, batch(e2), "seq", "op", "e-2")
    Merge.mergeEpoch(spark, src, batch(e3), "seq", "op", "e-3")
    Merge.mergeEpoch(spark, src, batch(e4), "seq", "op", "e-4")
    val st = Scd2.apply(spark, src, scd)
    assert(st.applied && st.toVersion - st.fromVersion == 3)
    assert(st.deleted == 2 && st.opened == 0)
    assert(state(scd) == expected(e1 ++ e2 ++ e3 ++ e4))
  }

  test("asOf returns the interval containing the sequence, deletes excluded") {
    import spark.implicits._
    val (src, scd) = fresh("scd2-asof")
    Merge.mergeEpoch(spark, src, batch(Seq(
      (1L, "a", 1L, "UPSERT"), (2L, "b", 2L, "UPSERT"), (3L, "c", 3L, "UPSERT"))),
      "seq", "op", "e-1")
    Merge.mergeEpoch(spark, src, batch(Seq(
      (1L, "a2", 10L, "UPSERT"), (2L, "", 11L, "DELETE"))), "seq", "op", "e-2")
    Merge.mergeEpoch(spark, src, batch(Seq(
      (1L, "a3", 20L, "UPSERT"), (2L, "b2", 21L, "UPSERT"))), "seq", "op", "e-3")
    Scd2.create(src, scd)
    Scd2.apply(spark, src, scd)
    def at(s: Long): Set[(Long, String)] =
      Scd2.asOf(spark, scd, s).select(col("id"), col("v"))
        .as[(Long, String)].collect().toSet
    assert(at(5) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // boundary: an interval is live AT its valid_from (1 flips to a2 at 10)
    assert(at(10) == Set((1L, "a2"), (2L, "b"), (3L, "c")))
    // b's delete seals [2,11) → gone AT 11; b2 not born until 21
    assert(at(11) == Set((1L, "a2"), (3L, "c")))
    assert(at(99) == Set((1L, "a3"), (2L, "b2"), (3L, "c")))
  }

  test("history compaction folds batch dirs; crash windows still serve every interval") {
    val (src, scd) = fresh("scd2-compact")
    val e1 = (1L to 40L).map(i => (i, s"v$i", i, "UPSERT"))
    Merge.mergeEpoch(spark, src, batch(e1), "seq", "op", "e-1")
    Scd2.create(src, scd)
    Scd2.apply(spark, src, scd)
    val e2 = Seq((1L, "v1b", 100L, "UPSERT"), (2L, "", 101L, "DELETE"))
    val e3 = Seq((1L, "v1c", 200L, "UPSERT"), (3L, "v3b", 201L, "UPSERT"))
    Merge.mergeEpoch(spark, src, batch(e2), "seq", "op", "e-2")
    Scd2.apply(spark, src, scd)
    Merge.mergeEpoch(spark, src, batch(e3), "seq", "op", "e-3")
    Scd2.apply(spark, src, scd)
    val want = expected(e1 ++ e2 ++ e3)
    assert(state(scd) == want)

    // crash right after staging: live dirs untouched, state intact
    val boom = intercept[RuntimeException] {
      Scd2.compactHistory(spark, scd, cp => if (cp == "staged") throw new RuntimeException("boom"))
    }
    assert(boom.getMessage == "boom")
    assert(state(scd) == want, "a staged-only crash must not change what readers see")

    // crash BETWEEN move and delete: consolidated + superseded both on
    // disk — liveness rules must still serve each interval exactly once
    val boom2 = intercept[RuntimeException] {
      Scd2.compactHistory(spark, scd, cp => if (cp.startsWith("moved")) throw new RuntimeException("boom2"))
    }
    assert(boom2.getMessage == "boom2")
    assert(state(scd) == want, "consolidated dir supersedes exactly its listed ids")

    // the rerun sweeps strays and completes; a later apply stays live
    assert(Scd2.compactHistory(spark, scd) >= 0)
    assert(state(scd) == want)
    Merge.mergeEpoch(spark, src, batch(Seq((1L, "v1d", 300L, "UPSERT"))), "seq", "op", "e-4")
    Scd2.apply(spark, src, scd)
    assert(state(scd) == expected(e1 ++ e2 ++ e3 ++ Seq((1L, "v1d", 300L, "UPSERT"))))
  }

  test("stats are O(window), not O(dimension)") {
    val (src, scd) = fresh("scd2-odelta")
    Merge.mergeEpoch(spark, src,
      batch((1L to 200L).map(i => (i, s"v$i", i, "UPSERT"))), "seq", "op", "e-1")
    Scd2.create(src, scd)
    Scd2.apply(spark, src, scd)
    Merge.mergeEpoch(spark, src,
      batch(Seq((7L, "x", 1000L, "UPSERT"))), "seq", "op", "e-2")
    val st = Scd2.apply(spark, src, scd)
    assert(st.changedKeys == 1 && st.closed == 1 && st.opened == 1)
  }
}
