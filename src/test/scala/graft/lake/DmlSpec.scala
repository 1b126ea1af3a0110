package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Predicate DML as epoch-fenced merges: DELETE/UPDATE WHERE at
  * O(matching rows), with LWW ordering against the CDC stream. */
class DmlSpec extends AnyFunSuite {

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

  private def fresh(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft-$tag").toString + "/t"
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "grp", "STRING"),
      IceLite.ColDef(3, "v", "BIGINT"))), Vector("id"), buckets = 8)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 100L).map(i => (i, s"g${i % 4}", i * 10, i, "UPSERT"))),
      "seq", "op", "e-0")
    dir
  }

  private def state(dir: String): Map[Long, (String, Long)] = {
    import spark.implicits._
    IceLite.read(spark, IceLite.load(dir))
      .select("id", "grp", "v").as[(Long, String, Long)].collect()
      .map { case (i, g, v) => i -> (g, v) }.toMap
  }

  test("deleteWhere tombstones matching rows at O(matches); fenced") {
    val dir = fresh("del")
    val st = Dml.deleteWhere(spark, dir, "grp = 'g0'", "dml-0")
    assert(st.applied && st.deletes == 25 && st.batchRows == 25)
    val after = state(dir)
    assert(after.size == 75 && !after.values.exists(_._1 == "g0"))
    assert(after(1L) == ("g1", 10L), "non-matching rows untouched")
    // replayed epoch fences
    assert(!Dml.deleteWhere(spark, dir, "grp = 'g1'", "dml-0").applied)
    assert(state(dir).size == 75)
    // empty match: a no-op epoch, not an error
    assert(Dml.deleteWhere(spark, dir, "grp = 'nope'", "dml-1").batchRows == 0)
  }

  test("updateWhere rewrites matching rows with SQL expressions, cast to the column type") {
    val dir = fresh("upd")
    val st = Dml.updateWhere(spark, dir, "id <= 10",
      Seq("v" -> "v * 2 + 1", "grp" -> "concat(grp, '-x')"), "dml-0")
    assert(st.applied && st.batchRows == 10 && st.deletes == 0)
    val after = state(dir)
    assert(after(3L) == ("g3-x", 61L) && after(10L) == ("g2-x", 201L))
    assert(after(11L) == ("g3", 110L), "non-matching rows untouched")
    assert(after.size == 100)
  }

  test("DML is an event in the stream: later CDC seq wins over it") {
    val dir = fresh("lww")
    Dml.deleteWhere(spark, dir, "id = 5", "dml-0")
    assert(!state(dir).contains(5L))
    // a CDC event with seq above the DML's point resurrects the key
    Merge.mergeEpoch(spark, dir,
      batch(Seq((5L, "gNew", 7L, 10000L, "UPSERT"))), "seq", "op", "e-1")
    assert(state(dir)(5L) == ("gNew", 7L))
    // and an update lands BELOW a newer event's seq → the newer event wins
    Dml.updateWhere(spark, dir, "id = 5", Seq("v" -> "0"), "dml-1")
    assert(state(dir)(5L) == ("gNew", 0L),
      "update at maxSeq+1 must win over the older event")
  }

  test("stale-base guard: a batch derived from a superseded snapshot refuses instead of rebasing") {
    val dir = fresh("dml-stale")
    val v0 = IceLite.load(dir).version
    // someone else commits: v0's maxSeq+1 is no longer unique — a DML
    // batch stamped from v0 would tie with this epoch's sequences
    Merge.mergeEpoch(spark, dir, batch(Seq((200L, "gx", 1L, 101L, "UPSERT"))),
      "seq", "op", "e-1")
    val err = intercept[java.util.ConcurrentModificationException] {
      Merge.mergeEpoch(spark, dir, batch(Seq((201L, "gy", 2L, 101L, "UPSERT"))),
        "seq", "op", "e-stale", requireBaseVersion = Some(v0))
    }
    assert(err.getMessage.contains("advanced past required base"))
    // the DML verbs ride the guard end-to-end: a normal single-writer DML
    // (no interleaving) commits fine
    assert(Dml.deleteWhere(spark, dir, "id = 200", "dml-1").applied)
    assert(state(dir).get(200L).isEmpty)
  }

  test("updateWhere refuses key columns and unknown columns") {
    val dir = fresh("guard")
    val ex = intercept[IllegalArgumentException](
      Dml.updateWhere(spark, dir, "id = 1", Seq("id" -> "id + 1"), "dml-0"))
    assert(ex.getMessage.contains("key column"))
    intercept[IllegalArgumentException](
      Dml.updateWhere(spark, dir, "id = 1", Seq("nope" -> "1"), "dml-1"))
    intercept[IllegalArgumentException](
      Dml.updateWhere(spark, dir, "id = 1", Seq.empty, "dml-2"))
  }

  test("mergeInto applies the three MERGE clauses as one fenced epoch") {
    import spark.implicits._
    val dir = fresh("minto")
    // ids 1-5 update (v = s.v + t.v mixes both aliases), 6-10 delete,
    // 101-105 insert; grp stays the target's for updates (not in the SET)
    val source = ((1L to 5L).map(i => (i, "gSrc", 1000L + i, false)) ++
      (6L to 10L).map(i => (i, "gSrc", 0L, true)) ++
      (101L to 105L).map(i => (i, s"gNew${i % 2}", i, false)))
      .toDF("id", "grp", "v", "del")
    val st = Dml.mergeInto(spark, dir, source,
      matchedDelete = Some("s.del"),
      matchedSet = Seq("v" -> "s.v + t.v"),
      insertNotMatched = true, epochId = "m-0")
    assert(st.updated == 5 && st.deleted == 5 && st.inserted == 5)
    val after = state(dir)
    assert(after.size == 100) // 100 - 5 deleted + 5 inserted
    (1L to 5L).foreach(i => assert(after(i) == (s"g${i % 4}", 1000L + i + i * 10),
      s"update mixes s.v + t.v and keeps target grp: $i -> ${after(i)}"))
    (6L to 10L).foreach(i => assert(!after.contains(i)))
    (101L to 105L).foreach(i => assert(after(i) == (s"gNew${i % 2}", i)))
    // same epochId fences as a no-op
    assert(!Dml.mergeInto(spark, dir, source, Some("s.del"),
      Seq("v" -> "s.v"), insertNotMatched = true, "m-0").merge.applied)
    // SET * (empty matchedSet): every source-carried data column replaces
    val st2 = Dml.mergeInto(spark, dir,
      Seq((1L, "gStar", 7L, false)).toDF("id", "grp", "v", "del"),
      matchedDelete = None, matchedSet = Seq.empty,
      insertNotMatched = false, epochId = "m-1")
    assert(st2.updated == 1 && st2.inserted == 0 && state(dir)(1L) == ("gStar", 7L))
    // duplicate source keys: the classic MERGE ambiguity — refuse
    intercept[IllegalArgumentException] {
      Dml.mergeInto(spark, dir,
        Seq((2L, "a", 1L, false), (2L, "b", 2L, false)).toDF("id", "grp", "v", "del"),
        None, Seq.empty, insertNotMatched = false, "m-2")
    }
    // key columns can never be SET
    intercept[IllegalArgumentException] {
      Dml.mergeInto(spark, dir, Seq((2L, "a", 1L, false)).toDF("id", "grp", "v", "del"),
        None, Seq("id" -> "s.id + 1"), insertNotMatched = false, "m-3")
    }
    // NULL source keys would silently anti-join into null-key inserts — refuse
    val exNull = intercept[IllegalArgumentException] {
      Dml.mergeInto(spark, dir,
        Seq((Some(2L), "a", 1L, false), (None, "b", 2L, false))
          .toDF("id", "grp", "v", "del"),
        None, Seq.empty, insertNotMatched = true, "m-4")
    }
    assert(exNull.getMessage.contains("NULL key"))
  }

  test("mergeInto NOT MATCHED BY SOURCE deletes absent keys inside the scope only") {
    import spark.implicits._
    val dir = fresh("msync") // 100 rows, grp g0..g3
    // mirror of scope g0 (ids ≡ 0 mod 4): source keeps only ids ≤ 48,
    // so in-scope ids 52..100 must be DELETED BY ABSENCE; other grps and
    // the fresh insert are untouched/added
    val source = ((4L to 48L by 4).map(i => (i, "g0", i * 100)) :+
      (101L, "g0", 42L)).toDF("id", "grp", "v")
    val st = Dml.mergeInto(spark, dir, source,
      matchedDelete = None, matchedSet = Seq("v" -> "s.v"),
      insertNotMatched = true, epochId = "sync-0",
      notMatchedBySourceDelete = Some("grp = 'g0'"))
    assert(st.updated == 12 && st.inserted == 1 && st.deleted == 0 &&
      st.deletedBySource == 13, s"got $st") // in-scope 25 - matched 12 = 13
    val after = state(dir)
    assert(after.size == 100 - 13 + 1)
    assert(after.count(_._2._1 == "g0") == 13, "scope mirrors the source")
    assert(after(8L) == ("g0", 800L) && after(101L) == ("g0", 42L))
    assert(!after.contains(52L), "absent in-scope key deleted")
    assert(after(53L) == ("g1", 530L), "out-of-scope rows untouched")
  }

  test("DML rides the change feed: tombstones and rewrites are visible changes") {
    val dir = fresh("feed")
    val v0 = IceLite.load(dir).version
    Dml.deleteWhere(spark, dir, "id = 7", "dml-0")
    Dml.updateWhere(spark, dir, "id = 8", Seq("v" -> "999"), "dml-1")
    val v1 = IceLite.load(dir).version
    val feed = IceLite.changes(spark, dir, v0, v1)
    val dels = feed.where(col("__del")).select("id").collect().map(_.getLong(0)).toSet
    val ups = feed.where(!col("__del")).select("id", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dels == Set(7L) && ups == Set((8L, 999L)))
  }
}
