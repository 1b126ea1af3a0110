package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Legal-hold invariants: purge (table AND export flavors) fails closed on
  * a held key; guardedPurge erases exactly the unheld subset; holds
  * round-trip through their markers (escaping included); release is the
  * only way an erasure proceeds. */
class LegalHoldSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkTable(): (String, (String, String), (String, String)) = {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-hold").toString
    graft.cdc.LogGen.writeLog(spark, graft.cdc.LogGen.Params(
      nEvents = 1500, nRepos = 10, pathsPerRepo = 8, v1Fraction = 0.6),
      s"$root/log", epochs = 2)
    graft.cdc.Replay.replayLog(spark, s"$root/log", s"$root/t", buckets = 4)
    val keys = IceLite.read(spark, IceLite.load(s"$root/t"))
      .groupBy("repo", "path").count()
      .orderBy(col("count").desc, col("repo"), col("path"))
      .select("repo", "path").as[(String, String)].take(2)
    (s"$root/t", keys(0), keys(1))
  }

  test("purge fails closed on a held key; guardedPurge splits; release unblocks") {
    val (dir, a, b) = mkTable()
    val keyA = Map[String, Any]("repo" -> a._1, "path" -> a._2)
    val keyB = Map[String, Any]("repo" -> b._1, "path" -> b._2)
    LegalHold.place(dir, "h1", keyA, """reason with "quotes" and \slashes""")
    // marker round-trips, escaping intact
    val holds = LegalHold.active(dir)
    assert(holds.map(_.id) == Seq("h1"))
    assert(holds.head.reason == """reason with "quotes" and \slashes""")
    assert(holds.head.key == Map("repo" -> a._1, "path" -> a._2))
    // direct purge refuses, nothing changes
    intercept[IllegalArgumentException] { Purge.purgeKey(spark, dir, keyA) }
    assert(IceLite.lookupLocal(IceLite.load(dir), keyA).nonEmpty)
    // batch ticket: B erased, A refused
    val (st, refused) = LegalHold.guardedPurge(spark, dir, Seq(keyA, keyB))
    assert(refused == Seq(keyA) && st.rowsPurged > 0)
    assert(IceLite.lookupLocal(IceLite.load(dir), keyA).nonEmpty)
    assert(IceLite.lookupLocal(IceLite.load(dir), keyB).isEmpty)
    // all-held ticket: zero stats, no job
    val (st2, refused2) = LegalHold.guardedPurge(spark, dir, Seq(keyA))
    assert(st2.rowsPurged == 0 && refused2 == Seq(keyA))
    // release → erasure proceeds
    assert(LegalHold.release(dir, "h1"))
    assert(!LegalHold.release(dir, "h1"))
    assert(Purge.purgeKey(spark, dir, keyA).rowsPurged > 0)
    assert(IceLite.lookupLocal(IceLite.load(dir), keyA).isEmpty)
  }

  test("hold and ticket key types coerce alike: a differently-typed numeric key is refused, not thrown") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-hold-typed").toString + "/t"
    val fid = (n: Long) => new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.fieldId", n).build()
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "v", "BIGINT"))),
      Vector("id"), buckets = 4)
    Merge.mergeEpoch(spark, dir,
      (1L to 20L).map(i => (i, i * 2, i, "UPSERT")).toDF("id", "v", "seq", "op")
        .select(col("id").as("id", fid(1)), col("v").as("v", fid(2)),
          col("seq"), col("op")),
      "seq", "op", "e-0")
    // hold on BIGINT key 5; erasure ticket arrives with the SAME key typed
    // as a Double (a JSON-parsed ticket) — it must land in `refused`, not
    // slip the guard and abort the whole batch inside purgeKeys
    LegalHold.place(dir, "ht", Map[String, Any]("id" -> 5L), "litigation")
    val ticket = Seq(
      Map[String, Any]("id" -> java.lang.Double.valueOf(5.0)),
      Map[String, Any]("id" -> java.lang.Integer.valueOf(7)))
    val (st, refused) = LegalHold.guardedPurge(spark, dir, ticket)
    assert(refused == Seq(ticket.head), s"held key must be refused: $refused")
    assert(st.rowsPurged > 0, "the unheld key must still purge")
    assert(IceLite.lookupLocal(IceLite.load(dir), Map("id" -> 5L)).nonEmpty)
    assert(IceLite.lookupLocal(IceLite.load(dir), Map("id" -> 7L)).isEmpty)
    // and a hold PLACED with a loose type still blocks the exact-typed purge
    LegalHold.place(dir, "ht2", Map[String, Any]("id" -> java.lang.Double.valueOf(9.0)), "audit")
    intercept[IllegalArgumentException] {
      Purge.purgeKey(spark, dir, Map[String, Any]("id" -> 9L))
    }
  }

  test("export purge is guarded too; duplicate hold ids refused") {
    val (dir, a, _) = mkTable()
    val keyA = Map[String, Any]("repo" -> a._1, "path" -> a._2)
    LegalHold.place(dir, "h2", keyA, "audit")
    intercept[IllegalArgumentException] { LegalHold.place(dir, "h2", keyA, "again") }
    intercept[IllegalArgumentException] { Purge.purgeExportsKeys(spark, dir, Seq(keyA)) }
    LegalHold.release(dir, "h2")
    // with no exports the call is a clean no-op after release
    assert(Purge.purgeExportsKeys(spark, dir, Seq(keyA)).filesRewritten == 0)
  }
}
