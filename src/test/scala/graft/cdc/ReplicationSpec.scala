package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Change-feed replication: a replica built from feeds alone equals the
  * source; catch-up is fenced per version and idempotent. */
class ReplicationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", n).build()

  private def batch(rows: Seq[(String, String, String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("repo", "path", "commit", "seq", "op")
      .select(col("repo").as("repo", fid(1)), col("path").as("path", fid(2)),
        col("commit").as("commit", fid(3)), col("seq"), col("op"))
  }

  test("feed-built replica ≡ source (different bucket count); catch-up idempotent") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-repl").toString
    val src = s"$root/src"; val rep = s"$root/rep"
    Replay.createTable(src, 8)
    graft.lake.Merge.mergeEpoch(spark, src, batch(Seq(
      ("r1", "a", "c1", 1L, "UPSERT"), ("r1", "b", "c2", 2L, "UPSERT"))),
      "seq", "op", "e-1")
    graft.lake.Merge.mergeEpoch(spark, src, batch(Seq(
      ("r1", "a", "c1b", 10L, "UPSERT"), ("r1", "b", "", 11L, "DELETE"),
      ("r1", "c", "c3", 12L, "UPSERT"))), "seq", "op", "e-2")

    // 3 = the "repl-0" anchor (empty create window — 0-anchors the ledger
    // watermark so the repl namespace compacts to one number) + 2 real
    assert(Replay.replicate(spark, src, rep, buckets = 2) == 3)
    def state(d: String) = graft.lake.IceLite.read(spark, graft.lake.IceLite.load(d))
      .select("path", "commit").as[(String, String)].collect().toSet
    assert(state(rep) == state(src))
    assert(state(rep) == Set(("a", "c1b"), ("c", "c3")))
    val led = graft.lake.IceLite.load(rep).ledger
    assert(led.watermarks.getOrElse("repl", -1L) == 2L &&
      !led.recent.contains("repl"),
      s"repl ledger must compact to a single watermark: $led")

    // nothing new → 0 shipped; a new source epoch ships exactly one
    assert(Replay.replicate(spark, src, rep, buckets = 2) == 0)
    graft.lake.Merge.mergeEpoch(spark, src, batch(Seq(
      ("r1", "a", "", 20L, "DELETE"))), "seq", "op", "e-3")
    assert(Replay.replicate(spark, src, rep, buckets = 2) == 1)
    assert(state(rep) == Set(("c", "c3")))

    // SCHEMA EVOLUTION: a DDL'd column (unknown to the default registry)
    // must replicate — its field id comes from the SOURCE schema, not the
    // registry's message (which would refuse it forever)
    graft.lake.IceLite.addColumn(src, "ddl-stars", "stars", "BIGINT", 100)
    graft.lake.Dml.updateWhere(spark, src, "path = 'c'",
      Seq("stars" -> "42"), "dml-stars")
    assert(Replay.replicate(spark, src, rep, buckets = 2) == 2,
      "the DDL version (empty window) and the DML version both ship")
    val starred = graft.lake.IceLite.read(spark, graft.lake.IceLite.load(rep))
      .filter(col("path") === "c").select("stars").head()
    assert(!starred.isNullAt(0) && starred.getLong(0) == 42L,
      "the evolved column's value must reach the replica")
  }
}
