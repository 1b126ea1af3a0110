package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Snapshot bootstrap: the bulk-loaded rows carry their original sequences,
  * so overlapping re-delivery (at-least-once) and genuinely-new changes
  * both resolve correctly under the LWW merge. */
class BootstrapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", n).build()

  test("overlap re-delivery is absorbed; older loses; newer wins; delete applies") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-bootstrap").toString
    val tableDir = s"$root/table"
    val snapshot = Seq(
      ("r1", "a", "cA", 10L), ("r1", "b", "cB", 11L), ("r1", "c", "cC", 12L))
      .toDF("repo", "path", "commit", "seq")
    val bs = Replay.bootstrap(spark, snapshot, "seq", tableDir, buckets = 4)
    assert(bs.applied && bs.batchRows == 3)

    // the "log tail": a stale pre-cut event for a (loses), an exact
    // re-delivery of b (ties with identical values — absorbed), a newer
    // version of c (wins), and a post-cut delete of a
    val tail = Seq(
      ("r1", "a", "cOld", 5L, "UPSERT"),
      ("r1", "b", "cB", 11L, "UPSERT"),
      ("r1", "c", "cC2", 20L, "UPSERT"),
      ("r1", "a", "", 21L, "DELETE"))
      .toDF("repo", "path", "commit", "seq", "op")
      .select(col("repo").as("repo", fid(1)), col("path").as("path", fid(2)),
        col("commit").as("commit", fid(3)), col("seq"), col("op"))
    graft.lake.Merge.mergeEpoch(spark, tableDir, tail, "seq", "op", "replay-1")

    val got = graft.lake.IceLite.read(spark, graft.lake.IceLite.load(tableDir))
      .select("path", "commit").as[(String, String)].collect().toSet
    assert(got == Set(("b", "cB"), ("c", "cC2")))

    // a replayed bootstrap fences as a no-op
    assert(!Replay.bootstrap(spark, snapshot, "seq", tableDir, buckets = 4).applied)
  }

  test("snapshot columns must be registry fields") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-bootstrap2").toString
    val bad = Seq(("r1", "a", "x", 1L)).toDF("repo", "path", "nope", "seq")
    val e = intercept[IllegalArgumentException] {
      Replay.bootstrap(spark, bad, "seq", s"$root/t", buckets = 4)
    }
    assert(e.getMessage.contains("nope"))
  }
}
