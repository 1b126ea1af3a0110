package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Merkle-style anti-entropy: layout-independent digests, strict-subset
  * divergence detection, bucket-pruned repair, post-repair convergence. */
class AntiEntropySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("digests are layout-independent; gap detected as strict subset; repair converges") {
    val root = Files.createTempDirectory("graft-ae").toString
    val logDir = s"$root/log"
    val a = s"$root/a"; val b = s"$root/b"
    graft.cdc.LogGen.writeLog(spark, graft.cdc.LogGen.Params(
      nEvents = 1200, nRepos = 12, pathsPerRepo = 8, deleteEvery = 15),
      logDir, epochs = 3)
    graft.cdc.Replay.replayLog(spark, logDir, a, buckets = 8)

    // full logical replica on a DIFFERENT layout: digests must agree
    val snap = IceLite.load(a)
    val dataCols = snap.currentSchema.filterNot(_.hidden).map(_.name)
    val full = IceLite.read(spark, snap, includeHidden = true)
      .filter(!coalesce(col(IceLite.DelCol.name), lit(false)))
      .select(dataCols.map(col) :+ col(IceLite.SeqCol.name).as("seq"): _*)
    graft.cdc.Replay.bootstrap(spark, full, "seq", b, buckets = 4)
    val leaves = 32
    val da = AntiEntropy.leafDigests(spark, a, leaves)
    assert(AntiEntropy.divergedLeaves(da, AntiEntropy.leafDigests(spark, b, leaves)).isEmpty,
      "identical state on different bucket layouts must digest identically")

    // a second table that missed the LAST epoch: rebuild from epochs 0-1
    val c = s"$root/c"
    val logPre = s"$root/logpre"
    (0 to 1).foreach { e =>
      spark.read.parquet(s"$logDir/epoch=$e").withColumn("epoch", lit(e))
        .write.partitionBy("epoch").mode("append").parquet(logPre)
    }
    graft.cdc.Replay.replayLog(spark, logPre, c, buckets = 4)
    val dc = AntiEntropy.leafDigests(spark, c, leaves)
    val diverged = AntiEntropy.divergedLeaves(da, dc)
    assert(diverged.nonEmpty, "a missed epoch must diverge")

    val st = AntiEntropy.repairLeaves(spark, a, c, diverged, leaves, "ae-test")
    assert(st.upserts > 0)
    assert(AntiEntropy.divergedLeaves(da,
      AntiEntropy.leafDigests(spark, c, leaves)).isEmpty,
      "repair must converge the digests")
    // re-running the same repair epoch is fenced out (no error, no change)
    AntiEntropy.repairLeaves(spark, a, c, diverged, leaves, "ae-test")
    assert(AntiEntropy.divergedLeaves(da,
      AntiEntropy.leafDigests(spark, c, leaves)).isEmpty)

    // full row-level equality, not just digest equality
    def state(dir: String) = IceLite.read(spark, IceLite.load(dir))
      .select(dataCols.map(col): _*).collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    assert(state(c) == state(a))
  }
}
