package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Integrity scrub: silent byte corruption is detected by verify, the
  * damaged bucket is re-materialized from the change log, and the repaired
  * table state is identical to an undamaged replay — tombstones included. */
class ScrubSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def state(dir: String): Set[Seq[Any]] =
    IceLite.read(spark, IceLite.load(dir))
      .select(col("repo"), col("path"), col("commit"), col("lang"),
        sha2(col("content"), 256).as("sha"), col("author"))
      .collect().map(_.toSeq).toSet

  test("corrupt -> detect -> repair from log -> identical state") {
    val root = Files.createTempDirectory("graft-scrub").toString
    val logDir = s"$root/log"
    graft.cdc.LogGen.writeLog(spark, graft.cdc.LogGen.Params(
      nEvents = 2000, nRepos = 15, pathsPerRepo = 10, deleteEvery = 15,
      v1Fraction = 0.6), logDir, epochs = 3)
    graft.cdc.Replay.replayLog(spark, logDir, s"$root/t", buckets = 4)
    graft.cdc.Replay.replayLog(spark, logDir, s"$root/control", buckets = 4)

    val dir = s"$root/t"
    val n = Scrub.record(spark, dir)
    assert(n == IceLite.load(dir).files.map(_.path).distinct.size)
    assert(Scrub.verify(spark, dir).isEmpty)

    // silent corruption: flip bytes mid-file, drop the fs checksum sidecar
    val victim = IceLite.load(dir).files.filter(_.rows > 0)
      .maxBy(_.rows)
    val raf = new java.io.RandomAccessFile(victim.path, "rw")
    try { raf.seek(raf.length() / 2); raf.write(Array.fill[Byte](64)(0x5a)) }
    finally raf.close()
    val t = Paths.get(victim.path)
    Files.deleteIfExists(t.resolveSibling("." + t.getFileName.toString + ".crc"))

    assert(Scrub.verify(spark, dir) == Vector(victim.path))

    Scrub.repairBucket(spark, dir, logDir, victim.bucket, "repair-0")
    assert(Scrub.verify(spark, dir).isEmpty, "repair must restore a clean scrub")
    val head = IceLite.load(dir)
    assert(!head.files.exists(_.path == victim.path), "damaged file must leave the head")
    assert(state(dir) == state(s"$root/control"), "repaired state must equal undamaged replay")

    // tombstones survive the repair (deleteEvery=15 guarantees several)
    val dels = IceLite.read(spark, head, f => f.bucket == victim.bucket, includeHidden = true)
      .filter(col(IceLite.DelCol.name)).count()
    assert(dels > 0, "repaired bucket lost its tombstones")

    // fenced: same epochId again is a no-op
    val v = head.version
    Scrub.repairBucket(spark, dir, logDir, victim.bucket, "repair-0")
    assert(IceLite.load(dir).version == v)
  }

  test("in-place maintenance (purge) re-enters the baseline via refresh") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-scrub2").toString
    graft.cdc.LogGen.writeLog(spark, graft.cdc.LogGen.Params(
      nEvents = 800, nRepos = 10, pathsPerRepo = 6), s"$root/log", epochs = 2)
    graft.cdc.Replay.replayLog(spark, s"$root/log", s"$root/t", buckets = 4)
    val dir = s"$root/t"
    Scrub.record(spark, dir)

    val victim = IceLite.read(spark, IceLite.load(dir))
      .select("repo", "path").as[(String, String)].head()
    Purge.purgeKey(spark, dir, Map("repo" -> victim._1, "path" -> victim._2))

    val flagged = Scrub.verify(spark, dir)
    assert(flagged.nonEmpty, "purge rewrote files; scrub must notice")
    Scrub.record(spark, dir, refresh = flagged.toSet)
    assert(Scrub.verify(spark, dir).isEmpty)
  }
}
