package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Key erasure: after purgeKey, NO read path — head scan, time travel to
  * any retained version, point lookup, change feed — serves the key, and
  * every other row is byte-identical to before. */
class PurgeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def state(snap: IceLite.Snapshot): Set[Seq[Any]] =
    IceLite.read(spark, snap)
      .select(col("repo"), col("path"), col("commit"),
        sha2(col("content"), 256).as("sha"))
      .collect().map(_.toSeq).toSet

  test("purge erases the key from every version; everything else untouched") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-purge").toString
    graft.cdc.LogGen.writeLog(spark, graft.cdc.LogGen.Params(
      nEvents = 2000, nRepos = 15, pathsPerRepo = 10, v1Fraction = 0.6),
      s"$root/log", epochs = 3)
    graft.cdc.Replay.replayLog(spark, s"$root/log", s"$root/t", buckets = 8)

    val dir = s"$root/t"
    val head = IceLite.load(dir)
    // victim: hottest live key
    val victim = IceLite.read(spark, head)
      .groupBy("repo", "path").count()
      .orderBy(col("count").desc, col("repo"), col("path"))
      .select("repo", "path").as[(String, String)].head()
    val key = Map[String, Any]("repo" -> victim._1, "path" -> victim._2)
    assert(IceLite.lookupLocal(head, key).nonEmpty, "victim must be live pre-purge")

    val versions = IceLite.history(dir)
    val pre = versions.map(v => v -> state(IceLite.loadVersion(dir, v))).toMap

    val st = Purge.purgeKey(spark, dir, key)
    assert(st.filesRewritten > 0 && st.rowsPurged > 0)
    assert(st.filesCandidates < st.filesTotal,
      s"pruning must rule out most files: $st")

    versions.foreach { v =>
      val snap = IceLite.loadVersion(dir, v)
      val post = state(snap)
      val expected = pre(v).filterNot(r => r.head == victim._1 && r(1) == victim._2)
      assert(post == expected, s"version $v: purge changed a non-victim row or kept the victim")
    }
    assert(IceLite.lookupLocal(IceLite.load(dir), key).isEmpty, "point lookup must miss")
    // the change feed can no longer emit the key either
    val feed = IceLite.changes(spark, dir, fromVersion = 1, toVersion = versions.max)
      .filter(col("repo") === victim._1 && col("path") === victim._2).count()
    assert(feed == 0L, "change feed must not resurrect a purged key")

    // idempotent: a second purge finds nothing
    val again = Purge.purgeKey(spark, dir, key)
    assert(again.filesRewritten == 0 && again.rowsPurged == 0L)

    // audit markers recorded
    assert(Files.exists(java.nio.file.Paths.get(dir, "meta", "purge-0.json")))
    assert(Files.exists(java.nio.file.Paths.get(dir, "meta", "purge-1.json")))
  }
}
