package graft.lake

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ANALYZE: per-column stats over the resolved table — exact counts where
  * the KMV sketch saturates, bounded-error estimates where it doesn't,
  * persisted and readable back for the planner. */
class AnalyzeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stats: exact when saturated, bounded estimate when not, persisted") {
    val root = Files.createTempDirectory("graft-analyze").toString
    graft.cdc.LogGen.writeLog(spark, graft.cdc.LogGen.Params(
      nEvents = 1500, nRepos = 12, pathsPerRepo = 8, v1Fraction = 0.5),
      s"$root/log", epochs = 2)
    graft.cdc.Replay.replayLog(spark, s"$root/log", s"$root/t", buckets = 4)
    val dir = s"$root/t"

    val stats = Analyze.analyze(spark, dir, k = 32).collect()
      .map(r => r.getString(0) -> r).toMap
    val tableRows = IceLite.read(spark, IceLite.load(dir)).count()
    val table = IceLite.read(spark, IceLite.load(dir))

    assert(stats.keySet == Set("repo", "path", "commit", "lang", "content", "author"))
    stats.values.foreach { r =>
      assert(r.getLong(1) == tableRows, s"${r.getString(0)}: n_rows")
      assert(r.getLong(2) == 0L, s"${r.getString(0)}: n_nulls")
    }
    // saturated columns report the exact distinct count, NULL kth_hash
    Seq("repo", "lang").foreach { c =>
      val exact = table.select(c).distinct().count()
      assert(exact < 32)
      assert(stats(c).isNullAt(4), s"$c should saturate")
      assert(stats(c).getDouble(3) == exact.toDouble, s"$c: exact ndv")
    }
    // a high-NDV column estimates within sketch error (k=32 -> ~18% sd)
    val exactCommit = table.select("commit").distinct().count()
    assert(exactCommit > 32 && !stats("commit").isNullAt(4))
    val est = stats("commit").getDouble(3)
    assert(est > exactCommit * 0.5 && est < exactCommit * 2.0,
      s"commit ndv est $est vs exact $exactCommit")

    // persisted + readable back
    val ndv = Analyze.ndv(dir)
    assert(math.abs(ndv("commit") - est) < 1e-6)
    assert(ndv("repo") == stats("repo").getDouble(3))
  }

  private def keyed(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.toSeq

  test("incremental per-bucket sketches: merged == full analyze bit-for-bit") {
    val root = Files.createTempDirectory("graft-analyze-inc").toString
    graft.cdc.LogGen.writeLog(spark, graft.cdc.LogGen.Params(
      nEvents = 1500, nRepos = 12, pathsPerRepo = 8, v1Fraction = 0.5),
      s"$root/log", epochs = 2)
    graft.cdc.Replay.replayLog(spark, s"$root/log", s"$root/t", buckets = 4)
    val dir = s"$root/t"

    Analyze.refreshBuckets(spark, dir, (0 until 4).toSet, k = 32)
    assert(keyed(Analyze.mergedStats(spark, dir)) ==
      keyed(Analyze.analyze(spark, dir, k = 32)))

    // a DML commit touches a bucket subset; refreshing only those buckets
    // must reproduce the new full analyze exactly (delete ONE key — a
    // whole repo's paths fan out over every bucket)
    val vPre = IceLite.load(dir).version
    val k0 = IceLite.read(spark, IceLite.load(dir))
      .select("repo", "path").orderBy("repo", "path").head()
    Dml.deleteWhere(spark, dir,
      s"repo = '${k0.getString(0)}' AND path = '${k0.getString(1)}'", "inc-del")
    val touched = Analyze.touchedBuckets(dir, vPre, IceLite.load(dir).version)
    assert(touched.nonEmpty && touched.size < 4, s"expected a strict subset: $touched")
    Analyze.refreshBuckets(spark, dir, touched, k = 32)
    assert(keyed(Analyze.mergedStats(spark, dir)) ==
      keyed(Analyze.analyze(spark, dir, k = 32)))

    // a stale sketch (touched-but-unrefreshed bucket) is detectable: the
    // merged fold differs from a fresh full analyze after another commit
    Dml.deleteWhere(spark, dir, "repo = 'org001/repo001'", "inc-del2")
    assert(keyed(Analyze.mergedStats(spark, dir)) !=
      keyed(Analyze.analyze(spark, dir, k = 32)))

    // parameter drift refuses rather than merging incompatible sketches
    intercept[IllegalArgumentException] {
      Analyze.refreshBuckets(spark, dir, Set(0), k = 64)
    }
  }

  test("a touched bucket whose keys all vanished drops its sketch row") {
    val root = Files.createTempDirectory("graft-analyze-empty").toString
    graft.cdc.LogGen.writeLog(spark, graft.cdc.LogGen.Params(
      nEvents = 400, nRepos = 4, pathsPerRepo = 3, deleteEvery = 0),
      s"$root/log", epochs = 1)
    graft.cdc.Replay.replayLog(spark, s"$root/log", s"$root/t", buckets = 4)
    val dir = s"$root/t"
    Analyze.refreshBuckets(spark, dir, (0 until 4).toSet, k = 32)

    // empty one whole bucket via DELETE on its keys
    val snap = IceLite.load(dir)
    val victims = IceLite.read(spark, snap)
      .withColumn("__b", IceLite.bucketExpr(snap.keyCols, snap.buckets))
      .filter(org.apache.spark.sql.functions.col("__b") === 0)
    val vKeys = victims.select("repo", "path").collect()
    assert(vKeys.nonEmpty, "fixture needs keys in bucket 0")
    Dml.deleteWhere(spark, dir,
      vKeys.map(r => s"(repo = '${r.getString(0)}' AND path = '${r.getString(1)}')")
        .mkString(" OR "), "empty-bucket0")
    Analyze.refreshBuckets(spark, dir, Set(0), k = 32)
    assert(!Files.exists(java.nio.file.Paths.get(dir, "meta", "bucket_stats", "bucket=0")),
      "an emptied bucket must drop its sketch partition")
    assert(keyed(Analyze.mergedStats(spark, dir)) ==
      keyed(Analyze.analyze(spark, dir, k = 32)))
  }
}
