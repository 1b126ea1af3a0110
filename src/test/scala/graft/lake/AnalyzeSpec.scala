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
}
