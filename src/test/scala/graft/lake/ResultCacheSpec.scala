package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Result cache: concurrent misses converge on one slot, hits are
  * version-pinned, vacuum keeps the newest slots. */
class ResultCacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("concurrent first calls race safely; vacuum keeps newest") {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-rescache-spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val logDir = s"$root/log"
    val tableDir = s"$root/table"
    val cacheDir = s"$root/cache"
    graft.cdc.LogGen.writeLog(spark, graft.cdc.LogGen.Params(nEvents = 400,
      nRepos = 10, pathsPerRepo = 5, v1Fraction = 0.5), logDir, epochs = 2)
    graft.cdc.Replay.replayLog(spark, logDir, tableDir, buckets = 4)
    val q = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("lang").agg(count(lit(1)).as("n"))
    // two threads miss simultaneously — both must serve, one slot survives
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val served = Await.result(Future.sequence(Seq(
      Future(ResultCache.run(spark, tableDir, cacheDir, "by_lang", q)),
      Future(ResultCache.run(spark, tableDir, cacheDir, "by_lang", q)))), 120.seconds)
    val want = q(IceLite.read(spark, IceLite.load(tableDir)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    served.foreach { r =>
      assert(r.df.collect().map(x => x.getString(0) -> x.getLong(1)).toMap == want)
    }
    val slots = java.nio.file.Files.list(
      java.nio.file.Paths.get(cacheDir, "by_lang")).count()
    assert(slots == 1, s"one slot survives the race, found $slots")
    // a second version, then vacuum keeps only the newest
    Dml.deleteWhere(spark, tableDir, "lang = 'md'", "dml-1")
    val r2 = ResultCache.run(spark, tableDir, cacheDir, "by_lang", q)
    assert(!r2.hit)
    assert(ResultCache.vacuum(cacheDir, "by_lang", keepLast = 1) == 1)
    assert(ResultCache.run(spark, tableDir, cacheDir, "by_lang", q).hit)
  }
}
