package graft.lake

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{LogGen, Replay}

/** Consumer-cursor contract edges the sf0.01 gate doesn't pin: monotonic
  * ack, unknown/duplicate consumer refusal, bounded polls, empty-window
  * schema. */
class FeedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("feed-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val dir: String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-feed-spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    LogGen.writeLog(spark, LogGen.Params(nEvents = 600, nRepos = 10,
      pathsPerRepo = 8), s"$root/log", epochs = 3)
    Replay.replayLog(spark, s"$root/log", s"$root/table", buckets = 4)
    s"$root/table"
  }

  test("create/position/ack lifecycle; duplicate create and rewind refused") {
    Feed.create(dir, "c1", startVersion = 0)
    assert(Feed.position(dir, "c1") == 0)
    intercept[IllegalArgumentException](Feed.create(dir, "c1"))
    intercept[IllegalArgumentException](Feed.position(dir, "nope"))
    Feed.ack(dir, "c1", 2)
    assert(Feed.position(dir, "c1") == 2)
    intercept[IllegalArgumentException](Feed.ack(dir, "c1", 1))
    Feed.ack(dir, "c1", 2) // idempotent re-ack of the same version is fine
    assert(Feed.position(dir, "c1") == 2)
  }

  test("bounded polls cover exactly the remaining versions; drained poll is empty with schema") {
    Feed.create(dir, "c2", startVersion = 0)
    val head = IceLite.load(dir).version
    var total = 0L
    var steps = 0
    var cur = Feed.position(dir, "c2")
    while (cur < head) {
      val (w, to) = Feed.poll(spark, dir, "c2", maxVersions = 1)
      assert(to == cur + 1)
      total += w.count(); steps += 1
      Feed.ack(dir, "c2", to); cur = to
    }
    assert(steps == head)
    val (empty, to) = Feed.poll(spark, dir, "c2")
    assert(to == head && empty.count() == 0)
    assert(empty.columns.contains("repo") && empty.columns.contains(IceLite.SeqCol.name))
    // a full-window poll from a fresh consumer NETS OUT intermediate
    // rewrites absorbed by inline compaction inside the window (the Delta
    // CDF caveat): its rows are a subset of the stepwise delivery, and an
    // LWW applier lands in the same final state either way
    Feed.create(dir, "c3", startVersion = 0)
    val (all, _) = Feed.poll(spark, dir, "c3")
    assert(all.count() <= total)
    Feed.create(dir, "c4", startVersion = 0)
    val step = (1 to head).map { v =>
      val (w, to) = Feed.poll(spark, dir, "c4", maxVersions = 1)
      Feed.ack(dir, "c4", to); w
    }.reduce(_.unionByName(_))
    val key = Seq("repo", "path", IceLite.SeqCol.name)
    assert(all.select(key.head, key.tail: _*)
      .except(step.select(key.head, key.tail: _*)).count() == 0,
      "net window rows must be a subset of stepwise delivery")
    def fold(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.functions._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("repo", "path").orderBy(col(IceLite.SeqCol.name).desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .filter(!col(IceLite.DelCol.name))
        .select("repo", "path", "commit").collect().toSet
    }
    assert(fold(all) == fold(step), "LWW fold must agree across window shapes")
  }
}
