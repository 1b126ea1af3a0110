package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pins the late-data repair contract beyond what the q124 oracle gate
  * proves: (a) the watermark REALLY drops the shifted rows (the state
  * operator's own drop counter, not just a result diff); (b) lateWindows
  * finds exactly the windows containing a shifted row; (c) on a stream
  * with NO late arrivals the streamed result is already exact and the
  * correction set is empty — repair is a no-op, not a rewrite. */
class LateRepairSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("late-repair-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
      col("event_type"), col("value"))

  test("watermark drops the late-shifted rows; lateWindows finds exactly their windows") {
    val root = Files.createTempDirectory("graft-late-repair").toString
    val (streamed, stats) = LateRepair.runStreamWithLateArrivals(
      spark, events, root, chunks = 5, windowDur = "6 hours",
      delay = "1 hour", latePeriod = 50)
    assert(stats.lateArrivals > 0)
    // the state operator itself counted drops — the stream was really lossy
    assert(stats.droppedByWatermark > 0,
      s"watermark dropped nothing (late=${stats.lateArrivals})")

    val feed = spark.read.parquet(s"$root/feed")
    val late = LateRepair.lateWindows(feed, "6 hours", chunks = 5)
    // every late window must contain at least one shifted event, and every
    // shifted event's window must be flagged: cross-check against the raw
    // per-event diff of the exact vs streamed aggregate
    val exact = events
      .withColumn("window_start_us",
        unix_micros(window(col("ts"), "6 hours").getField("start")))
      .groupBy("window_start_us", "event_type")
      .agg(count(lit(1)).as("n"))
    val wrongWindows = exact.as("e")
      .join(streamed.select(col("window_start_us"), col("event_type"),
        col("n").as("t_n")), Seq("window_start_us", "event_type"), "left")
      .filter(col("t_n").isNull || col("t_n") =!= col("n"))
      .select("window_start_us").distinct()
    // streamed diverges ONLY inside flagged windows
    val unflagged = wrongWindows.join(late, Seq("window_start_us"), "left_anti").count()
    assert(unflagged === 0, s"$unflagged wrong windows not flagged as late")

    val corr = LateRepair.corrections(feed, streamed, "6 hours", late)
    assert(corr.count() > 0)
    // corrections restore exactness: exact LEFT ANTI (streamed ∪ corrections
    // override) must be empty
    val repaired = streamed.as("t")
      .join(corr.select(col("window_start_us"), col("event_type")),
        Seq("window_start_us", "event_type"), "left_anti")
      .select("window_start_us", "event_type", "n")
      .unionByName(corr.select("window_start_us", "event_type", "n"))
    val diff = repaired.as("r").join(exact.as("e"),
        Seq("window_start_us", "event_type"), "full")
      .filter(!(col("r.n") <=> col("e.n"))).count()
    assert(diff === 0, s"$diff windows still wrong after repair")
  }

  test("no late arrivals -> streamed is exact and the correction set is empty") {
    val root = Files.createTempDirectory("graft-late-repair-clean").toString
    val (streamed, stats) = LateRepair.runStreamWithLateArrivals(
      spark, events, root, chunks = 5, windowDur = "6 hours",
      delay = "1 hour", latePeriod = 0) // <= 0 = in-order log, no shift
    assert(stats.lateArrivals === 0)
    val feed = spark.read.parquet(s"$root/feed")
    val late = LateRepair.lateWindows(feed, "6 hours", chunks = 5)
    assert(late.count() === 0)
    assert(LateRepair.corrections(feed, streamed, "6 hours", late).count() === 0)
    // and the streamed result is ALREADY the exact aggregate
    val exact = events
      .withColumn("window_start_us",
        unix_micros(window(col("ts"), "6 hours").getField("start")))
      .groupBy("window_start_us", "event_type").agg(count(lit(1)).as("n"))
    val diff = streamed.select(col("window_start_us"), col("event_type"), col("n"))
      .exceptAll(exact).count()
    assert(diff === 0)
  }
}
