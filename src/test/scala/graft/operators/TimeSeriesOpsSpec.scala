package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("timeseries-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("gap fill: hourly grid, last-event-per-hour, forward fill across gaps") {
    import spark.implicits._
    // user 1: events at 00:10 (v=1), 00:50 (v=2), 03:20 (v=9) → grid 00..03,
    // hour 0 takes the LAST event (event_id order), 01/02 forward-fill 2.0
    val ev = Seq(
      (10L, "2024-01-01 00:10:00", 1L, 1.0),
      (11L, "2024-01-01 00:50:00", 1L, 2.0),
      (12L, "2024-01-01 03:20:00", 1L, 9.0),
      (20L, "2024-01-01 05:00:00", 2L, 7.0))
      .toDF("event_id", "s", "user_id", "value")
      .select(col("event_id"), to_timestamp(col("s")).as("ts"),
        col("user_id"), col("value"))
    // run the gate body against the synthetic frame via a temp parquet dir
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-tsspec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    ev.write.parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q128_gap_fill")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getBoolean(3))).toSeq
    assert(out == Seq(
      (1L, "2024-01-01 00:00:00.0", 2.0, true),
      (1L, "2024-01-01 01:00:00.0", 2.0, false),
      (1L, "2024-01-01 02:00:00.0", 2.0, false),
      (1L, "2024-01-01 03:00:00.0", 9.0, true),
      (2L, "2024-01-01 05:00:00.0", 7.0, true)))
  }

  test("rolling range window: equal-timestamp peers share the frame") {
    import spark.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-tsspec2"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    Seq(
      (1L, "2024-01-01 00:00:00", 1L, 1.0),
      (2L, "2024-01-01 00:30:00", 1L, 2.0),
      (3L, "2024-01-01 00:30:00", 1L, 4.0), // peer of event 2: same frame
      (4L, "2024-01-01 01:31:00", 1L, 8.0)) // events 2,3 out of 1h range? no: 61min > 60 → only itself
      .toDF("event_id", "s", "user_id", "value")
      .select(col("event_id"), to_timestamp(col("s")).as("ts"),
        col("user_id"), col("value"))
      .write.parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q129_rolling_range")(spark, dir)
      .select("event_id", "n_1h", "sum_1h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, 1L, 1.0), (2L, 3L, 7.0), (3L, 3L, 7.0), (4L, 1L, 8.0)))
  }

  test("sweepConcurrency == single-window reference at every band count") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // random intervals incl. shared endpoints and back-to-back pairs
    val pts = (0 until 200).flatMap { _ =>
      val s = rnd.nextInt(50).toLong
      val e = s + 1 + rnd.nextInt(20)
      Seq((s, 1L), ((e + 1), -1L))
    }
    // reference: collapse equal (t, delta), one global ordered prefix sum
    val ref = pts.groupBy(identity).map { case ((t, d), xs) => (t, d, d * xs.size) }
      .toSeq.sortBy(p => (p._1, p._2))
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (t, d, s)) => (t, d, acc + s) }
      .drop(1)
      .map { case (t, d, acc) => (t, d, acc) }
    for (bands <- Seq(1, 3, 16)) {
      val got = TimeSeriesOps.sweepConcurrency(pts.toDF("t", "delta"), bands)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(p => (p._1, p._2)).toSeq
      assert(got == ref, s"bands=$bands")
    }
  }
}
