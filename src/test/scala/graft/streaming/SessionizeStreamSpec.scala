package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming ≡ batch sessionization (the invariant that makes the session
  * operator trustworthy on a live stream): the same events, fed as a file
  * stream in three out-of-order-across-batch chunks, must produce EXACTLY
  * the batch operator's sessions — through both execution shapes:
  * the native session_window aggregate (q33's plan + watermark, append
  * mode) and the flatMapGroupsWithState custom-state path builder (q34's
  * output shape). A far-future flush event per user advances the watermark
  * so every real session closes; no-data microbatches fire the timeouts. */
class SessionizeStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("sessionize-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val gapUs = 12L * 3600 * 1000000
  private val flushTs = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")

  /** sf0.001 events (read-only testdata) for 8 users + one flush event per
    * user far in the future, written as 3 stream chunks by event_id band. */
  private def prep(): (String, DataFrame) = {
    import spark.implicits._
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .filter(col("user_id") < 8)
      .select(col("user_id"), col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("event_type"), col("value"))
    val flush = src.select(col("user_id")).distinct()
      .select(col("user_id"), (col("user_id") + 1000000L).as("event_id"),
        lit(flushTs).as("ts"), lit("flush").as("event_type"), lit(0.0).as("value"))
    val all = src.unionByName(flush).cache()
    val dir = Files.createTempDirectory("graft-sess-stream").toString
    // three TIME-BANDED chunks (a real stream arrives roughly in time order;
    // later-chunk events older than the watermark would be dropped as late);
    // events within a chunk may be arbitrarily disordered. The flush events
    // ride the LAST chunk.
    val (b1, b2) = ("2024-01-11 00:00:00", "2024-01-21 00:00:00")
    all.filter(col("ts") < b1).write.parquet(s"$dir/in/c0")
    all.filter(col("ts") >= b1 && col("ts") < b2).write.parquet(s"$dir/in/c1")
    all.filter(col("ts") >= b2).write.parquet(s"$dir/in/c2")
    (dir, all)
  }

  private def feed(dir: String, chunk: Int): Unit =
    StreamFeed.feed(s"$dir/in/c$chunk", s"$dir/feed", s"c$chunk")

  test("native session_window stream (append + watermark) emits exactly the batch sessions") {
    val (dir, all) = prep()
    val schema = spark.read.parquet(s"$dir/in/c0").schema
    feed(dir, 0)
    val stream = spark.readStream.schema(schema).parquet(s"$dir/feed")
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("ts"), col("value"))
    val q = Sessionize.sessions(stream, "12 hours")
      .writeStream.format("memory").queryName("sess_sw").outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt-sw").start()
    try {
      q.processAllAvailable()
      feed(dir, 1); q.processAllAvailable()
      feed(dir, 2); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sess_sw")
      .filter(col("session_start_us") < unix_micros(lit(flushTs))) // drop flush sessions
    val want = Sessionize.sessions(
      all.filter(col("event_id") < 1000000L).select("user_id", "ts", "value"), "12 hours")
    val gotRows = got.collect().map(_.toString).sorted.toSeq
    val wantRows = want.collect().map(_.toString).sorted.toSeq
    assert(gotRows.nonEmpty && gotRows == wantRows,
      s"stream=${gotRows.size} batch=${wantRows.size}")
  }

  test("flatMapGroupsWithState path builder emits exactly the batch q34 paths") {
    import spark.implicits._
    val (dir, all) = prep()
    val schema = spark.read.parquet(s"$dir/in/c0").schema
    feed(dir, 0)
    val stream = spark.readStream.schema(schema).parquet(s"$dir/feed")
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[Sessionize.Ev]
    val q = Sessionize.sessionPathsStream(stream, gapUs)
      .writeStream.format("memory").queryName("sess_paths").outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt-fm").start()
    try {
      q.processAllAvailable()
      feed(dir, 1); q.processAllAvailable()
      feed(dir, 2); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sess_paths")
      .filter(col("session_start_us") < unix_micros(lit(flushTs)))
    // batch reference: same formulation as q34 — trust-chained to its
    // DuckDB oracle through the driver gate
    val sfDir = "/root/testdata/sf0.001"
    val wantAll = graft.operators.SessionOps.queries
      .find(_.name == "q34_session_paths").get.fn(spark, sfDir)
      .filter(col("user_id") < 8)
    val gotRows = got.select("user_id", "session_start_us", "n_events", "path")
      .collect().map(_.toString).sorted.toSeq
    val wantRows = wantAll.select("user_id", "session_start_us", "n_events", "path")
      .collect().map(_.toString).sorted.toSeq
    assert(gotRows.nonEmpty && gotRows == wantRows,
      s"stream=${gotRows.size} batch=${wantRows.size}")
  }

  test("tumbling-window stream (q39's plan + watermark) emits exactly the batch windows") {
    val (dir, all) = prep()
    val schema = spark.read.parquet(s"$dir/in/c0").schema
    feed(dir, 0)
    def agg(df: DataFrame): DataFrame = df
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("window_start_us"), col("event_type"), col("n"))
    val stream = spark.readStream.schema(schema).parquet(s"$dir/feed")
      .withWatermark("ts", "0 seconds")
      .select(col("ts"), col("event_type"))
    val q = agg(stream)
      .writeStream.format("memory").queryName("tumble").outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt-tw").start()
    try {
      q.processAllAvailable()
      feed(dir, 1); q.processAllAvailable()
      feed(dir, 2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("tumble")
      .filter(col("window_start_us") < unix_micros(lit(flushTs)))
      .collect().map(_.toString).sorted.toSeq
    val want = agg(all.filter(col("event_id") < 1000000L).select("ts", "event_type"))
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == want, s"stream=${got.size} batch=${want.size}")
  }

  test("exact gap boundary: session_window ≡ lag/cumsum ≡ Sessionize.split (new session iff gap > threshold)") {
    import spark.implicits._
    // gaps of exactly 12h, 12h-1us, 12h+1us around t0 — session_window's
    // merge is INCLUSIVE at the boundary (an event at exactly last + gap
    // still merges), so the oracles' lag clause must be `> INTERVAL`, not
    // `>=`. This test CAUGHT that divergence (a `>=` formulation passed the
    // sf0.01 oracle gate only because no real gap lands on the exact us).
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime // ms
    def ts(offsetUs: Long) = {
      val t = new java.sql.Timestamp(t0 + offsetUs / 1000)
      t.setNanos(((offsetUs % 1000000) * 1000).toInt)
      t
    }
    val gap = gapUs
    val rows = Seq(
      (1L, 1L, 0L), (1L, 2L, gap),                   // exactly ==  → MERGE (inclusive)
      (2L, 3L, 0L), (2L, 4L, gap - 1),               // one us less → merge
      (3L, 5L, 0L), (3L, 6L, gap + 1),               // one us more → split
      (4L, 7L, 0L), (4L, 8L, 0L)                     // equal ts    → merge
    ).map { case (u, e, off) => (u, e, ts(off), "x", 1.0) }
    val df = rows.toDF("user_id", "event_id", "ts", "event_type", "value")

    // 1) native session_window (q33's operator)
    val sw = Sessionize.sessions(df.select("user_id", "ts", "value"), "12 hours")
      .select("user_id", "session_start_us", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    // 2) the lag/cumsum formulation (q34's split rule, inlined over the
    //    same rows — q34 itself reads the parquet table)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val cum = df.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("ns", when(lag(col("ts_us"), 1).over(w).isNull ||
        col("ts_us") - lag(col("ts_us"), 1).over(w) > gap, 1).otherwise(0))
      .withColumn("sid", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("ts_us")).as("session_start_us"), count(lit(1)).as("n_events"))
      .select("user_id", "session_start_us", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    // 3) the streaming state machine's splitter
    val viaSplit = rows.groupBy(_._1).flatMap { case (u, rs) =>
      val evs = rs.map { case (uu, e, t, _, _) =>
        Sessionize.Ev(uu, e, t, t.getTime / 1000 * 1000000 + t.getNanos / 1000, "x")
      }.sortBy(e => (e.ts_us, e.event_id)).toIndexedSeq
      Sessionize.split(evs, gap).map(s => (u, s.head.ts_us, s.length.toLong))
    }.toSet

    assert(sw == cum, s"session_window $sw != cumsum $cum")
    assert(sw == viaSplit, s"session_window $sw != split $viaSplit")
    // and the boundary behaves as documented
    assert(sw.count(_._1 == 1L) == 1, "gap == threshold must MERGE (inclusive boundary)")
    assert(sw.count(_._1 == 2L) == 1, "gap < threshold must merge")
    assert(sw.count(_._1 == 3L) == 2, "gap > threshold must split")
    assert(sw.count(_._1 == 4L) == 1, "equal timestamps must merge")
  }

  test("property: session_window == Sessionize.split on random event sets (incl. exact-boundary gaps)") {
    import spark.implicits._
    // seeded random users/timestamps with gaps drawn AROUND the threshold
    // (¼ exactly the gap, ¼ gap±1us, rest uniform) — the distribution that
    // would expose any boundary or ordering drift between the native
    // operator and the state machine's splitter
    val rnd = new scala.util.Random(20260817L)
    val base = java.sql.Timestamp.valueOf("2024-05-01 00:00:00").getTime * 1000L
    val rows = (0 until 12).flatMap { u =>
      var t = base + rnd.nextInt(1000000)
      (0 until 40).map { i =>
        val gap = rnd.nextInt(4) match {
          case 0 => gapUs
          case 1 => gapUs + (if (rnd.nextBoolean()) 1 else -1)
          case _ => (rnd.nextDouble() * 2 * gapUs).toLong
        }
        t += gap
        (u.toLong, (u * 1000 + i).toLong, t)
      }
    }
    val df = rows.toDF("user_id", "event_id", "ts_us")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("ts_us")).as("ts"), lit(0.0).as("value"))
    val viaSw = Sessionize.sessions(df.select("user_id", "ts", "value"), "12 hours")
      .select("user_id", "session_start_us", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    val viaSplit = rows.groupBy(_._1).flatMap { case (u, rs) =>
      val evs = rs.map { case (uu, e, tUs) =>
        Sessionize.Ev(uu, e, new java.sql.Timestamp(tUs / 1000), tUs, "x")
      }.sortBy(e => (e.ts_us, e.event_id)).toIndexedSeq
      Sessionize.split(evs, gapUs).map(s => (u, s.head.ts_us, s.length.toLong))
    }.toSet
    assert(viaSw == viaSplit,
      s"sw-only=${(viaSw -- viaSplit).take(3)} split-only=${(viaSplit -- viaSw).take(3)}")
    // sanity: the generator actually produced both splits and merges
    assert(viaSw.size > 12 && viaSw.size < rows.size)
  }

  test("a session split across stream chunks merges (no premature close before the watermark allows)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sess-split").toString
    def write(chunk: Int, rows: Seq[(Long, Long, String, String)]): Unit = {
      rows.toDF("user_id", "event_id", "ts_s", "event_type")
        .select(col("user_id"), col("event_id"), col("ts_s").cast("timestamp").as("ts"),
          col("event_type"))
        .write.parquet(s"$dir/feed/c$chunk")
    }
    // one user; events 1h apart land in DIFFERENT chunks; the second event
    // is DELIVERED TWICE (at-least-once source) and must be counted twice
    // like the batch formulation counts it; flush closes
    write(0, Seq((1L, 1L, "2024-01-01 00:00:00", "a")))
    val schema = spark.read.parquet(s"$dir/feed/c0").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/feed/*")
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[Sessionize.Ev]
    val q = Sessionize.sessionPathsStream(stream, gapUs)
      .writeStream.format("memory").queryName("sess_split").outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      // the second event is DELIVERED TWICE in its batch (at-least-once
      // source): both copies are in front of the watermark and must be
      // counted twice, like the batch formulation counts them
      write(1, Seq((1L, 2L, "2024-01-01 01:00:00", "b"),
        (1L, 2L, "2024-01-01 01:00:00", "b")))
      q.processAllAvailable()
      write(2, Seq((1L, 3L, "2030-01-01 00:00:00", "flush")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_split")
      .filter(col("path") =!= "flush")
      .select("user_id", "n_events", "path").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 3L, "a,b,b")), s"got $got")
  }
}
