package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LATE-DATA BACKFILL REPAIR — the lambda-architecture contract made
  * exactly-once: a watermarked streaming aggregate serves low-latency
  * results and SILENTLY DROPS events older than the watermark (Spark's
  * documented append-mode behavior); a batch reconciliation job then
  * detects which windows received late arrivals (from ingest metadata the
  * log already carries), re-aggregates ONLY those windows exactly, and
  * MERGEs the corrections into the serving table. Stream + repair ≡ batch
  * over everything — the q124 gate proves it against the full-aggregate
  * oracle.
  *
  * Scale shape (100 TB design point):
  *  - the streaming aggregate is Spark's native watermarked tumbling
  *    window — state is O(open windows), late rows never enter state;
  *  - repair does NOT recompute the world: late windows are found by one
  *    narrow scan comparing event time to arrival time (both already in
  *    the log — Kafka/ingest timestamps at real scale), the exact
  *    re-aggregate reads only rows semi-joined to those windows (partition
  *    pruning on a time-partitioned log makes that O(late windows)), and
  *    the MERGE batch is only the rows that actually differ;
  *  - corrections land through [[graft.lake.Dml.mergeInto]]: bucket-pruned
  *    pre-image, epoch-fenced commit — a replayed repair is a no-op.
  */
object LateRepair {

  /** evidence from the stream run, for the gate's hard assertions */
  final case class StreamStats(
      /** events whose arrival wave is later than their event-time band —
        * the rows the watermark is expected to drop */
      lateArrivals: Long,
      /** sum of numRowsDroppedByWatermark over every microbatch */
      droppedByWatermark: Long,
      /** waves = checkpoint recoveries + 1 (fresh query per wave) */
      waves: Int)

  private val flushTs = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")

  /** Event-time band in [0, chunks): contiguous time slices of the corpus,
    * standing in for arrival order of an in-order log. */
  private def bandCol(tsUs: org.apache.spark.sql.Column, tmin: Long, span: Long,
      chunks: Int): org.apache.spark.sql.Column =
    least(lit(chunks - 1), ((tsUs - tmin) * chunks / span).cast("int"))

  /** Feed `events` (event_id, ts TIMESTAMP, event_type, value) through a
    * watermarked tumbling-window aggregate as `chunks` arrival waves, with
    * every `latePeriod`-th event of the first `chunks-2` bands arriving TWO
    * waves late (far beyond `delay`, so the watermark drops it). Each wave
    * runs a fresh AvailableNow query off one checkpoint — `chunks-1`
    * watermark/state recoveries ride along. A single far-future flush row
    * in the last wave closes every real window.
    *
    * The feed rows carry `__arrival_band` — the ingest-time metadata a real
    * log provides — which [[lateWindows]] uses; the aggregate itself never
    * reads it. Returns (streamed windows, stats). */
  def runStreamWithLateArrivals(spark: SparkSession, events: DataFrame,
      workRoot: String, chunks: Int, windowDur: String, delay: String,
      latePeriod: Int): (DataFrame, StreamStats) = {
    require(chunks >= 4, s"need >= 4 waves for a 2-wave late shift, got $chunks")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(workRoot))
    val ev = events.select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val mm = ev.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi"), count(lit(1)).as("n")).head()
    require(!mm.isNullAt(0), "runStreamWithLateArrivals: events frame is empty")
    val (tmin, tmax) = (mm.getLong(0), mm.getLong(1))
    val totalRows = mm.getLong(2)
    val span = math.max(1L, tmax - tmin + 1)

    val band = bandCol(unix_micros(col("ts")), tmin, span, chunks)
    // deterministic late subset: every latePeriod-th event id, shifted +2
    // waves — ~6 days later at a 30-day corpus and 5 waves, dwarfing any
    // sane watermark delay. latePeriod <= 0 = an in-order log (no shift).
    val isLate =
      if (latePeriod <= 0) lit(false)
      else pmod(col("event_id"), lit(latePeriod)) === 0 && band <= chunks - 3
    val banded = ev
      .withColumn("__arrival_band", when(isLate, band + 2).otherwise(band))
    val flush = spark.range(1).select(
      lit(-1L).as("event_id"), lit(flushTs).as("ts"),
      lit("flush").as("event_type"), lit(0.0).as("value"),
      lit(chunks - 1).as("__arrival_band"))
    val feed = banded.unionByName(flush)
    val feedDir = s"$workRoot/feed"

    var dropped = 0L
    StreamJoin.withStreamShuffle(spark, totalRows) {
      (0 until chunks).foreach { i =>
        feed.filter(col("__arrival_band") === i)
          .write.mode("append").parquet(feedDir)
        val stream = spark.readStream
          .schema(spark.read.parquet(feedDir).schema)
          .parquet(feedDir)
          .withWatermark("ts", delay)
        val agg = stream
          .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
              .cast("double").as("sum_value"))
          .select(unix_micros(col("w.start")).as("window_start_us"),
            col("event_type"), col("n"), col("sum_value"))
        val q = agg.writeStream.format("parquet")
          .option("path", s"$workRoot/out")
          .option("checkpointLocation", s"$workRoot/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        dropped += q.recentProgress.iterator
          .flatMap(p => Option(p.stateOperators).iterator.flatten)
          .map(_.numRowsDroppedByWatermark).sum
      }
    }

    val lateN = spark.read.parquet(feedDir)
      .filter(col("ts") < lit(flushTs))
      .filter(col("__arrival_band") >
        bandCol(unix_micros(col("ts")), tmin, span, chunks)).count()
    val streamed = spark.read.parquet(s"$workRoot/out")
      .filter(col("window_start_us") < unix_micros(lit(flushTs)))
    (streamed, StreamStats(lateN, dropped, chunks))
  }

  /** The windows (start micros) that received at least one LATE arrival —
    * derived purely from the log's own (event time, arrival band) columns,
    * exactly what a real pipeline reads off its ingest timestamps. One
    * narrow scan; no dependence on how the harness chose the late set. */
  def lateWindows(feed: DataFrame, windowDur: String, chunks: Int): DataFrame = {
    val real = feed.filter(col("ts") < lit(flushTs))
    val mm = real.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (tmin, span) = (mm.getLong(0), math.max(1L, mm.getLong(1) - mm.getLong(0) + 1))
    real
      .filter(col("__arrival_band") >
        bandCol(unix_micros(col("ts")), tmin, span, chunks))
      .select((unix_micros(window(col("ts"), windowDur).getField("start")))
        .as("window_start_us"))
      .distinct()
  }

  /** Exact re-aggregate of ONLY the given windows (semi-join), producing
    * the correction source for MERGE INTO: rows whose exact (n, sum) differ
    * from — or are absent in — the streamed serving table. */
  def corrections(feed: DataFrame, streamed: DataFrame, windowDur: String,
      late: DataFrame): DataFrame = {
    val exact = feed.filter(col("ts") < lit(flushTs))
      .withColumn("window_start_us",
        unix_micros(window(col("ts"), windowDur).getField("start")))
      .join(late, Seq("window_start_us"), "left_semi")
      .groupBy("window_start_us", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"))
    val t = streamed.select(
      col("window_start_us"), col("event_type"),
      col("n").as("t_n"), col("sum_value").as("t_sum"))
    exact.join(t, Seq("window_start_us", "event_type"), "left")
      .filter(col("t_n").isNull || col("t_n") =!= col("n") ||
        !(col("t_sum") <=> col("sum_value")))
      .select("window_start_us", "event_type", "n", "sum_value")
  }
}
