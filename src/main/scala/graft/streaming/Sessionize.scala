package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over the events stream — the session-construction
  * operator a training-data pipeline uses to assemble interaction episodes
  * (conversations, browse sessions) from a raw event log.
  *
  * Two execution shapes, both scale-safe:
  *
  *  - `sessions`: the DECLARATIVE plan — Spark's native `session_window`
  *    (Catalyst SessionWindowing + MergingSessionsExec). The same plan runs
  *    in batch and, with a watermark, in Structured Streaming append mode
  *    (sessions emit when the watermark passes session end + gap). One
  *    shuffle on user_id; merging is streaming-sort based, never
  *    materializes a user's history.
  *
  *  - `sessionPathsStream`: the CUSTOM-STATE shape — `flatMapGroupsWithState`
  *    with event-time timeout, for per-session outputs the windowed agg
  *    can't express (here: the ordered event-type path). State per user is
  *    bounded by the watermark horizon: buffered events split into sessions,
  *    a session closes (emits, leaves state) as soon as the watermark
  *    guarantees no event can extend it (wm >= last_ts + gap). Equality with
  *    the batch formulation is property-tested (SessionizeStreamSpec).
  *
  * Determinism: sessions are a partition of a user's events by time gaps —
  * independent of tie order for equal timestamps; paths are tie-broken by
  * (ts, event_id), a total order.
  */
object Sessionize {

  /** One event: `ts` is the WATERMARKED event-time column (the attribute
    * must survive into the grouped Dataset or Spark rejects the event-time
    * timeout); `ts_us` is its unix-micros twin the session logic uses. */
  final case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
      ts_us: Long, event_type: String)

  /** Open (not-yet-emittable) events buffered per user. */
  final case class SessState(events: Seq[Ev])

  final case class SessionPath(user_id: Long, session_start_us: Long,
      n_events: Long, path: String)

  /** Declarative session aggregate over (user_id, ts, value) — `ts` must be
    * TimestampType. Batch and streaming (caller adds `withWatermark` for
    * streams; append mode emits a session once the watermark passes its
    * close). New session iff gap STRICTLY > `gap` — session_window's merge
    * is INCLUSIVE at the boundary (an event at exactly last_ts + gap still
    * merges; pinned by SessionizeStreamSpec's exact-boundary test). */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(
        min(unix_micros(col("ts"))).as("session_start_us"),
        max(unix_micros(col("ts"))).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")

  /** Split a user's time-ordered events into sessions at gaps STRICTLY
    * greater than gapUs (session_window's inclusive-boundary merge). */
  def split(sorted: IndexedSeq[Ev], gapUs: Long): Vector[Vector[Ev]] = {
    if (sorted.isEmpty) return Vector.empty
    val out = Vector.newBuilder[Vector[Ev]]
    var cur = Vector.newBuilder[Ev]
    var prev = Long.MinValue
    sorted.foreach { e =>
      if (prev != Long.MinValue && e.ts_us - prev > gapUs) {
        out += cur.result(); cur = Vector.newBuilder[Ev]
      }
      cur += e
      prev = e.ts_us
    }
    out += cur.result()
    out.result()
  }

  def mkPath(events: Vector[Ev]): SessionPath =
    SessionPath(events.head.user_id, events.head.ts_us, events.length.toLong,
      events.map(_.event_type).mkString(","))

  /** Custom-state streaming sessionizer: ordered event-type path per session.
    * Input must carry a watermark (EventTimeTimeout requires one). A session
    * emits exactly once, in the microbatch whose watermark first covers
    * last_ts + gap (no-data microbatches fire the timeout for quiet keys). */
  def sessionPathsStream(events: Dataset[Ev], gapUs: Long): Dataset[SessionPath] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionPath](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          // NO dedup here: the batch formulation counts duplicate event rows
          // (an at-least-once source can deliver them) and stream ≡ batch is
          // the module's contract — a .distinct would silently drop them
          val buffered = if (state.exists) state.get.events else Seq.empty
          val all = (buffered ++ it).toVector
            .sortBy(e => (e.ts_us, e.event_id))
          if (all.isEmpty) { state.remove(); Iterator.empty }
          else {
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val sessions = split(all, gapUs)
            // a session is final once no in-watermark event can extend it —
            // STRICT: an event at exactly last + gap still merges, so the
            // watermark must pass that instant
            val (closed, open) = sessions.partition(s => s.last.ts_us + gapUs < wmUs)
            if (open.isEmpty) state.remove()
            else {
              state.update(SessState(open.flatten))
              // fire when the watermark first covers the EARLIEST close point
              // among open sessions (min, not max — keying on the youngest
              // session would strand older closeable ones whenever a young
              // event keeps arriving); must be strictly past the watermark
              val nextCloseMs = open.iterator
                .map(s => (s.last.ts_us + gapUs) / 1000L + 1L).min
              state.setTimeoutTimestamp(math.max(nextCloseMs,
                state.getCurrentWatermarkMs() + 1L))
            }
            closed.iterator.map(mkPath)
          }
      }
  }

  /** Run the native session_window STREAM over a finite events frame to
    * completion (the q43 gate): events arrive in `chunks` contiguous
    * time-banded waves through a file source (a real stream arrives
    * roughly in time order; banding also guarantees nothing is dropped as
    * late under the 0-second watermark), one far-future flush event per
    * user closes every real session, and each wave runs a FRESH
    * AvailableNow query off one checkpoint — so the gate also exercises
    * chunks-1 watermark/state recoveries. Output lands in a parquet file
    * sink (exactly-once via the sink's commit log). Returns the emitted
    * sessions, flush sessions excluded. */
  def sessionsStreamToCompletion(spark: org.apache.spark.sql.SparkSession,
      events: DataFrame, workRoot: String, chunks: Int, gap: String): DataFrame = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(workRoot))
    val flushTs = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")
    val ev = events.select(col("user_id"), col("ts"), col("value"))
    val mm = ev.agg(min(unix_micros(col("ts"))).as("lo"), max(unix_micros(col("ts"))).as("hi"),
      count(lit(1)).as("n")).head()
    // empty input → min/max are NULL; fail with a clear message instead of
    // an opaque NPE from getLong (the banding/flush logic below would be
    // meaningless anyway)
    require(!mm.isNullAt(0), "sessionsStreamToCompletion: events frame is empty")
    val (tmin, tmax) = (mm.getLong(0), mm.getLong(1))
    val totalRows = mm.getLong(2)
    val span = math.max(1L, tmax - tmin + 1)
    val banded = ev.withColumn("__band",
      least(lit(chunks - 1), ((unix_micros(col("ts")) - tmin) * chunks / span).cast("int")))
    val flush = ev.select("user_id").distinct()
      .select(col("user_id"), lit(flushTs).as("ts"), lit(0.0).as("value"),
        lit(chunks - 1).as("__band"))
    val all = banded.unionByName(flush)
    val feedDir = s"$workRoot/feed"
    StreamJoin.withStreamShuffle(spark, totalRows) {
      (0 until chunks).foreach { i =>
        all.filter(col("__band") === i).drop("__band")
          .write.mode("append").parquet(feedDir)
        val stream = spark.readStream
          .schema(spark.read.parquet(feedDir).schema)
          .parquet(feedDir)
          .withWatermark("ts", "0 seconds")
        val q = sessions(stream, gap)
          .writeStream.format("parquet")
          .option("path", s"$workRoot/out")
          .option("checkpointLocation", s"$workRoot/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    spark.read.parquet(s"$workRoot/out")
      .filter(col("session_start_us") < unix_micros(lit(flushTs)))
  }
}
