package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import Tables.ld

/** Time-series primitives over the events table — the resample/align layer
  * a feature pipeline needs before models can consume irregular event logs.
  *
  * q128 GAP FILL: regularize each user's irregular events onto an hourly
  * grid (observation = last event in the hour, deterministic by event_id)
  * and forward-fill the gaps with a running `last(ignoreNulls)` window.
  * The filled value is CARRIED, never arithmetic — the raw double bits
  * flow through untouched, so the cross-engine hash compare is exact.
  * Scale shape: the grid explode is one narrow generator per user (bounded
  * by the user's own time span, never the global span), the fill is one
  * shuffle on user_id; no self-joins, no global sort until the final
  * presentation ORDER BY.
  *
  * q129 ROLLING RANGE WINDOW: per-event trailing-1h count/sum with a RANGE
  * frame over event-time micros — the frame rule (ALL peers of an equal
  * order key join the frame) is identical in Spark and DuckDB, and the sum
  * runs in DECIMAL(18,6) (the q01 pattern) so the result is exact and
  * engine-independent, cast to double only at the edge.
  */
object TimeSeriesOps {

  /** DISTRIBUTED SWEEP LINE — running concurrency over (t, delta) interval
    * endpoints WITHOUT a global sort: equal endpoints collapse first
    * (groupBy (t, delta) — this also makes the running value at ties
    * well-defined), points band by value range (driver-side min/max, the
    * StreamJoin banding rule), each band's running sum runs under a
    * band-partitioned window (ONE shuffle on band), and the O(bands)
    * per-band totals prefix on the driver into additive band offsets —
    * the q94 packSequences prefix-sum shape. At 100 TB the alternative
    * (a single `ORDER BY t` window over every endpoint) serializes the
    * whole sweep through one task; this stays parallel at any row count.
    * Ties order (t asc, delta asc): a -1 endpoint applies before a +1 at
    * the same instant, so back-to-back intervals never double-count.
    * Input: (t: long, delta: long); output: (t, delta, conc) per distinct
    * endpoint group, conc = concurrency after applying the group. */
  def sweepConcurrency(points: org.apache.spark.sql.DataFrame,
      bands: Int = 32): org.apache.spark.sql.DataFrame = {
    val mm = points.agg(min(col("t")).as("lo"), max(col("t")).as("hi")).head()
    require(!mm.isNullAt(0), "sweepConcurrency: no points")
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = math.max(1L, hi - lo + 1)
    val g = points.groupBy("t", "delta")
      .agg(sum(col("delta")).as("d"))
      .withColumn("band",
        least(lit(bands - 1), ((col("t") - lit(lo)) * bands / span).cast("int")))
    val w = Window.partitionBy("band").orderBy("t", "delta")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = g.withColumn("run", sum(col("d")).over(w))
    // O(bands) rows to the driver — never corpus-bound
    val totals = run.groupBy("band").agg(sum(col("d")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until bands).map { b =>
        val off = b -> acc; acc += totals.getOrElse(b, 0L); off
      }.toMap
    }
    run.select(col("t"), col("delta"),
      (col("run") + coalesce(element_at(typedLit(offsets), col("band")), lit(0L)))
        .as("conc"))
  }

  val queries: Seq[OpQuery] = Seq(

    OpQuery("q128_gap_fill",
      (s, d) => {
        val ev = ld(s, d, "events").select(col("user_id"),
          date_trunc("hour", col("ts")).as("h"), col("event_id"), col("value"))
        val hourly = ev.groupBy("user_id", "h")
          .agg(max_by(col("value"), col("event_id")).as("v"))
        val grid = ev.groupBy("user_id")
          .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
        val fill = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("user_id", "h"), "left")
          .select(col("user_id"), col("h"),
            last(col("v"), ignoreNulls = true).over(fill).as("value"),
            col("v").isNotNull.as("observed"))
          .orderBy("user_id", "h")
      },
      Some("""WITH ev AS (
          SELECT user_id, date_trunc('hour', ts) AS h, event_id, value FROM events),
        hourly AS (SELECT user_id, h, arg_max(value, event_id) AS v
                   FROM ev GROUP BY 1, 2),
        grid AS (SELECT user_id,
                   unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
                 FROM ev GROUP BY user_id),
        j AS (SELECT g.user_id, g.h, hourly.v
              FROM grid g LEFT JOIN hourly USING (user_id, h))
        SELECT user_id, h,
          last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
            ROWS UNBOUNDED PRECEDING) AS value,
          v IS NOT NULL AS observed
        FROM j ORDER BY user_id, h""")),

    OpQuery("q129_rolling_range",
      (s, d) => {
        val us = unix_micros(col("ts").cast("timestamp"))
        val w = Window.partitionBy("user_id").orderBy("us")
          .rangeBetween(-3600000000L, 0L)
        ld(s, d, "events")
          .select(col("event_id"), col("user_id"), us.as("us"),
            col("value").cast(DecimalType(18, 6)).as("dv"))
          .select(col("event_id"), col("user_id"), col("us"),
            count(col("dv")).over(w).as("n_1h"),
            sum(col("dv")).over(w).cast("double").as("sum_1h"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) AS us,
          count(CAST(value AS DECIMAL(18,6))) OVER w AS n_1h,
          CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY event_id"""))
  ,

    OpQuery("q141_debounce",
      // EVENT DEBOUNCE: collapse bursts — consecutive events of the same
      // (user, type) less than 6 h apart chain into ONE burst (the q33
      // session rule per type; 6 h suppresses ~10% on this corpus); only the burst's FIRST event survives,
      // with the suppressed count kept for audit. The burst id is a
      // running sum of new-burst flags on the tie-free (ts, event_id)
      // order — one window pass per key, no self-joins. The raw-lag
      // variant (compare to previous raw event) would RE-ARM mid-burst;
      // chaining is what "debounce" means and what the oracle mirrors.
      (s, d) => {
        val key = Seq(col("user_id"), col("event_type"))
        val ord = Window.partitionBy(key: _*).orderBy("ts", "event_id")
        val ev = ld(s, d, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts"), unix_micros(col("ts").cast("timestamp")).as("us"))
          .withColumn("new_burst",
            when(col("us") - lag("us", 1).over(ord) <= 21600000000L, 0L).otherwise(1L))
          .withColumn("burst", sum("new_burst").over(
            ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        ev.groupBy("user_id", "event_type", "burst")
          .agg(min(struct(col("us"), col("event_id"))).as("first"),
            count(lit(1)).as("n_events"))
          .select(col("first.event_id").as("event_id"), col("user_id"),
            col("event_type"), col("first.us").as("us"),
            (col("n_events") - 1).as("n_suppressed"))
          .orderBy("event_id")
          .transform { out =>
            require(out.filter(col("n_suppressed") > 0).limit(1).count() > 0,
              "gate is vacuous: nothing debounced at this gap")
            out
          }
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
            CASE WHEN us - lag(us) OVER w <= 21600000000 THEN 0 ELSE 1 END AS new_burst
          FROM events WINDOW w AS (PARTITION BY user_id, event_type
            ORDER BY ts, event_id)),
        b AS (SELECT *, sum(new_burst) OVER (PARTITION BY user_id, event_type
            ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS burst FROM ev),
        sel AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type, burst
            ORDER BY us, event_id) AS rn,
          count(*) OVER (PARTITION BY user_id, event_type, burst) AS n_events FROM b)
        SELECT event_id, user_id, event_type, CAST(us AS BIGINT) AS us,
          CAST(n_events - 1 AS BIGINT) AS n_suppressed
        FROM sel WHERE rn = 1 ORDER BY event_id"""))
  )
}
