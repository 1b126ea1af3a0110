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
  )
}
