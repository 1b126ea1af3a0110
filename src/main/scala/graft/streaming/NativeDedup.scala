package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AT-LEAST-ONCE DELIVERY DEDUP with Spark's native
  * `dropDuplicatesWithinWatermark` — the transport-level twin of the
  * engine's fenced-batch idempotency (LogWriter suppresses duplicate
  * BATCHES; this suppresses duplicate EVENTS when the transport can
  * re-deliver individual records). State is keyed by the id column and
  * evicted once the watermark passes the first-seen event time plus the
  * watermark delay — O(events inside the delay horizon), not O(stream),
  * which is what makes record-level dedup affordable on an unbounded
  * 10^10-event feed where an exact `distinct` is impossible.
  *
  * [[dedupStreamToCompletion]] is the batch≡stream harness (the q40/q43
  * protocol) with one twist: ARRIVAL is decoupled from EVENT TIME. The
  * caller pre-assigns each row an arrival wave in `__band` — a
  * re-delivered copy keeps the original's event time but arrives a wave
  * LATER, exactly how at-least-once transports misbehave. Each wave is
  * ONE microbatch (single file + high maxFilesPerTrigger: duplicates
  * split across arbitrarily-ordered microbatches inside a wave could
  * race the watermark) run as a fresh AvailableNow query off one
  * checkpoint, so every wave boundary is a full stop/restart and a
  * cross-wave duplicate is only dropped if the dedup STATE survived
  * recovery. The delay must cover the feed's whole event-time span so no
  * copy is ever outside the watermark; the result must then equal the
  * exact batch distinct. */
object NativeDedup {

  def dedupStreamToCompletion(spark: SparkSession, feed: DataFrame,
      workRoot: String, chunks: Int, idCol: String, tsCol: String,
      delay: String): DataFrame = {
    require(feed.columns.contains("__band"), "feed needs an arrival __band column")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(workRoot))
    val feedDir = s"$workRoot/feed"
    val schema = feed.drop("__band").schema
    StreamJoin.withStreamShuffle(spark, feed.count()) {
      (0 until chunks).foreach { i =>
        feed.filter(col("__band") === i).drop("__band")
          .coalesce(1) // one file per wave -> one microbatch per wave
          .write.mode("append").parquet(feedDir)
        // the watermark DELAY is the dedup horizon: state for an id lives
        // until the watermark passes its event time + delay
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1000)
          .parquet(feedDir)
          .withWatermark(tsCol, delay)
          .dropDuplicatesWithinWatermark(idCol)
        val q = src.writeStream.format("parquet")
          .option("path", s"$workRoot/out")
          .option("checkpointLocation", s"$workRoot/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    spark.read.parquet(s"$workRoot/out")
  }
}
