package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.Drift

/** STREAMING DRIFT MONITOR — score every incoming micro-batch against a
  * persisted reference histogram, the online form of [[graft.lake.Drift]]
  * ("alert me when today's ingest stops looking like the corpus we
  * validated"). The first batch ESTABLISHES the reference (its histogram +
  * total persisted as a tiny parquet side state); every later batch reduces
  * to its own fixed-width histogram and emits one scored frame
  * (wave, bin, c_ref, c_new, drift_stat) through the same bit-deterministic
  * fixed-order statistic chain the batch operator uses.
  *
  * Per-batch cost is one histogram aggregate of the batch (constant-width
  * output) plus a constant-size read of the reference — nothing scales with
  * stream history, and the monitor state is B rows however long the stream
  * runs. Restart-safe by construction: the reference lives outside the
  * checkpoint and batch ids are exactly-once, so a replayed batch rewrites
  * the same rows. */
object DriftMonitor {

  /** Banded-wave harness: `chunks` event-time waves (EXACT integer-div
    * banding so an oracle can reproduce the wave assignment), each one
    * micro-batch run as a fresh AvailableNow query off one checkpoint —
    * wave boundaries are full stop/restarts. Wave 0 is the reference;
    * waves 1.. are scored. Returns the scored frames unioned. */
  def monitorToCompletion(spark: SparkSession, events: DataFrame,
      workRoot: String, chunks: Int, valueSql: String,
      bins: Int, width: Int): DataFrame = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(workRoot))
    val feed = events
      .select(col("event_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        expr(valueSql).as("v"))
      .filter(col("v").isNotNull)
    val mm = feed.agg(min(col("ts_us")), max(col("ts_us"))).head()
    require(!mm.isNullAt(0), "monitorToCompletion: empty input")
    val (tmin, tmax) = (mm.getLong(0), mm.getLong(1))
    val span = math.max(1L, tmax - tmin + 1)
    val banded = feed.withColumn("__wave",
      least(lit(chunks - 1),
        expr(s"cast(((ts_us - ${tmin}L) * $chunks) div ${span}L as int)")))
    val feedDir = s"$workRoot/feed"
    val refDir = s"$workRoot/ref"
    val outDir = s"$workRoot/scored"
    (0 until chunks).foreach { i =>
      banded.filter(col("__wave") === i).drop("__wave")
        .coalesce(1).write.mode("append").parquet(feedDir)
      val q = spark.readStream
        .schema(banded.drop("__wave").schema)
        .option("maxFilesPerTrigger", 1000)
        .parquet(feedDir)
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val h = Drift.histogram(batch, "v", bins, width, "c")
          val n = batch.count()
          if (batchId == 0L) {
            // reference: histogram + total, a constant-size side state
            h.withColumn("n_ref", lit(n))
              .coalesce(1).write.mode("overwrite").parquet(refDir)
          } else {
            val ref = batch.sparkSession.read.parquet(refDir)
            val nRef = ref.select(max("n_ref")).head().getLong(0)
            val joined = ref.select(col("bin"), col("c").as("c_old"))
              .join(h.select(col("bin"), col("c").as("c_new")), Seq("bin"))
            // per-batch dir + overwrite = replay-idempotent: a foreachBatch
            // replayed after a crash-before-checkpoint rewrites the SAME
            // rows instead of appending a duplicate wave
            Drift.chiSquareFromHists(joined, nRef, n, bins)
              .withColumn("wave", lit(batchId))
              .select("wave", "bin", "c_old", "c_new", "drift_stat")
              .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          }
          ()
        }
        .option("checkpointLocation", s"$workRoot/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(outDir).drop("batch")
      .withColumnRenamed("c_old", "c_ref")
  }
}
