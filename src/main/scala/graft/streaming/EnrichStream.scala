package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, Dataset, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.operators.JoinOps

/** Streaming TEMPORAL ENRICHMENT: a fact stream is AS-OF joined, per
  * microbatch, against a static versioned dimension (each fact picks up
  * the dimension row as of its own event time) and appended idempotently.
  *
  * The CDC-consumer shape this serves: the Tail ingests a change log into
  * a dimension table; downstream, a high-rate fact stream (clicks,
  * telemetry) must see the dimension AS OF each fact's timestamp — not
  * "latest wins", which backfills/replays would silently corrupt.
  *
  * Mechanics: Structured Streaming can't run window functions, so the
  * as-of resolution happens inside foreachBatch on the microbatch
  * DataFrame ([[JoinOps.asofJoin]] — one shuffle on the join key).
  * Exactly-once: each batch writes to its OWN deterministic subdir
  * (`b=<batchId>`, mode overwrite), so a post-crash foreachBatch replay
  * overwrites rather than duplicates — the same fencing idea the IceLite
  * sink and DedupStream use. The checkpoint carries source offsets; a
  * restarted wave resumes where the last one stopped.
  *
  * Scale: per microbatch the cost is one as-of shuffle of
  * O(batch + dim-slice). For a large dimension, pass a pre-filtered dim
  * (e.g. versions overlapping the stream's watermark window, or the
  * IceLite snapshot's change feed since the fact stream's minimum time) —
  * the operator takes whatever DataFrame it is given, so the pruning
  * composes with snapshot time travel upstream. */
object EnrichStream {

  /** Drain everything currently in `streamDir` (Trigger.AvailableNow),
    * enriching each microbatch against `dim`; resumes from `ckpt`. */
  def runWave(spark: SparkSession, streamDir: String, schema: StructType,
      dim: DataFrame, outDir: String, ckpt: String,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      tiebreak: String, rightVals: Seq[String],
      maxFilesPerTrigger: Int = 2): Unit = {
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(streamDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        JoinOps.asofJoin(batch.toDF(), dim,
            leftKey, rightKey, leftTs, rightTs, tiebreak, rightVals)
          .write.mode("overwrite").parquet(s"$outDir/b=$batchId")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
