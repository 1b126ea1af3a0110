package graft.cdc

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.decode.ChangeEvent
import graft.lake.{IceLite, Merge}

/** Structured-Streaming change-log tail → IceLite upsert
  * (north_star: "change-event tail ... foreachBatch ... MERGE INTO").
  *
  * Exactly-once: Spark checkpoints source offsets per micro-batch; the sink
  * fences on epochId = batchId inside the IceLite commit, so a replayed
  * batch after crash/restart is a provable no-op (SURVEY.md §2.3).
  */
object Tail {

  def start(
      spark: SparkSession,
      streamDir: String,
      tableDir: String,
      checkpointDir: String,
      buckets: Int = 32,
      maxFilesPerTrigger: Int = 4): StreamingQuery = {
    import spark.implicits._

    if (!IceLite.exists(tableDir)) Replay.createTable(tableDir, buckets)
    val registry = spark.sparkContext.broadcast(Cdc.registry)

    val eventSchema = implicitly[org.apache.spark.sql.Encoder[ChangeEvent]].schema
    val stream = spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(streamDir)
      .as[ChangeEvent]

    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[ChangeEvent], batchId: Long) =>
        val (updates, flushDL) = Replay.decodeForMerge(batch, registry, Some(s"$tableDir/_deadletter"))
        val keys = Some(graft.decode.Decode.decodeKeys(batch, registry,
          graft.registry.SchemaKey(Cdc.SchemaId, -1), Cdc.MessageType, Seq("repo", "path")))
        val st = Merge.mergeEpoch(batch.sparkSession, tableDir, updates, "seq", "op", batchId, keys)
        if (st.applied) flushDL()
        Lineage.append(batch.sparkSession, tableDir, st)
        ()
      }
      .start()
  }
}
