package graft.cdc

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
import graft.decode.{ChangeEvent, Decode, Framing, SparkSchema}
import graft.lake.{IceLite, Merge}
import graft.registry.{DescriptorRegistry, SchemaKey}

/** Batch replay of a change log into an IceLite table — epoch loop of
  * decode → MERGE (SURVEY.md §3.4). Also the shared per-epoch apply used by
  * the streaming tail's foreachBatch. */
object Replay {

  /** Table columns = RepoChange data fields (seq/op are CDC plumbing). */
  val dataColNames = Seq("repo", "path", "commit", "lang", "content", "author")

  /** Initialize the target table from the v1 descriptor-derived schema
    * (columns carry proto field numbers as field IDs). */
  def createTable(dir: String, buckets: Int): IceLite.Snapshot = {
    val fs = Cdc.fsV1
    val desc = fs.findMessage(Cdc.MessageType).get
    val struct = SparkSchema.structFor(fs, desc)
    val cols = IceLite.colDefsOf(struct).filter(c => Seq("repo", "path", "commit", "lang", "content").contains(c.name))
    IceLite.create(dir, IceLite.withCdcCols(cols), Vector("repo", "path"), buckets)
  }

  /** Decode one epoch's events and shape them for the MERGE: data columns
    * (with field-ID metadata) + seq + op.
    *
    * Dead letters cost ZERO extra decode passes in the happy path: an
    * Observation on the decode output counts non-success rows during the
    * merge's own action; only when that count is > 0 does the returned
    * callback re-run decode to persist the dead letters. */
  def decodeForMerge(
      events: Dataset[ChangeEvent],
      registry: Broadcast[DescriptorRegistry],
      deadLetterDir: Option[String],
      framing: Framing.Value = Framing.Raw): (DataFrame, () => Long) = {

    val defaultKey = SchemaKey(Cdc.SchemaId, -1) // latest version in registry
    val decoded0 = Decode.decode(events, registry, defaultKey, Cdc.MessageType, framing)

    val obs = org.apache.spark.sql.Observation()
    val decoded = decoded0.observe(obs,
      sum(when(col("route") =!= "success", 1L).otherwise(0L)).as("bad"))

    val flushDeadLetters: () => Long = () => {
      val bad = Option(obs.get("bad")).collect { case l: Long => l }.getOrElse(0L)
      if (bad > 0L) deadLetterDir.foreach { dld =>
        Decode.deadLetter(Decode.decode(events, registry, defaultKey, Cdc.MessageType, framing))
          .write.mode("append").parquet(dld)
      }
      bad
    }

    val ok = Decode.success(decoded)
    // select("msg.*") drops struct-field metadata, so re-attach the proto
    // field numbers as graft.fieldId — the IceLite evolution identity
    val latest = registry.value.resolveKey(defaultKey)
    val fieldIds = registry.value.descriptor(latest, Cdc.MessageType).get._2
      .fields.map(f => f.name -> f.number).toMap
    val avail = ok.columns.toSet
    val cols = dataColNames.filter(avail.contains).map { c =>
      col(c).as(c, new org.apache.spark.sql.types.MetadataBuilder()
        .putLong(SparkSchema.FieldIdKey, fieldIds(c).toLong).build())
    } ++ Seq(col("seq"), col("op"))
    (ok.select(cols: _*), flushDeadLetters)
  }

  final case class ReplayResult(epochs: Int, stats: Seq[Merge.MergeStats])

  /** Replay a parquet change log (written by LogGen.writeLog, partitioned by
    * `epoch`) into the table. Resumable: epochs already in the snapshot are
    * fenced no-ops, so re-running from 0 is idempotent. */
  def replayLog(
      spark: SparkSession,
      logDir: String,
      tableDir: String,
      buckets: Int = 32,
      framing: Framing.Value = Framing.Raw,
      /** keys-only pre-pass for touched-bucket pruning; turn off for large
        * batches that touch every bucket anyway (saves one payload scan). */
      pruneBuckets: Boolean = true): ReplayResult = {
    import spark.implicits._

    if (!IceLite.exists(tableDir)) createTable(tableDir, buckets)
    val registry = spark.sparkContext.broadcast(Cdc.registry)

    // epoch list from the partition directories — no Spark job
    val epochs = java.nio.file.Files.list(java.nio.file.Paths.get(logDir))
      .iterator().asScala.map(_.getFileName.toString)
      .collect { case s if s.startsWith("epoch=") => s.stripPrefix("epoch=").toLong }
      .toVector.sorted

    // ONE relation (file listing + schema) reused across epochs — a fresh
    // spark.read.parquet per epoch costs a serial driver job each time
    val log = spark.read.parquet(logDir)
    val stats = epochs.map { e =>
      val ev = log
        .filter(col("epoch") === e) // partition-dir prune
        .select("payload", "schemaId", "schemaVersion", "messageType", "partition", "offset")
        .as[ChangeEvent]
      val (updates, flushDL) = decodeForMerge(ev, registry, Some(s"$tableDir/_deadletter"), framing)
      val keys = if (pruneBuckets)
        Some(Decode.decodeKeys(ev, registry, SchemaKey(Cdc.SchemaId, -1), Cdc.MessageType,
          Seq("repo", "path"), framing))
      else None
      val st = Merge.mergeEpoch(spark, tableDir, updates, "seq", "op", e, keys)
      if (st.applied) flushDL()
      st
    }
    Lineage.appendAll(spark, tableDir, stats) // one ledger write per replay
    ReplayResult(epochs.length, stats.toSeq)
  }

  /** The oracle fold (FIXTURES.md §C): expected final state computed directly
    * from the decoded log with plain Spark ops — last-writer-wins by seq,
    * DELETE removes the key. */
  def oracleFold(spark: SparkSession, logDir: String,
      framing: Framing.Value = Framing.Raw): DataFrame = {
    import spark.implicits._
    val registry = spark.sparkContext.broadcast(Cdc.registry)
    val ev = spark.read.parquet(logDir)
      .select("payload", "schemaId", "schemaVersion", "messageType", "partition", "offset")
      .as[ChangeEvent]
    val (upd, _) = decodeForMerge(ev, registry, None, framing)
    val cols = upd.columns
    upd.groupBy(col("repo"), col("path"))
      .agg(max_by(struct(cols.map(col): _*), col("seq")).as("__r"))
      .select(cols.filterNot(Seq("repo", "path").contains).map(c => col(s"__r.$c").as(c)) ++
        Seq(col("repo"), col("path")): _*)
      .filter(col("op") =!= "DELETE")
      .drop("op", "seq")
  }
}
