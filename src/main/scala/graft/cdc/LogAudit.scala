package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transport-integrity audit of a change log BEFORE it is replayed — the
  * check a CDC operator runs when a tail looks suspicious (a broker lost a
  * segment, a producer retried without idempotence). Within one source
  * partition, offsets are a dense monotone sequence (the reference's NiFi
  * flow-file queue gives the same per-connection ordering guarantee,
  * ProtobufProcessorTest.java fixtures assume it); across partitions there
  * is no order. Two defect classes are surfaced, each as a keyed range row
  * so a 10^10-event audit emits O(defects), never O(events):
  *
  *   - `gap`  — a missing offset range [off_start, off_end] (lost events;
  *              replaying through a gap silently drops mutations, so the
  *              operator must re-pull the range before replay);
  *   - `dup`  — an offset delivered more than once (producer retry; the
  *              MERGE's newest-seq-wins fold makes replay idempotent to
  *              these, but the audit names them so lineage counts reconcile).
  *
  * Scale shape: ONE shuffle by source partition for the gap window (each
  * window partition is a single log partition's offsets — bounded by the
  * per-partition log depth, and only (partition, offset) longs travel, no
  * payloads); the dup check is a partial-aggregated groupBy on the same two
  * long columns. Both prune to a two-column scan of the log's parquet
  * (payload bytes are never read).
  */
object LogAudit {

  /** Audit rows: (partition, kind, off_start, off_end, n) where `n` is the
    * missing-event count for gaps and the delivery count for dups. */
  def auditOffsets(log: DataFrame): DataFrame = {
    val l = log.select(col("partition"), col("offset").cast("long").as("offset"))
    val w = Window.partitionBy("partition").orderBy("offset")
    // gaps over the DISTINCT offset sequence (a duplicated offset is not a
    // hole; it is reported separately below)
    val gaps = l.distinct()
      .withColumn("nxt", lead(col("offset"), 1).over(w))
      .filter(col("nxt") > col("offset") + 1)
      .select(col("partition"), lit("gap").as("kind"),
        (col("offset") + 1).as("off_start"), (col("nxt") - 1).as("off_end"),
        (col("nxt") - col("offset") - 1).as("n"))
    val dups = l.groupBy("partition", "offset").count()
      .filter(col("count") > 1)
      .select(col("partition"), lit("dup").as("kind"),
        col("offset").as("off_start"), col("offset").as("off_end"),
        col("count").as("n"))
    gaps.unionByName(dups)
  }

  /** Convenience summary for lineage reconciliation: per partition, the
    * observed [min, max] offset span, event count, and how many events the
    * span implies are missing (spanned - distinct). */
  def partitionSummary(log: DataFrame): DataFrame =
    log.select(col("partition"), col("offset").cast("long").as("offset"))
      .groupBy("partition")
      .agg(min("offset").as("off_min"), max("offset").as("off_max"),
        count(lit(1)).as("n_events"),
        countDistinct("offset").as("n_distinct"))
      .withColumn("n_missing",
        col("off_max") - col("off_min") + 1 - col("n_distinct"))
}
