package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.lake.Merge.MergeStats

/** Per-epoch lineage + metrics ledger (north rule: "per-partition lineage +
  * metrics"), appended as a parquet table next to the data. NiFi provenance
  * equivalent (SURVEY.md §1.2). */
object Lineage {

  final case class Entry(
      epochId: Long,
      applied: Boolean,
      batchRows: Long,
      upserts: Long,
      deletes: Long,
      touchedBuckets: Int,
      rewrittenRows: Long)

  def append(spark: SparkSession, tableDir: String, st: MergeStats): Unit =
    appendAll(spark, tableDir, Seq(st))

  def appendAll(spark: SparkSession, tableDir: String, sts: Seq[MergeStats]): Unit = {
    import spark.implicits._
    if (sts.isEmpty) return
    sts.map(st => Entry(st.epochId, st.applied, st.batchRows, st.upserts, st.deletes,
      st.touchedBuckets, st.rewrittenRows))
      .toDS().coalesce(1).write.mode("append").parquet(s"$tableDir/_lineage")
  }

  def read(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(s"$tableDir/_lineage")
}
