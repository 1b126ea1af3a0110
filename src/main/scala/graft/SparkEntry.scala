package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB oracle over the same parquet tables
  * (column names aligned on both sides; the driver sorts columns by name
  * and hash-compares values). */
object SparkEntry {

  private val allOps: Seq[OpQuery] =
    Relational.queries ++ DedupOps.queries ++ TextOps.queries ++
      SimilarityOps.queries ++ Multimodal.queries ++ SkewOps.queries ++
      SamplingOps.queries ++ SessionOps.queries ++ CurationOps.queries ++
      JoinOps.queries ++ SketchOps.queries ++ PiiOps.queries ++
      GraphOps.queries ++ TextIndex.queries ++ TimeSeriesOps.queries ++
      AnalyticsOps.queries ++ Sources.queries ++ SemDedup.queries ++
      PcaOps.queries ++ CdcQueries.queries

  /** Flagship: the CDC pipeline end-to-end at tiny scale — generate a seeded
    * protobuf change log, replay it through decode → MERGE into an IceLite
    * table, return the final state. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.replayFinalState(spark, nEvents = 5000, tag = "entry")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    allOps.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
