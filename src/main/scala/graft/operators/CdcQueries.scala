package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.{Cdc, LogGen, Replay}
import graft.lake.IceLite

/** The engine's own CDC operators surfaced through the driver gate.
  * q00 has no SQL oracle (it runs on its own generated protobuf log, not on
  * the shared parquet tables) — the driver records a rows-only check; its
  * real correctness gate is PipelineSpec's oracle-fold + sha256 equality. */
object CdcQueries {

  /** Deterministic tmp table path per (tag, sf dir) — reruns overwrite. */
  private def workDir(tag: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-$tag"

  def replayFinalState(spark: SparkSession, nEvents: Long, tag: String): DataFrame = {
    val root = workDir(tag)
    val logDir = s"$root/log"
    val tableDir = s"$root/table"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    LogGen.writeLog(spark, LogGen.Params(nEvents = nEvents, nRepos = 50,
      pathsPerRepo = 40, v1Fraction = 0.7), logDir, epochs = 2)
    Replay.replayLog(spark, logDir, tableDir, buckets = 8)
    IceLite.read(spark, IceLite.load(tableDir))
      .select(col("repo"), col("path"), col("commit"), col("lang"),
        sha2(col("content"), 256).as("content_sha"), col("author"))
      .orderBy("repo", "path")
  }

  val queries: Seq[OpQuery] = Seq(
    OpQuery("q00_cdc_replay",
      (s, _) => replayFinalState(s, nEvents = 5000, tag = "q00"),
      None)
  )
}
