package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Dead-letter retry: after the registry gains the missing schema version,
  * the kept originals re-decode and merge at their TRUE sequence — the
  * table converges to the clean-replay fold; a fully-consumed store goes
  * absent; retrying an empty/absent store is a no-op. */
class DeadLetterRetrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("retry converges to the clean fold; consumed store goes absent; no-op after") {
    val root = Files.createTempDirectory("graft-dlretry").toString
    val logDir = s"$root/log"
    val tableDir = s"$root/table"
    LogGen.writeLog(spark, LogGen.Params(nEvents = 400, nRepos = 10,
      pathsPerRepo = 8, v1Fraction = 0.5), logDir, epochs = 2)

    // ingest with a registry missing v2 → ~half the events dead-letter
    Replay.replayLog(spark, logDir, tableDir, buckets = 4,
      baseRegistry = Some(Cdc.registryV1Only))
    val nV2 = spark.read.parquet(logDir).filter(col("schemaVersion") === 2).count()
    assert(nV2 > 0)
    val dl = spark.read.parquet(s"$tableDir/_deadletter")
    assert(dl.count() == nV2)
    assert(dl.columns.contains("schemaId") && dl.columns.contains("schemaVersion"),
      "the store must be self-contained (schema refs ride along)")

    // fix the registry, retry: everything consumed, store goes ABSENT
    val reg = spark.sparkContext.broadcast(Cdc.registry)
    val st = Replay.retryDeadLetters(spark, tableDir, reg, "retry-1")
    assert(st.applied && st.attempted == nV2 && st.merged == nV2 && st.remaining == 0)
    assert(!Files.isDirectory(java.nio.file.Paths.get(s"$tableDir/_deadletter")))

    // the final state equals the fold of the FULL clean log (retried rows
    // merged at their original seq — late retry, correct ordering)
    val got = graft.lake.IceLite.read(spark, graft.lake.IceLite.load(tableDir))
      .select("repo", "path", "commit", "lang", "content")
    val want = Replay.oracleFold(spark, logDir)
      .select("repo", "path", "commit", "lang", "content")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // retry with no store: a clean no-op
    val none = Replay.retryDeadLetters(spark, tableDir, reg, "retry-2")
    assert(!none.applied && none.attempted == 0)
  }
}
