package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import graft.cdc.{LogGen, Replay}

/** Per-round benchmark (driver contract): ONE JSON line on stdout.
  *
  * Headline metric (BASELINE.md): end-to-end change-events/sec for the
  * protobuf-decode → IceLite-upsert replay, evidenced at TWO parallelism
  * levels (local[8] vs local[32]) on the identical input — the sandbox
  * substitute for N vs 4N executors — plus scaling efficiency
  * (T8/T32)/4, target ≥ 0.8. Also times the operator queries on
  * SPARK_GRAFT_SF_DIR at local[32].
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "3000000").toLong
    val epochs = sys.env.getOrElse("SPARK_GRAFT_BENCH_EPOCHS", "3").toInt
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-bench-$nEvents"
    val logDir = s"$root/log"

    // ---------- phase A (untimed): deterministic log, reused if present
    run(32) { spark =>
      val ok = try spark.read.parquet(logDir).count() == nEvents catch { case _: Exception => false }
      if (!ok) {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(logDir))
        LogGen.writeLog(spark, LogGen.Params(nEvents = nEvents), logDir, epochs)
      }
    }

    // ---------- phase B: replay at two parallelism levels, same input
    def replayAt(cpus: Int): Double = run(cpus) { spark =>
      val tableDir = s"$root/table-$cpus"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      val t0 = System.nanoTime()
      Replay.replayLog(spark, logDir, tableDir, buckets = 64)
      (System.nanoTime() - t0) / 1e9
    }
    val t8 = replayAt(8)
    val t32 = replayAt(32)
    val eps8 = nEvents / t8
    val eps32 = nEvents / t32
    val efficiency = (t8 / t32) / 4.0

    // ---------- phase C: operator queries on the sf dir at local[32]
    val skip = Set("q00_cdc_replay") // CDC is phase B, measured properly above
    val queryTimes = run(32) { spark =>
      SparkEntry.queries.toSeq.sortBy(_._1).collect { case (name, fn) if !skip(name) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case _: Throwable => false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    }

    val total = t8 + t32 + queryTimes.map(_._2).filter(_ > 0).sum
    val qs = queryTimes.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"end-to-end change-events/sec, protobuf-decode to IceLite-upsert replay","value":${f"$eps32%.0f"},"unit":"events/sec","total_sec":${f"$total%.1f"},""" +
      s""""cdc":{"events":$nEvents,"epochs":$epochs,"sec_local8":${f"$t8%.1f"},"sec_local32":${f"$t32%.1f"},"events_per_sec_local8":${f"$eps8%.0f"},"events_per_sec_local32":${f"$eps32%.0f"},"scaling_efficiency_8_to_32":${f"$efficiency%.3f"}},""" +
      s""""queries":$qs,"sf":"$sfDir"}"""
    println(json)

    // BENCH.md: the scaling-evidence protocol report (BASELINE.md)
    Files.writeString(Paths.get("BENCH.md"),
      s"""# BENCH — measured (this round)
         |
         |Protocol per BASELINE.md: identical job + input at two parallelism
         |levels (`local[8]` vs `local[32]`, shuffle.partitions = cores).
         |
         || metric | local[8] | local[32] |
         ||---|---|---|
         || replay wall time (s) | ${f"$t8%.1f"} | ${f"$t32%.1f"} |
         || events/sec | ${f"$eps8%.0f"} | ${f"$eps32%.0f"} |
         |
         |Input: ${nEvents} protobuf change events (seed 42, Zipf repos), $epochs epochs,
         |decode -> version-ordered MERGE -> IceLite commit per epoch, buckets=64.
         |
         |**Scaling efficiency (T8/T32)/4 = ${f"$efficiency%.3f"}** (target >= 0.8).
         |
         |Per-query seconds at local[32] on $sfDir are in the bench JSON line.
         |""".stripMargin)
  }

  /** Run a block in a fresh session at the given parallelism, then stop it. */
  private def run[T](cpus: Int)(body: SparkSession => T): T = {
    val spark = session(cpus)
    try body(spark) finally spark.stop()
  }
}
