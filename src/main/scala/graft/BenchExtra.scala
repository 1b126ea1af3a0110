package graft

import org.apache.spark.sql.SparkSession

/** Targeted optimization-round measurement harness (guide §1.4): times a
  * NAMED SUBSET of SparkEntry.queries under the same session settings as
  * Bench's phase C (local[32], AQE on, shuffle.partitions=32, noop sink),
  * so per-query numbers are comparable with the frozen bench without paying
  * the full 213-query sweep per iteration. Never replaces graft.Bench — the
  * driver's numbers come from there; this exists so each optimization can
  * be measured in isolation (before/after) during the round.
  *
  * Usage:
  *   runMain graft.BenchExtra q01_pricing_summary q29_change_feed ...
  *   runMain graft.BenchExtra --reps 3 q01_pricing_summary
  *   runMain graft.BenchExtra --explain plans/r06 q01_pricing_summary ...
  *     (writes <dir>/<name>.txt with .explain("formatted"))
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("BENCHEXTRA_AQE", "true")) // experiment knob only
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/tmp/graft-spark"))
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    var reps = 2
    var explainDir: Option[String] = None
    var names = Vector.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" =>
          require(i + 1 < args.length, "--reps needs a value")
          reps = args(i + 1).toInt; i += 2
        case "--explain" =>
          require(i + 1 < args.length, "--explain needs a directory")
          explainDir = Some(args(i + 1)); i += 2
        case f if f.startsWith("--") =>
          sys.error(s"unknown flag $f; usage: BenchExtra [--reps N] [--explain dir] <query names...>")
        case n => names :+= n; i += 1
      }
    }
    require(names.nonEmpty, "usage: BenchExtra [--reps N] [--explain dir] <query names...>")
    names.foreach(n => require(SparkEntry.queries.contains(n), s"unknown query: $n"))

    val spark = session(cpus)
    try {
      explainDir match {
        case Some(dir) =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
          names.foreach { n =>
            val df = SparkEntry.queries(n)(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, s"$n.txt"), txt)
            println(s"wrote $dir/$n.txt")
          }
        case None =>
          // same warmup Bench uses so the first-measured query doesn't absorb
          // session one-time costs
          try SparkEntry.queries("q23_media_meta")(spark, sfDir)
            .write.format("noop").mode("overwrite").save() catch { case _: Throwable => () }
          val out = names.map { n =>
            spark.sparkContext.setJobDescription(n)
            val samples = (1 to reps).map { _ =>
              val t0 = System.nanoTime()
              try {
                SparkEntry.queries(n)(spark, sfDir)
                  .write.format("noop").mode("overwrite").save()
                (System.nanoTime() - t0) / 1e9
              } catch { case e: Throwable =>
                System.err.println(s"[benchextra] $n failed: ${e.getMessage}"); -1.0 }
            }
            spark.sparkContext.setJobDescription(null)
            n -> samples
          }
          out.foreach { case (n, ss) =>
            println(f"EXTRA $n min=${ss.filter(_ > 0).minOption.getOrElse(-1.0)}%.3f samples=[${ss.map(v => f"$v%.3f").mkString(",")}]")
          }
          // lifecycle phases of any pipeline gates run above
          import scala.jdk.CollectionConverters._
          graft.operators.CdcQueries.phaseTimes.asScala.toSeq.sortBy(_._1).foreach {
            case (tag, m) =>
              println(s"PHASES $tag " + m.map { case (p, s) => f"$p=$s%.2f" }.mkString(" "))
          }
      }
    } finally spark.stop()
  }
}
