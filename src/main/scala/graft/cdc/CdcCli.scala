package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.lake.IceLite

/** Operational surface for the CDC engine:
  *
  *   runMain graft.cdc.CdcCli gen-log <dir> <nEvents> <epochs> [v1Fraction]
  *   runMain graft.cdc.CdcCli replay  <logDir> <tableDir> [buckets]
  *   runMain graft.cdc.CdcCli tail    <streamDir> <tableDir> <ckptDir> [buckets]
  *   runMain graft.cdc.CdcCli show    <tableDir> [n]
  *   runMain graft.cdc.CdcCli verify  <logDir> <tableDir>   — replay-equality check
  */
object CdcCli {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cdc")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  private def run(spark: SparkSession, args: Array[String]): Unit = args.toList match {
    case "gen-log" :: dir :: n :: epochs :: rest =>
      val v1f = rest.headOption.map(_.toDouble).getOrElse(1.0)
      LogGen.writeLog(spark, LogGen.Params(nEvents = n.toLong, v1Fraction = v1f), dir, epochs.toInt)
      println(s"wrote $n events in $epochs epochs to $dir")
    case "replay" :: logDir :: tableDir :: rest =>
      val buckets = rest.headOption.map(_.toInt).getOrElse(32)
      val t0 = System.nanoTime()
      val r = Replay.replayLog(spark, logDir, tableDir, buckets)
      val sec = (System.nanoTime() - t0) / 1e9
      val applied = r.stats.count(_.applied)
      val rows = r.stats.map(_.batchRows).sum
      println(f"replayed ${r.epochs} epochs ($applied applied, ${r.epochs - applied} fenced), $rows change rows in $sec%.1f s (${rows / sec}%.0f events/s)")
    case "tail" :: streamDir :: tableDir :: ckpt :: rest =>
      val buckets = rest.headOption.map(_.toInt).getOrElse(32)
      val q = Tail.start(spark, streamDir, tableDir, ckpt, buckets)
      q.awaitTermination()
      println(s"tail drained into $tableDir")
    case "show" :: tableDir :: rest =>
      val n = rest.headOption.map(_.toInt).getOrElse(10)
      val snap = IceLite.load(tableDir)
      println(s"table $tableDir v${snap.version}, epochs=${snap.epochs.size}, files=${snap.files.size}, schema=${snap.currentSchema.map(c => s"${c.name}#${c.id}").mkString(",")}")
      val df = IceLite.read(spark, snap)
      println(s"rows=${df.count()}")
      df.orderBy("repo", "path").show(n, truncate = 40)
    case "verify" :: logDir :: tableDir :: Nil =>
      val got = IceLite.read(spark, IceLite.load(tableDir))
        .select(col("repo"), col("path"), sha2(col("content"), 256).as("h"))
      val want = Replay.oracleFold(spark, logDir)
        .select(col("repo"), col("path"), sha2(col("content"), 256).as("h"))
      val extra = got.exceptAll(want).count()
      val missing = want.exceptAll(got).count()
      println(s"replay-equality: table=${got.count()} oracle=${want.count()} extra=$extra missing=$missing " +
        (if (extra == 0 && missing == 0) "OK (sha256 per (repo,path) equal)" else "MISMATCH"))
      if (extra != 0 || missing != 0) sys.exit(1)
    case other =>
      System.err.println(s"unknown command: ${other.mkString(" ")}")
      sys.exit(2)
  }
}
