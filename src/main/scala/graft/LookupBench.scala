package graft

import org.apache.spark.sql.SparkSession
import graft.cdc.{LogGen, Replay}
import graft.lake.IceLite

/** Micro-benchmark for the host-side point-lookup serving path
  * (IceLite.lookupLocal): replays a seeded log once, then measures a WARM
  * loop of lookups (the steady-state number a serving process sees) next
  * to the Spark-job path. Run:
  *   sbt "runMain graft.LookupBench [nEvents] [nKeys] [rounds]"
  */
object LookupBench {
  def main(args: Array[String]): Unit = {
    val nEvents = args.lift(0).map(_.toLong).getOrElse(20000L)
    val nKeys = args.lift(1).map(_.toInt).getOrElse(50)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = s"${System.getProperty("java.io.tmpdir")}/graft-lookupbench"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    LogGen.writeLog(spark, LogGen.Params(nEvents = nEvents, nRepos = 50,
      pathsPerRepo = 40, v1Fraction = 0.7), s"$root/log", epochs = 2)
    Replay.replayLog(spark, s"$root/log", s"$root/table", buckets = 64)
    val snap = IceLite.load(s"$root/table")
    val keys = IceLite.read(spark, snap).select("repo", "path")
      .orderBy("repo", "path").limit(nKeys).as[(String, String)].collect()
    println(s"[lookupbench] table: $nEvents events, 64 buckets, " +
      s"${snap.files.size} files; probing ${keys.length} keys x $rounds rounds")

    def msStats(xs: Seq[Double]): String = {
      val s = xs.sorted
      f"min=${s.head}%.1f med=${s(s.length / 2)}%.1f p90=${s((s.length * 9) / 10)}%.1f max=${s.last}%.1f ms"
    }
    (1 to rounds).foreach { r =>
      val local = keys.map { case (rp, p) =>
        val t0 = System.nanoTime()
        val got = IceLite.lookupLocal(snap, Map("repo" -> rp, "path" -> p))
        require(got.isDefined)
        (System.nanoTime() - t0) / 1e6
      }
      println(s"[lookupbench] round $r lookupLocal: ${msStats(local.toIndexedSeq)}")
    }
    // the Spark path, one warm round for contrast
    val viaSpark = keys.take(20).map { case (rp, p) =>
      val t0 = System.nanoTime()
      val n = IceLite.lookup(spark, snap, Map("repo" -> rp, "path" -> p)).collect().length
      require(n == 1)
      (System.nanoTime() - t0) / 1e6
    }
    println(s"[lookupbench] Spark lookup (20 keys): ${msStats(viaSpark.toIndexedSeq)}")
    spark.stop()
  }
}
