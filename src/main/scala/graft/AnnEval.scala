package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** ANN evidence tool: recall / candidate-fraction / wall numbers for the
  * approximate paths (q36 IVF nprobe sweep, q20 banded tier) against their
  * exact baselines — the measurements Bench embeds in ann_recall. Run:
  *   sbt "runMain graft.AnnEval /root/testdata/sf0.1 [nQueries]"
  */
object AnnEval {

  def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  def abPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nq = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = graft.operators.Tables.ld(spark, sfDir, "embeddings")
    val exact = pairsOf(SimilarityOps.bruteForceTopK(spark, sfDir, nq))

    // ---- q36 IVF: sweep cell count × nprobe (recall vs candidate-fraction
    // operating points; finer cells buy recall at equal fraction)
    val queries = e.filter(col("vec_id") < nq)
    Seq(64, 128, 256).foreach { cells =>
      val root = s"${System.getProperty("java.io.tmpdir")}/graft-anneval-ivf-$cells"
      val tb0 = System.nanoTime()
      val idx = SimilarityOps.buildIvfIndex(spark, e, root, cells = cells, iters = 5)
      val buildSec = (System.nanoTime() - tb0) / 1e9
      println(f"[anneval] ivf build ($cells cells, 5 iters): $buildSec%.2f s")
      Seq(cells / 8, cells / 6, cells / 4, cells / 3, cells * 3 / 8).distinct.foreach { np =>
        val t0 = System.nanoTime()
        val got = pairsOf(SimilarityOps.ivfTopKIndexed(spark, idx, queries, k = 10, nprobe = np))
        val sec = (System.nanoTime() - t0) / 1e9
        val frac = SimilarityOps.ivfCandidateFraction(spark, idx, queries, nprobe = np)
        val recall = got.intersect(exact).size.toDouble / math.max(1, exact.size)
        println(f"[anneval] ivf cells=$cells%3d nprobe=$np%3d recall@10=$recall%.3f candFrac=$frac%.3f sec=$sec%.2f")
      }
    }

    // ---- q20 banded tier: force every label through the band prefilter
    // and SWEEP (bands, bits, minCollide) configs — the measured
    // recall/fraction trade the tuned default is picked from. Recall is
    // over the NATURAL (non-planted) exact pairs (cos ≥ 0.35).
    val exactRows = SimilarityOps.neardupPairs(spark, sfDir)
      .select("a", "b", "cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val exact20 = exactRows.map(_._1).toSet
    println(s"[anneval] q20 exact natural pairs: ${exact20.size}")
    val configs = Seq(
      (8, 8, 1),    // the old default — built for the cos ≥ 0.7 regime
      (32, 5, 3), (64, 6, 3), (64, 7, 2), (96, 8, 2), (128, 8, 2),
      SimilarityOps.BandDefaults)
    configs.distinct.foreach { case (bands, bits, m) =>
      val t1 = System.nanoTime()
      val banded = abPairs(SimilarityOps.neardupPairs(spark, sfDir,
        blockCap = 0, bandPrefilter = true, bands = bands, bits = bits, minCollide = m))
      val sec = (System.nanoTime() - t1) / 1e9
      val frac = SimilarityOps.bandedCandidateFraction(spark, e, bands, bits, m)
      val r = banded.intersect(exact20).size.toDouble / math.max(1, exact20.size)
      val mark = if ((bands, bits, m) == SimilarityOps.BandDefaults) " <= DEFAULT" else ""
      println(f"[anneval] q20 band ${bands}%3dx$bits%d m=$m recall=$r%.3f candFrac=$frac%.4f sec=$sec%.2f pairs=${banded.size}$mark")
    }
    spark.stop()
  }
}
