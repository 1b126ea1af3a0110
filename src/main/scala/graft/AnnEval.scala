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

    // ---- q36 IVF: build once, sweep nprobe
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-anneval-ivf"
    val tb0 = System.nanoTime()
    val idx = SimilarityOps.buildIvfIndex(spark, e, root, cells = 64, iters = 5)
    val buildSec = (System.nanoTime() - tb0) / 1e9
    println(f"[anneval] ivf build (64 cells, 5 iters): $buildSec%.2f s")
    val queries = e.filter(col("vec_id") < nq)
    Seq(4, 8, 12, 16, 24).foreach { np =>
      val t0 = System.nanoTime()
      val got = pairsOf(SimilarityOps.ivfTopKIndexed(spark, idx, queries, k = 10, nprobe = np))
      val sec = (System.nanoTime() - t0) / 1e9
      val frac = SimilarityOps.ivfCandidateFraction(spark, idx, queries, nprobe = np)
      val recall = got.intersect(exact).size.toDouble / math.max(1, exact.size)
      println(f"[anneval] ivf nprobe=$np%2d recall@10=$recall%.3f candFrac=$frac%.3f sec=$sec%.2f")
    }

    // ---- q20 banded tier: force every label through the band prefilter.
    // Recall is stratified by pair strength: the tier is built for TRUE
    // near-dups (cos ≥ 0.7/0.9, where 64-bit signatures agree); pairs just
    // over the 0.35 emit threshold collide at the analytic ~15% band rate.
    val exactRows = SimilarityOps.neardupPairs(spark, sfDir)
      .select("a", "b", "cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val exact20 = exactRows.map(_._1).toSet
    val t1 = System.nanoTime()
    val banded20 = abPairs(SimilarityOps.neardupPairs(spark, sfDir, blockCap = 0, bandPrefilter = true))
    val bandedSec = (System.nanoTime() - t1) / 1e9
    def recallAbove(c: Double): (Int, Double) = {
      val strong = exactRows.filter(_._2 >= c).map(_._1).toSet
      (strong.size,
        if (strong.isEmpty) -1.0 else banded20.intersect(strong).size.toDouble / strong.size)
    }
    val r20 = banded20.intersect(exact20).size.toDouble / math.max(1, exact20.size)
    val (n07, r07) = recallAbove(0.7)
    val (n09, r09) = recallAbove(0.9)
    val candFrac20 = SimilarityOps.bandedCandidateFraction(spark, e)
    println(f"[anneval] q20 banded: recallAll=$r20%.3f recall(cos>=0.7)=$r07%.3f/$n07 recall(cos>=0.9)=$r09%.3f/$n09 candFrac=$candFrac20%.4f sec=$bandedSec%.2f exactPairs=${exact20.size} bandedPairs=${banded20.size}")
    spark.stop()
  }
}
