package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PCA train/project: recovers a planted dominant direction, the solver
  * invariants hold (orthonormality / eigenvalue order / residual — all
  * require()d at train time), projection equals the manual dot product,
  * and training is layout-independent (sorted stride sample). */
class PcaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val d = 16

  /** Seeded corpus with one dominant direction u (variance ~25×) plus
    * small isotropic noise. */
  private def corpus(n: Int, parts: Int) = {
    import spark.implicits._
    val u = Array.tabulate(d)(j => if (j % 2 == 0) 0.5 else -0.5) // |u| = 1 for d=16
    (0L until n).map { i =>
      val a = ((graft.cdc.LogGen.mix(7L + i) >>> 11).toDouble % 1000 / 100.0) - 5.0
      val vec = Array.tabulate(d) { j =>
        val noise = (((graft.cdc.LogGen.mix(i * 37 + j) >>> 11).toDouble % 1000) / 1000.0 - 0.5) * 0.2
        (a * u(j) + noise).toFloat
      }
      (i, vec.toSeq)
    }.toDF("vec_id", "embedding").repartition(parts)
  }

  test("top component aligns with the planted direction; invariants hold") {
    val m = PcaOps.trainPca(spark, corpus(400, 4), nComp = 3, sampleCap = 400)
    val u = Array.tabulate(d)(j => if (j % 2 == 0) 0.5 else -0.5)
    val cosTop = m.comps(0).zip(u).map { case (x, y) => x * y }.sum
    assert(math.abs(cosTop) > 0.99, s"top component drifted: cos = $cosTop")
    assert(m.eigvals(0) > 5.0 * m.eigvals(1),
      s"planted direction should dominate: ${m.eigvals.mkString(",")}")
  }

  test("projection == manual centered dot; layout-independent training") {
    import spark.implicits._
    val c4 = corpus(400, 4)
    val m4 = PcaOps.trainPca(spark, c4, nComp = 2, sampleCap = 400)
    val m1 = PcaOps.trainPca(spark, corpus(400, 1), nComp = 2, sampleCap = 400)
    assert(m4.comps.flatten.toSeq == m1.comps.flatten.toSeq,
      "training must not depend on the partition layout")
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-pca-spec"
    PcaOps.dumpModel(spark, m4, s"$root/comps")
    val proj = PcaOps.project(spark, c4, spark.read.parquet(s"$root/comps"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val vecs = c4.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toMap
    for (id <- Seq(0L, 17L, 399L); c <- 0 until 2) {
      var acc = 0.0
      val v = vecs(id)
      var j = 0
      while (j < d) { acc += v(j).toDouble * m4.comps(c)(j); j += 1 }
      assert(math.abs(proj((id, c.toLong)) - (acc - m4.bias(c))) < 1e-12)
    }
  }

  test("stride sampling bounds the training set but keeps the direction") {
    val m = PcaOps.trainPca(spark, corpus(400, 4), nComp = 1, sampleCap = 64)
    val u = Array.tabulate(d)(j => if (j % 2 == 0) 0.5 else -0.5)
    val cosTop = m.comps(0).zip(u).map { case (x, y) => x * y }.sum
    assert(math.abs(cosTop) > 0.98, s"sampled train drifted: cos = $cosTop")
  }
}
