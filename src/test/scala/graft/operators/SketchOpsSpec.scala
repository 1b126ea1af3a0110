package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV estimator: exact on saturated groups, bounded error above k, and
  * deterministic (pure order statistic over xxhash64). */
class SketchOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("saturated group is exact; large group within KMV error bounds; deterministic") {
    import spark.implicits._
    // group "small": 40 distinct (< k=64) → exact; "big": 5000 distinct
    val df = ((1L to 40L).map(i => ("small", i)) ++
      (1L to 5000L).map(i => ("big", i + 1000000L)))
      .toDF("g", "v")
    def run() = SketchOps.kmvDistinct(df, "v", "g", k = 64)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val m = run()
    assert(m("small")._1 == 40.0 && m("small")._2 == 40L)
    assert(m("big")._2 == 5000L)
    // standard error 1/sqrt(k-2) ≈ 13%; allow 4 sigma
    assert(math.abs(m("big")._1 - 5000.0) / 5000.0 < 0.52,
      s"estimate ${m("big")._1} too far from 5000")
    assert(run() == m, "pure order statistic — bit-stable across runs")
  }

  test("duplicates do not move the estimate (distinct semantics)") {
    import spark.implicits._
    val base = (1L to 500L).map(i => ("g", i))
    val dup = base ++ base ++ base
    val a = SketchOps.kmvDistinct(base.toDF("g", "v"), "v", "g", 64).collect()(0)
    val b = SketchOps.kmvDistinct(dup.toDF("g", "v"), "v", "g", 64).collect()(0)
    assert(a.getDouble(1) == b.getDouble(1) && b.getLong(2) == 500L)
  }
}
