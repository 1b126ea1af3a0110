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

  test("heavy hitters == plain GROUP BY HAVING, for every layout and ordering") {
    import spark.implicits._
    // Zipf-ish synthetic: key i appears ~N/(i+1) times, plus a long tail of
    // singletons — some keys sit just above and just below the threshold.
    def data(seed: Long): Seq[Long] = {
      val heads = (0 until 40).flatMap(i => Seq.fill(400 / (i + 1))(i.toLong))
      val tail = (0 until 800).map(i => 1000L + ((i * 31 + seed) % 797))
      val all = heads ++ tail
      // deterministic shuffle: order by mixed hash
      all.sortBy(x => graft.cdc.LogGen.mix(x * 7919 + seed + all.indexOf(x)))
    }
    for (seed <- Seq(1L, 2L); k <- Seq(8, 32); parts <- Seq(2, 16)) {
      val df = data(seed).toDF("key").repartition(parts)
      val n = df.count()
      val (hh, nCands) = SketchOps.heavyHitters(df, "key", k)
      val got = hh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df.groupBy("key").count()
        .filter(col("count") * (k + 1) > n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"seed=$seed k=$k parts=$parts: $got vs $want")
      assert(want.nonEmpty, "test data must contain heavy hitters")
      assert(nCands >= want.size, "candidates are a superset")
    }
  }

  test("heavy hitters: NULL keys excluded; result stable across repartitioning") {
    import spark.implicits._
    val df = (Seq.fill(50)(Some(1L)) ++ Seq.fill(3)(Option.empty[Long]) ++
      (1L to 30L).map(Some(_))).toDF("key")
    val (hh, _) = SketchOps.heavyHitters(df, "key", k = 4)
    val a = hh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // key 1: 51 occurrences of 80 non-null rows; 51*5 > 80 → heavy
    assert(a == Set((1L, 51L)))
    val (hh2, _) = SketchOps.heavyHitters(df.repartition(7), "key", k = 4)
    assert(hh2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == a)
  }

  test("kmv set ops: unsaturated pair is exact; saturated estimates within bounds") {
    import spark.implicits._
    // sides: A = 1..30, B = 16..45 (overlap 15 of union 45) — unsaturated
    // at k=64 → exact. C = 1..4000, D = 2001..6000 (overlap 2000 of 6000).
    val rows = (1L to 30L).map(("A", _)) ++ (16L to 45L).map(("B", _)) ++
      (1L to 4000L).map(("C", _)) ++ (2001L to 6000L).map(("D", _))
    val out = SketchOps.kmvSetOps(rows.toDF("side", "key"), "key", "side", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("A", "B"))
    assert(ab.getAs[Long]("exact_union") == 45L &&
      ab.getAs[Long]("exact_intersection") == 15L)
    assert(ab.getAs[Double]("est_union") == 45.0, "unsaturated union is exact")
    assert(ab.getAs[Double]("est_intersection") == 15.0,
      "unsaturated intersection is exact")
    val cd = out(("C", "D"))
    assert(cd.getAs[Long]("exact_union") == 6000L &&
      cd.getAs[Long]("exact_intersection") == 2000L)
    assert(math.abs(cd.getAs[Double]("est_union") - 6000.0) / 6000.0 < 0.5)
    // jaccard true = 1/3; k_int/k binomial(64, 1/3) → 4 sigma ≈ 0.24
    assert(math.abs(cd.getAs[Double]("jaccard_est") - 1.0 / 3) < 0.24)
    // deterministic: re-run bit-identical
    val again = SketchOps.kmvSetOps(rows.toDF("side", "key"), "key", "side", 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("est_intersection")).toMap
    assert(again(("C", "D")) == cd.getAs[Double]("est_intersection"))
  }
}
