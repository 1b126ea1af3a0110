package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pareto front: equals the O(n²) brute-force skyline on seeded random
  * data in 2 and 3 dimensions, is layout-independent, and keeps exact
  * criterion ties together. */
class ParetoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Seeded points: id → d criteria in [0, 1000), all axes MAXIMIZE. */
  private def points(n: Int, d: Int, seed: Long): Seq[(Long, Seq[Double])] =
    (0L until n).map { i =>
      (i, (0 until d).map(j =>
        (graft.cdc.LogGen.mix(seed + i * 31 + j) >>> 11).toDouble % 1000))
    }

  private def bruteSkyline(ps: Seq[(Long, Seq[Double])]): Set[Long] = {
    def dom(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).forall { case (x, y) => x >= y } && a != b
    ps.filter(p => !ps.exists(q => dom(q._2, p._2))).map(_._1).toSet
  }

  for (d <- Seq(2, 3); parts <- Seq(1, 7)) {
    test(s"front == brute force at d=$d over $parts partitions") {
      import spark.implicits._
      val ps = points(400, d, seed = 77L * d)
      val df = ps.toDF("id", "v").repartition(parts)
        .select(col("id") +: (0 until d).map(j => col("v")(j).as(s"c$j")): _*)
      val got = AnalyticsOps.paretoFront(df, "id",
        maxCols = (0 until d).map(j => col(s"c$j")), minCols = Nil)
        .as[Long].collect().toSet
      assert(got == bruteSkyline(ps))
    }
  }

  test("minCols negate correctly: maximize c0, minimize c1 == brute on (c0, -c1)") {
    import spark.implicits._
    val ps = points(300, 2, seed = 5L)
    val df = ps.toDF("id", "v")
      .select(col("id"), col("v")(0).as("c0"), col("v")(1).as("c1"))
    val got = AnalyticsOps.paretoFront(df, "id",
      maxCols = Seq(col("c0")), minCols = Seq(col("c1")))
      .as[Long].collect().toSet
    val want = bruteSkyline(ps.map { case (i, v) => (i, Seq(v(0), -v(1))) })
    assert(got == want)
  }

  test("exact criterion ties all survive together") {
    import spark.implicits._
    // two identical best points + one dominated
    val df = Seq((1L, 10.0, 10.0), (2L, 10.0, 10.0), (3L, 5.0, 5.0))
      .toDF("id", "c0", "c1").repartition(3)
    val got = AnalyticsOps.paretoFront(df, "id",
      maxCols = Seq(col("c0"), col("c1")), minCols = Nil)
      .as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }
}
