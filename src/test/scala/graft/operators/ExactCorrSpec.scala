package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q183 exact correlation: known-correlation fixtures, bit-stability under
  * repartitioning (the property Spark's streaming-double corr() lacks),
  * and agreement with the builtin estimator. */
class ExactCorrSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val fn = AnalyticsOps.queries.find(_.name == "q183_exact_corr").get.fn

  /** materialize a toy lineitem so the gate's own query fn is under test */
  private def withTable(rows: Seq[(String, Double, Double, Double)])(
      check: org.apache.spark.sql.DataFrame => Unit): Unit = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corrspec").toString
    rows.toDF("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    check(fn(spark, dir))
  }

  test("perfectly linear pairs hit corr ±1; constant column yields NaN") {
    // price = 2*qty (corr +1), disc = -qty (corr -1 vs qty, -1... vs price)
    val rows = (1 to 50).map(i => ("A", i.toDouble, 2.0 * i, 50.0 - i))
    withTable(rows) { df =>
      val m = df.collect().map(r => r.getString(1) -> r.getDouble(4)).toMap
      assert(math.abs(m("qty_price") - 1.0) < 1e-9)
      assert(math.abs(m("qty_disc") + 1.0) < 1e-9)
      assert(math.abs(m("price_disc") + 1.0) < 1e-9)
    }
  }

  test("bit-stable under repartitioning and re-runs (exact decimal moments)") {
    val rows = (1 to 400).map { i =>
      val h = graft.functions.XxHash64Host.hashLong(i.toLong, 7)
      ("B", (math.abs(h % 50) + 1).toDouble,
        (math.abs(h % 9973) + 17).toDouble / 100.0,
        (math.abs(h % 11) ).toDouble / 100.0)
    }
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corrspec2").toString
    val df = rows.toDF("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
    df.repartition(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val a = fn(spark, dir).collect().map(r => (r.getString(1), r.getDouble(3), r.getDouble(4)))
    val dir2 = java.nio.file.Files.createTempDirectory("corrspec3").toString
    df.repartition(13).write.mode("overwrite").parquet(s"$dir2/lineitem.parquet")
    val b = fn(spark, dir2).collect().map(r => (r.getString(1), r.getDouble(3), r.getDouble(4)))
    assert(a.toSeq == b.toSeq, "cov/corr doubles must be IDENTICAL across layouts")
    // and the builtin (streaming doubles) agrees to float tolerance
    val builtin = spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(corr("l_quantity", "l_extendedprice")).collect()(0).getDouble(0)
    val ours = a.find(_._1 == "qty_price").get._3
    assert(math.abs(builtin - ours) < 1e-9, s"builtin $builtin vs exact $ours")
  }
}
