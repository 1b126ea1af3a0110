package graft.lake

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Drift statistic: deterministic fixed-order chain, zero iff the binned
  * distributions are identical, clamped binning, empty bins present. */
class DriftSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("histogram: all bins present, values clamped, NULLs excluded") {
    import spark.implicits._
    val df = Seq[Option[Long]](Some(-5L), Some(0L), Some(9L), Some(10L),
      Some(99L), Some(1000L), None).toDF("v")
    val h = Drift.histogram(df, "v", bins = 4, width = 10, "c")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // -5 clamps to bin 0; 0,9 → bin 0; 10 → bin 1; 99,1000 clamp → bin 3
    assert(h == Map(0 -> 3L, 1 -> 1L, 2 -> 0L, 3 -> 2L))
  }

  test("identical distributions → drift_stat exactly 0; shift → positive; deterministic") {
    import spark.implicits._
    val a = (1L to 400L).map(i => i % 40).toDF("v")
    val same = Drift.chiSquare(a, a.repartition(7), "v", bins = 8, width = 5)
    val rows = same.orderBy("bin").collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getDouble(3) == 0.0), "identical sides must score 0")
    assert(rows.forall(r => r.getLong(1) == r.getLong(2)))
    val b = (1L to 400L).map(i => (i % 40) + 10).toDF("v")
    val shifted = Drift.chiSquare(a, b, "v", bins = 8, width = 5)
    val s1 = shifted.select("drift_stat").head().getDouble(0)
    assert(s1 > 0.0)
    val s2 = Drift.chiSquare(a, b, "v", bins = 8, width = 5)
      .select("drift_stat").head().getDouble(0)
    assert(s1 == s2, "bit-stable across runs")
  }

  test("streaming monitor == batch operator, wave by wave") {
    import spark.implicits._
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-driftmon-spec"
    // three 100-row waves 1 hour apart; wave 2's values shifted up
    val rows = for (w <- 0 until 3; i <- 0 until 100) yield {
      val tsUs = 1700000000000000L + w * 3600000000L + i * 1000000L
      (w * 100L + i, new java.sql.Timestamp(tsUs / 1000), (i % 40 + w * 20).toDouble)
    }
    val ev = rows.toDF("event_id", "ts", "value")
    val out = graft.streaming.DriftMonitor.monitorToCompletion(
      spark, ev, root, chunks = 3, "cast(floor(value) as bigint)",
      bins = 8, width = 10)
    val gotStat = out.select("wave", "drift_stat").distinct()
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotStat.keySet == Set(1L, 2L))
    // the batch operator over the same band split must agree bit-for-bit
    import org.apache.spark.sql.functions.{col, unix_micros}
    def band(w: Int) = ev.filter(
      (unix_micros(col("ts").cast("timestamp")) -
        1700000000000000L).divide(3600000000L).cast("int") === w)
    for (w <- 1 to 2) {
      val want = Drift.chiSquare(band(0), band(w),
        "cast(floor(value) as bigint)", bins = 8, width = 10)
        .select("drift_stat").head().getDouble(0)
      assert(gotStat(w.toLong) == want, s"wave $w: ${gotStat(w.toLong)} vs $want")
    }
    assert(gotStat(2L) > gotStat(1L), "the shifted wave must score higher")
  }

  test("empty side refuses loudly") {
    import spark.implicits._
    val a = Seq(1L, 2L).toDF("v")
    val e = Seq.empty[Long].toDF("v")
    val ex = intercept[IllegalArgumentException] {
      Drift.chiSquare(a, e, "v", bins = 4, width = 1)
    }
    assert(ex.getMessage.contains("non-empty"))
  }
}
