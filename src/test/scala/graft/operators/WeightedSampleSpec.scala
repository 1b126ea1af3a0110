package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Priority sampling: exactly k per group, equals the naive per-row
  * recomputation, layout-independent, and weight-sensitive (heavier rows
  * are sampled far above their uniform share). */
class WeightedSampleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkDf(parts: Int) = {
    import spark.implicits._
    // 4 groups × 250 rows; weight = 1 for most, 50 for every 10th row
    (0L until 1000L).map { i =>
      (s"g${i % 4}", i, if (i % 10 == 0) 50L else 1L)
    }.toDF("grp", "id", "w").repartition(parts)
  }

  private def naive(k: Int): Map[String, Seq[Long]] = {
    (0L until 1000L).map { i =>
      val grp = s"g${i % 4}"
      val w = if (i % 10 == 0) 50L else 1L
      val h = graft.functions.Hash60.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"ws:$i"))
      (grp, i, w.toDouble / (h + 1L).toDouble)
    }.groupBy(_._1).map { case (g, rows) =>
      g -> rows.sortBy(r => (-r._3, r._2)).take(k).map(_._2).toSeq
    }
  }

  for (parts <- Seq(1, 8)) {
    test(s"sample == naive priority top-k over $parts partitions") {
      val got = SamplingOps.weightedPrioritySample(mkDf(parts), "grp", "id", "w",
        k = 20, cols = Seq("id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
        .groupBy(_._1).map { case (g, rs) => g -> rs.sortBy(_._2).map(_._3).toSeq }
      assert(got == naive(20))
    }
  }

  test("exactly k rows per group; heavier rows are over-represented") {
    val rows = SamplingOps.weightedPrioritySample(mkDf(4), "grp", "id", "w",
      k = 20, cols = Seq("id", "w")).collect()
    val perGroup = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(perGroup.values.toSet == Set(20))
    // heavy rows are 10% of the population with 50× the weight → they
    // should be over-represented several-fold (≥ 30% of the sample; the
    // observed share on this seed is ~49%)
    val heavy = rows.count(_.getLong(4) == 50L)
    assert(heavy * 10 >= rows.length * 3,
      s"only $heavy/${rows.length} heavy rows sampled")
  }

  test("non-positive and NULL weights are excluded") {
    import spark.implicits._
    val df = Seq(("g", 1L, 5L), ("g", 2L, 0L), ("g", 3L, -4L))
      .toDF("grp", "id", "w")
      .union(Seq(("g", 4L)).toDF("grp", "id").withColumn("w", lit(null).cast("long")))
    val got = SamplingOps.weightedPrioritySample(df, "grp", "id", "w",
      k = 10, cols = Seq("id")).collect().map(_.getLong(3)).toSet
    assert(got == Set(1L))
  }
}
