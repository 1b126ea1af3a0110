package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q180 sampled quantiles + q182 bottom-k sample: rank-error bounds,
  * mergeability (the property that makes both sketches cheap at scale),
  * empty-sample honesty, and determinism. */
class SampleSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sampledQuantiles: estimate within rank-error bound; exact columns exact") {
    import spark.implicits._
    // uniform values 1..8000 — the true p50/p90 are known, and any
    // quantile estimate's value error ≈ its rank error for uniform data
    val df = (1L to 8000L).map(i => ("g", i.toDouble, i)).toDF("g", "v", "id")
    val r = SketchOps.sampledQuantiles(df, "v", "g", "id", mod = 8).collect()(0)
    assert(r.getAs[Long]("n_exact") == 8000L)
    assert(r.getAs[Double]("p50_exact") == 4000.0)
    assert(r.getAs[Double]("p90_exact") == 7200.0)
    val sn = r.getAs[Long]("sample_n")
    // ~1/8 of 8000: binomial, 6 sigma ≈ 190
    assert(math.abs(sn - 1000L) < 200, s"sample_n $sn far from 1000")
    // rank error O(1/sqrt(p*n)): 4 sigma of p50 rank ≈ 4*sqrt(.25*sn)/sn
    val tol = 8000.0 * 4.0 / math.sqrt(sn.toDouble)
    assert(math.abs(r.getAs[Double]("p50_est") - 4000.0) < tol)
    assert(math.abs(r.getAs[Double]("p90_est") - 7200.0) < tol)
  }

  test("sampledQuantiles: mergeable — sample of a union is the union of samples") {
    import spark.implicits._
    val a = (1L to 3000L).map(i => ("g", i.toDouble, i)).toDF("g", "v", "id")
    val b = (3001L to 6000L).map(i => ("g", i.toDouble, i)).toDF("g", "v", "id")
    val merged = SketchOps.sampledQuantiles(a.union(b), "v", "g", "id", 8).collect()(0)
    // re-deriving the union's summary from the two sides' SAMPLES alone
    // must give the identical estimate: membership is a pure row hash
    graft.functions.Hash60.register(spark)
    def sample(df: org.apache.spark.sql.DataFrame) =
      df.filter(expr("pmod(hash60(concat('sq:', CAST(id AS STRING))), 8) = 0"))
    val unionOfSamples = sample(a).union(sample(b))
    val sampleOfUnion = sample(a.union(b))
    assert(unionOfSamples.collect().toSet == sampleOfUnion.collect().toSet)
    assert(merged.getAs[Long]("sample_n") == unionOfSamples.count())
  }

  test("sampledQuantiles: group with an empty sample reports NULL estimates") {
    import spark.implicits._
    // ids chosen so none hash to 0 mod 8 — tiny group, miss is plausible;
    // search a window of ids for a run of 3 non-members
    graft.functions.Hash60.register(spark)
    val nonMembers = (1L to 200L).map(i => i ->
      spark.sql(s"SELECT pmod(hash60('sq:$i'), 8) <> 0").collect()(0).getBoolean(0))
      .filter(_._2).map(_._1).take(3)
    val df = nonMembers.map(i => ("tiny", i.toDouble, i)).toDF("g", "v", "id")
    val r = SketchOps.sampledQuantiles(df, "v", "g", "id", 8).collect()(0)
    assert(r.getAs[Long]("n_exact") == 3L)
    assert(r.isNullAt(r.fieldIndex("sample_n")))
    assert(r.isNullAt(r.fieldIndex("p50_est")))
  }

  test("bottomKSample: min(k, group size) rows; mergeable union-truncate; deterministic") {
    import spark.implicits._
    val df = ((1L to 500L).map(i => ("big", i)) ++ (1L to 7L).map(i => ("small", i + 9000L)))
      .toDF("g", "id").withColumn("payload", col("id") * 2)
    val full = SamplingOps.bottomKSample(df, "g", "id", 10, Seq("id", "payload"))
    val byG = full.collect().groupBy(_.getString(0))
    assert(byG("big").length == 10 && byG("small").length == 7)
    assert(byG("small").map(_.getAs[Long]("rn")).sorted.toSeq == (1L to 7L))
    // mergeability: sample each half, union, re-sample → identical rows
    val h1 = df.filter(col("id") % 2 === 0)
    val h2 = df.filter(col("id") % 2 =!= 0)
    val mergedSides = SamplingOps.bottomKSample(h1, "g", "id", 10, Seq("id", "payload"))
      .union(SamplingOps.bottomKSample(h2, "g", "id", 10, Seq("id", "payload")))
      .drop("rn")
    val remerged = SamplingOps.bottomKSample(mergedSides, "g", "id", 10, Seq("id", "payload"))
    assert(remerged.collect().toSet == full.collect().toSet,
      "k smallest of the union must be recoverable from the sides' k smallest")
    assert(full.collect().toSet == SamplingOps.bottomKSample(
      df.repartition(7), "g", "id", 10, Seq("id", "payload")).collect().toSet,
      "partitioning-independent")
  }
}
