package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DISTRIBUTION DRIFT between two versions of a table — the check a
  * training-data pipeline runs before trusting a refreshed snapshot ("did
  * yesterday's ingest change what this column looks like?").
  *
  * Both versions are reduced to a FIXED-WIDTH integer histogram of a
  * numeric expression (bin = clamp(value div width, 0, bins-1) — integer
  * floor division, so binning is byte-deterministic), then compared with a
  * chi-square-style two-sample homogeneity statistic over the pooled
  * proportions:
  *
  *   term_b = (c1_b/n1 - c2_b/n2)² / ((c1_b + c2_b) / (n1 + n2)),  empty-bin term = 0
  *   drift_stat = term_0 + term_1 + … + term_{B-1}   (LEFT-ASSOCIATIVE, in bin order)
  *
  * Every input to the doubles is an integer count, every double op is an
  * exactly-rounded IEEE operation, and the sum is a FIXED-ORDER chain (the
  * q130 rule) — so a DuckDB oracle recomputing the same formula over the
  * same counts reproduces the statistic bit-for-bit; there is no float
  * tolerance anywhere in the gate.
  *
  * Scale shape: each side is one column-pruned scan → a B-row aggregate
  * (map-side partial, B is a constant); the comparison is driver-trivial.
  * No join between the versions, no sort, no full materialization — the
  * same query on a 100 TB snapshot pair moves 2·B longs to the driver.
  * NULL values carry no distribution information and are excluded from
  * both the counts and the totals. */
object Drift {

  /** Per-bin counts of `valueSql` over `df` — all `bins` rows present
    * (empty bins count 0). `valueSql` is a SQL expression (it must parse
    * identically in the oracle's dialect; stick to ANSI). */
  def histogram(df: DataFrame, valueSql: String, bins: Int, width: Int,
      cntName: String): DataFrame = {
    require(bins > 0 && width > 0, "bins and width must be positive")
    val spark = df.sparkSession
    val spine = spark.range(bins).select(col("id").cast("int").as("bin"))
    val binned = df.select(expr(valueSql).as("__v")).filter(col("__v").isNotNull)
      .select(least(lit(bins - 1), greatest(lit(0),
        expr(s"cast((__v div $width) as int)"))).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(cntName))
    spine.join(binned, Seq("bin"), "left").na.fill(0L, Seq(cntName))
  }

  /** The statistic over already-binned sides: `h` must hold one row per
    * bin with integer counts (bin, c_old, c_new); n1/n2 are the sides'
    * total (non-NULL) row counts. Exposed separately so a consumer that
    * only kept histograms (e.g. the streaming monitor's persisted
    * reference) can score against them without the raw rows. */
  def chiSquareFromHists(h: DataFrame, n1: Long, n2: Long, bins: Int): DataFrame = {
    require(n1 > 0 && n2 > 0, s"drift needs non-empty sides ($n1, $n2 rows)")
    val r1 = col("c_old").cast("double") / lit(n1.toDouble)
    val r2 = col("c_new").cast("double") / lit(n2.toDouble)
    val d = r1 - r2
    val p = (col("c_old").cast("double") + col("c_new").cast("double")) /
      (lit(n1.toDouble) + lit(n2.toDouble))
    val withTerm = h.withColumn("__term",
      when(col("c_old") + col("c_new") > 0, d * d / p).otherwise(lit(0.0)))
    // fixed-order left-associative chain over the bins — the one shape both
    // engines sum identically (aggregate SUM order is not contractual)
    val tcols = (0 until bins).map(b =>
      max(when(col("bin") === b, col("__term"))).as(s"t$b"))
    val statRow = withTerm.agg(tcols.head, tcols.tail: _*)
      .select((0 until bins).map(b => col(s"t$b"))
        .reduceLeft(_ + _).as("drift_stat"))
    withTerm.drop("__term").crossJoin(statRow)
  }

  /** The drift frame for two already-loaded sides: one row per bin
    * (bin, c_old, c_new) plus the constant `drift_stat` column. */
  def chiSquare(oldDf: DataFrame, newDf: DataFrame, valueSql: String,
      bins: Int, width: Int): DataFrame = {
    val h = histogram(oldDf, valueSql, bins, width, "c_old")
      .join(histogram(newDf, valueSql, bins, width, "c_new"), Seq("bin"))
    val n1 = oldDf.select(expr(valueSql).as("__v"))
      .filter(col("__v").isNotNull).count()
    val n2 = newDf.select(expr(valueSql).as("__v"))
      .filter(col("__v").isNotNull).count()
    chiSquareFromHists(h, n1, n2, bins)
  }

  /** Drift of `valueSql` between two committed versions of an IceLite
    * table — both sides are the resolved LIVE rows of their snapshot (the
    * same read path time travel serves). */
  def betweenVersions(spark: SparkSession, dir: String, vOld: Int, vNew: Int,
      valueSql: String, bins: Int, width: Int): DataFrame =
    chiSquare(
      IceLite.read(spark, IceLite.loadVersion(dir, vOld)),
      IceLite.read(spark, IceLite.loadVersion(dir, vNew)),
      valueSql, bins, width)
}
