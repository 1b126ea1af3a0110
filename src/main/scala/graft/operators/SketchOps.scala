package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.ld

/** SKETCHES — bounded-state cardinality estimation.
  *
  * [[kmvDistinct]] is the K-MINIMUM-VALUES estimator (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002): hash every
  * value onto a uniform 64-bit line, keep the k smallest distinct hashes
  * per group, and estimate |D| ≈ (k-1) / fraction-of-line below the k-th
  * minimum. Like HLL it is MERGEABLE (the union's k smallest hashes are a
  * subset of the sides' k smallest — partial aggregation and shuffle
  * carry O(k) per group, never O(distinct)), but unlike HLL the estimate
  * is a pure integer-order statistic over xxhash64 — bit-reproducible
  * across engines, which is what lets a DuckDB oracle re-derive it from
  * the dumped hashes (q82). Spark's production path for casual use is the
  * built-in `approx_count_distinct`; this operator exists for when the
  * sketch itself must be stored, merged across partitions/days, or
  * audited ("which hashes witnessed this count").
  *
  * Groups with fewer than k distinct values saturate the sketch; there the
  * estimate IS the exact distinct count (the sketch holds every hash). */
object SketchOps {

  /** Per-group KMV distinct estimate of `keyCol`, plus the exact count for
    * the error column. Output: (groupCol, est_distinct, exact_distinct,
    * kth_hash — NULL when saturated). */
  def kmvDistinct(df: DataFrame, keyCol: String, groupCol: String, k: Int): DataFrame = {
    val hashed = df.select(col(groupCol), col(keyCol)).distinct()
      .withColumn("__h", xxhash64(col(keyCol)))
    val w = Window.partitionBy(groupCol).orderBy("__h")
    hashed.withColumn("__rn", row_number().over(w))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("exact_distinct"),
        max(when(col("__rn") === k, col("__h"))).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("kth_hash").isNull, col("exact_distinct").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            ((col("kth_hash").cast("double") + lit(9.223372036854775808e18)) /
              lit(1.8446744073709551616e19))))
      .select(col(groupCol), col("est_distinct"), col("exact_distinct"), col("kth_hash"))
  }

  val queries: Seq[OpQuery] = Seq(
    OpQuery("q82_kmv_distinct",
      // KMV CARDINALITY SKETCH under the hard gate: per-event-type distinct
      // users (k = 64) plus a global '__all__' row. The query dumps the
      // distinct (group, key, xxhash64) triples it hashed — xxhash64 is
      // property-tested against the public spec separately — and the
      // oracle re-derives the k-th order statistic AND the estimate
      // formula in SQL; the exact column keeps the estimator honest.
      (s, d) => {
        val ev = ld(s, d, "events")
        val root = s"${System.getProperty("java.io.tmpdir")}/graft-q82"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
        ev.select(col("event_type"), col("user_id")).distinct()
          .withColumn("h", xxhash64(col("user_id")))
          .write.mode("overwrite").parquet(s"$root/hashes")
        val byType = kmvDistinct(ev, "user_id", "event_type", k = 64)
        val global = kmvDistinct(
          ev.withColumn("g", lit("__all__")), "user_id", "g", k = 64)
          .withColumnRenamed("g", "event_type")
        byType.unionByName(global).orderBy("event_type")
      },
      Some(s"""WITH h AS (SELECT DISTINCT event_type, h
               FROM parquet_scan('${System.getProperty("java.io.tmpdir")}/graft-q82/hashes/*.parquet')),
        ha AS (SELECT event_type, h FROM h
               UNION ALL SELECT '__all__' AS event_type, h FROM (SELECT DISTINCT h FROM h) t),
        r AS (SELECT event_type, h,
              row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM ha),
        agg AS (SELECT event_type, count(*) AS exact_distinct,
                max(CASE WHEN rn = 64 THEN h END) AS kth_hash
                FROM r GROUP BY event_type)
        SELECT event_type,
               CASE WHEN kth_hash IS NULL THEN CAST(exact_distinct AS DOUBLE)
                    ELSE 63.0 / ((CAST(kth_hash AS DOUBLE) + 9.223372036854775808e18)
                                 / 1.8446744073709551616e19) END AS est_distinct,
               exact_distinct, kth_hash
        FROM agg ORDER BY event_type"""))
  )
}
