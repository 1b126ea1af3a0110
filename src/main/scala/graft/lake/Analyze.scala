package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TABLE STATISTICS (ANALYZE) — per-column row counts, null counts, and
  * KMV distinct estimates over the table's resolved state, persisted to
  * `meta/stats.json`. This is the input a cost-based planner needs to pick
  * join strategies (an NDV ≪ broadcast threshold says "broadcast this
  * dim"), size shuffle partitions, and order multi-way joins — Spark's own
  * ANALYZE TABLE for a catalog table, re-expressed for IceLite.
  *
  * Shape: ONE melted pass — every visible column contributes
  * (col_name, xxhash64(value), is_null) rows to a union, then a single
  * shuffle per aggregate computes all columns' stats together (cost
  * O(rows × cols), never one job per column). The NDV estimator is the
  * same k-minimum-values order statistic as
  * [[graft.operators.SketchOps.kmvDistinct]]: bit-reproducible across
  * engines (integer order stat + one IEEE division), so an external
  * oracle can re-derive every number from the dumped hashes. Columns with
  * fewer than k distinct values saturate the sketch and report the exact
  * count. */
object Analyze {

  /** Melted (col_name, h, isn) rows for the snapshot's visible columns —
    * exposed so a correctness harness can dump exactly what analyze
    * consumed. */
  def melt(spark: SparkSession, dir: String): DataFrame = {
    val snap = IceLite.load(dir)
    val table = IceLite.read(spark, snap)
    val visible = snap.currentSchema.filterNot(_.hidden).map(_.name)
    visible.map { c =>
      table.select(lit(c).as("col_name"), xxhash64(col(c)).as("h"),
        col(c).isNull.as("isn"))
    }.reduce(_.unionByName(_))
  }

  /** Compute and persist stats. Output (sorted by col_name):
    * (col_name, n_rows, n_nulls, est_distinct, kth_hash) —
    * kth_hash NULL when the sketch saturated (est is exact there). */
  def analyze(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    val m = melt(spark, dir)
    val counts = m.groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("isn"), 1L).otherwise(0L)).as("n_nulls"))
    val w = Window.partitionBy("col_name").orderBy("h")
    val kmv = m.filter(!col("isn")).select("col_name", "h").distinct()
      .withColumn("rn", row_number().over(w))
      .groupBy("col_name")
      .agg(count(lit(1)).as("exact_distinct"),
        max(when(col("rn") === k, col("h"))).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("kth_hash").isNull, col("exact_distinct").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            ((col("kth_hash").cast("double") + lit(9.223372036854775808e18)) /
              lit(1.8446744073709551616e19))))
    val out = counts.join(kmv, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("est_distinct"), lit(0.0)).as("est_distinct"), col("kth_hash"))
      .orderBy("col_name")

    val rows = out.collect()
    val json = rows.map { r =>
      val kth = if (r.isNullAt(4)) "null" else r.getLong(4).toString
      s"""  "${r.getString(0)}": {"rows": ${r.getLong(1)}, "nulls": ${r.getLong(2)}, """ +
        s""""ndv_est": ${r.getDouble(3)}, "kth_hash": $kth}"""
    }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "meta", "stats.json"), json.getBytes("UTF-8"))
    out
  }

  /** Read back persisted ndv estimates — the planner-facing surface. */
  def ndv(dir: String): Map[String, Double] = {
    val p = java.nio.file.Paths.get(dir, "meta", "stats.json")
    if (!java.nio.file.Files.exists(p)) return Map.empty
    val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    """"([^"]+)": \{"rows": \d+, "nulls": \d+, "ndv_est": ([0-9.E]+)""".r
      .findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap
  }
}
