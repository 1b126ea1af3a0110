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
    // ONE table pass: a per-column union re-scans (and delta-resolves) the
    // table once per column; exploding a per-row array of (name, hash,
    // isnull) structs yields the identical melted rows in a single scan
    table.select(explode(array(visible.map(c =>
        struct(lit(c).as("col_name"), xxhash64(col(c)).as("h"),
          col(c).isNull.as("isn"))): _*)).as("__e"))
      .select(col("__e.col_name"), col("__e.h"), col("__e.isn"))
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

  // ── INCREMENTAL PER-BUCKET STATS ─────────────────────────────────────
  // Stats maintained as one sketch row per (bucket, column): row/null
  // counts sum across buckets, and the KMV sketch merges EXACTLY — every
  // hash among the global k smallest is necessarily among its own bucket's
  // k smallest, so re-taking the k smallest over the union of per-bucket
  // sketches reproduces the full-scan sketch bit for bit. An epoch then
  // refreshes only the buckets its commit touched (a metadata-only diff of
  // the two snapshots' file lists): maintenance cost is O(touched buckets),
  // never O(table), with ZERO accuracy loss vs a full re-analyze — the
  // property [[mergedStats]] is gated on (q143).

  private def statsRoot(dir: String) = s"$dir/meta/bucket_stats"
  private def statsMeta(dir: String) =
    java.nio.file.Paths.get(statsRoot(dir), "_META")

  /** Per-bucket sketch rows for `buckets` at the CURRENT snapshot:
    * (bucket, col_name, n_rows, n_nulls, kmins = the ≤k smallest distinct
    * value hashes, ascending). */
  def bucketStats(spark: SparkSession, dir: String, buckets: Set[Int],
      k: Int): DataFrame = {
    val snap = IceLite.load(dir)
    val table = IceLite.read(spark, snap, f => buckets(f.bucket))
      .withColumn("__b", IceLite.bucketExpr(snap.keyCols, snap.buckets))
    val visible = snap.currentSchema.filterNot(_.hidden).map(_.name)
    // same single-pass melt as [[melt]] (one scan instead of one per column)
    val m = table.select(col("__b").as("bucket"),
        explode(array(visible.map(c =>
          struct(lit(c).as("col_name"), xxhash64(col(c)).as("h"),
            col(c).isNull.as("isn"))): _*)).as("__e"))
      .select(col("bucket"), col("__e.col_name"), col("__e.h"), col("__e.isn"))
    val counts = m.groupBy("bucket", "col_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("isn"), 1L).otherwise(0L)).as("n_nulls"))
    val w = Window.partitionBy("bucket", "col_name").orderBy("h")
    val kmins = m.filter(!col("isn")).select("bucket", "col_name", "h").distinct()
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy("bucket", "col_name")
      .agg(sort_array(collect_list(col("h"))).as("kmins"))
    counts.join(kmins, Seq("bucket", "col_name"), "left")
      .select(col("bucket"), col("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("kmins"), array().cast("array<bigint>")).as("kmins"))
  }

  /** Buckets whose data changed between two snapshot versions — purely
    * from manifest metadata (the buckets of files present in `to` but not
    * in `from`; replacement semantics make this the complete touched set). */
  def touchedBuckets(dir: String, fromVersion: Int, toVersion: Int): Set[Int] = {
    val old = IceLite.loadVersion(dir, fromVersion).files.map(_.path).toSet
    IceLite.loadVersion(dir, toVersion).files
      .filterNot(f => old(f.path)).map(_.bucket).toSet
  }

  private def writeMeta(dir: String, k: Int, buckets: Int, covered: Set[Int]): Unit =
    java.nio.file.Files.write(statsMeta(dir),
      (s"""{"k":$k,"buckets":$buckets,""" +
        s""""covered":[${covered.toSeq.sorted.mkString(",")}]}""").getBytes("UTF-8"))

  private def readMeta(dir: String): (Int, Int, Set[Int]) = {
    val s = new String(java.nio.file.Files.readAllBytes(statsMeta(dir)), "UTF-8")
    def num(key: String) = (s""""$key":(\\d+)""").r.findFirstMatchIn(s)
      .map(_.group(1).toInt).getOrElse(sys.error(s"corrupt sketch meta: $s"))
    val covered = """"covered":\[([0-9,]*)\]""".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse(sys.error(s"corrupt sketch meta: $s"))
    (num("k"), num("buckets"),
      covered.split(',').filter(_.nonEmpty).map(_.toInt).toSet)
  }

  /** Recompute and persist the sketch rows of `touched` buckets from the
    * current snapshot (dynamic partition overwrite: untouched buckets'
    * sketches are left in place). The sketch store is keyed to a fixed
    * (k, bucket-count) recorded on first refresh — a rebucket re-homes
    * every key, so it requires a full refresh under the new layout. The
    * meta file also records which buckets have EVER been refreshed:
    * [[mergedStats]] refuses to serve until every bucket is covered, so a
    * store whose first refresh was incremental can never silently present
    * a bucket subset as full-table statistics. */
  def refreshBuckets(spark: SparkSession, dir: String, touched: Set[Int],
      k: Int = 256): Unit = {
    require(touched.nonEmpty, "refreshBuckets needs at least one bucket")
    val snapBuckets = IceLite.load(dir).buckets
    val meta = statsMeta(dir)
    val covered: Set[Int] =
      if (!java.nio.file.Files.exists(meta)) Set.empty
      else {
        val (k0, b0, c0) = readMeta(dir)
        require(k0 == k && b0 == snapBuckets,
          s"sketch store was built with different parameters (k=$k0, buckets=$b0); " +
            s"full-refresh after changing k or rebucketing")
        c0
      }
    val stats = bucketStats(spark, dir, touched, k).persist()
    stats.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(statsRoot(dir))
    // dynamic overwrite never clears a partition that produced no rows —
    // a touched bucket whose keys were all deleted must drop its sketch
    val present = stats.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    stats.unpersist()
    (touched -- present).foreach { b =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        java.nio.file.Paths.get(statsRoot(dir), s"bucket=$b").toFile)
    }
    writeMeta(dir, k, snapBuckets, covered ++ touched)
  }

  /** Fold the per-bucket sketch store into the [[analyze]] output shape —
    * bit-equal to a full analyze at the same k. Refuses a store that has
    * never covered every bucket (partial stats presented as full-table
    * numbers would silently mislead the planner). */
  def mergedStats(spark: SparkSession, dir: String): DataFrame = {
    val meta = statsMeta(dir)
    require(java.nio.file.Files.exists(meta), s"no sketch store at $dir")
    val (k, buckets, covered) = readMeta(dir)
    require((0 until buckets).forall(covered),
      s"sketch store covers only buckets ${covered.toSeq.sorted} of $buckets; " +
        "refresh the remaining buckets before reading merged stats")
    val st = spark.read.parquet(statsRoot(dir))
    val counts = st.groupBy("col_name")
      .agg(sum("n_rows").as("n_rows"), sum("n_nulls").as("n_nulls"))
    val w = Window.partitionBy("col_name").orderBy("h")
    val kmv = st.select(col("col_name"), explode(col("kmins")).as("h")).distinct()
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy("col_name")
      .agg(count(lit(1)).as("nk"),
        max(when(col("rn") === k, col("h"))).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("kth_hash").isNull, col("nk").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            ((col("kth_hash").cast("double") + lit(9.223372036854775808e18)) /
              lit(1.8446744073709551616e19))))
    counts.join(kmv, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("est_distinct"), lit(0.0)).as("est_distinct"), col("kth_hash"))
      .orderBy("col_name")
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
