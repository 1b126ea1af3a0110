package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Inspection surfaces (the Iceberg `table$files` / `table$history` /
  * `table$manifests` idea): snapshot metadata exposed as DataFrames so
  * operators can query table health with plain SQL — file-size skew,
  * delta accumulation per bucket, manifest growth, epoch throughput —
  * without touching any data file.
  *
  * Everything is built from the snapshot JSON + manifest refs already in
  * memory: `history` sums the per-manifest fileCounts instead of opening
  * manifests, so a 10^6-file table answers from O(versions × ranges)
  * driver-side rows, never a data scan. */
object MetaTables {

  /** One row per live data file of the current (or given) snapshot. */
  def files(spark: SparkSession, dir: String, version: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val snap = version.map(IceLite.loadVersion(dir, _)).getOrElse(IceLite.load(dir))
    snap.files.map { f =>
      (f.path, f.bucket, f.rows, f.schemaVersion, f.delta,
        if (f.minSeq == Long.MinValue) None else Some(f.minSeq),
        if (f.maxSeq == Long.MaxValue) None else Some(f.maxSeq),
        f.bloom.isDefined, f.sortCol,
        if (f.colBounds.isEmpty) None else Some(f.colBounds.keys.toSeq.sorted.mkString(",")))
    }.toDF("path", "bucket", "rows", "schema_version", "delta",
      "min_seq", "max_seq", "has_key_bloom", "sort_col", "zorder_cols")
  }

  /** One row per retained snapshot version — no manifest or data reads. */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    IceLite.history(dir).map { v =>
      val s = IceLite.loadVersionMeta(dir, v)
      (v, s.maxSeq, s.buckets, s.manifests.size, s.manifests.map(_.fileCount.toLong).sum,
        s.schemas.size - 1, s.ledger.count, s.indexedCols.toSeq.sorted.mkString(","))
    }.toDF("version", "max_seq", "buckets", "manifests", "files",
      "schema_version", "applied_epochs", "indexed_cols")
  }

  /** One row per live manifest of the current snapshot. */
  def manifests(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    IceLite.load(dir).manifests.map(m => (m.path, m.range, m.fileCount))
      .toDF("path", "range", "file_count")
  }

  /** One row per applied epoch namespace: the exactly-once fence state. */
  def epochs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val led = IceLite.load(dir).ledger
    led.namespaces.toSeq.sorted.map { ns =>
      (ns, led.watermarks.getOrElse(ns, -1L),
        led.recent.getOrElse(ns, Set.empty).size.toLong)
    }.toDF("namespace", "watermark", "recent_above_watermark")
  }
}
