package graft.lake

import org.apache.spark.sql.types._

/** Metadata-only aggregates — answer `count(*)`, per-bucket row counts, and
  * numeric `min`/`max` from the SNAPSHOT alone (manifest stats recorded at
  * commit time by [[IceLite.scanEpochFiles]]), with zero Spark jobs and zero
  * data-file reads. At the 100 TB design point this is the difference
  * between a sub-millisecond driver answer and a full-table scan: Iceberg
  * serves the same queries from its manifests, and the planner's row-count /
  * NDV estimates ride the same numbers.
  *
  * Every method returns `Option` — `None` means "the metadata cannot prove
  * the answer, run the scan" (the caller falls back to [[IceLite.read]]),
  * never a wrong number. The preconditions:
  *
  *  - NO DELTA FILES anywhere: a merge-on-read delta row may supersede any
  *    base row, so both the live count and the extremes of the base files
  *    are unverifiable without resolution. A delta-free snapshot (every
  *    bucket compacted, the steady state after [[Compaction.compact]]) has
  *    exactly one fold-resolved row per key across its base files.
  *  - count: every file's exact tombstone count known
  *    ([[IceLite.DataFile.delRows]] ≥ 0 — recorded since the metadata-
  *    aggregate round; legacy manifests answer `None` until a compaction
  *    rewrites them). Retained tombstones (kept for change-feed consumers)
  *    do NOT force a scan: live = rows − delRows.
  *  - min/max: NUMERIC columns only. String footer stats may be truncated
  *    by the parquet writer (truncation keeps them sound as PRUNING bounds,
  *    which is what [[IceLite.rangeFilesMulti]] uses them for, but not as
  *    exact extremes). Contributing files must also be TOMBSTONE-FREE
  *    (delRows = 0): a tombstone row keeps the DELETE event's decoded
  *    column values (proto3 defaults for absent fields — 0, "" — are real
  *    stored values, change-feed-visible), so a file with tombstones has
  *    footer bounds polluted by values no live row holds. The steady state
  *    after `expire` + [[Compaction.compact]] purges consumed tombstones
  *    and re-records bounds, so a fully-maintained table answers; anything
  *    short of that answers `None`. A file whose live rows are all NULL in
  *    the column has no bounds and conservatively answers `None`. After a
  *    column RENAME, bounds recorded under the old name are not consulted
  *    (`None` until a compaction re-records them under the current name).
  */
object MetaAgg {

  /** Exact live row count (tombstones excluded) from the manifest, or
    * `None` when a delta file or an unknown tombstone count makes the
    * metadata inconclusive. */
  def liveCount(snap: IceLite.Snapshot): Option[Long] =
    if (snap.files.forall(f => !f.delta && f.liveRows >= 0))
      Some(snap.files.iterator.map(_.liveRows).sum)
    else None

  /** Exact live rows per bucket — the skew diagnostic for a 10^5-bucket
    * table (which buckets outgrew the layout?) without touching data. Same
    * preconditions as [[liveCount]]; buckets with no files report 0. */
  def bucketLiveRows(snap: IceLite.Snapshot): Option[Map[Int, Long]] =
    liveCount(snap).map { _ =>
      val byBucket = snap.files.groupBy(_.bucket).view
        .mapValues(_.iterator.map(_.liveRows).sum).toMap
      (0 until snap.buckets).map(b => b -> byBucket.getOrElse(b, 0L)).toMap
    }

  /** Exact (min, max) of a NUMERIC column over the live rows, typed per the
    * declared schema, or `None` when any file with (possibly) live rows
    * lacks recorded bounds for the column — or the column is non-numeric,
    * where footer truncation could make a "bound" inexact. */
  def minMax(snap: IceLite.Snapshot, colName: String): Option[(Any, Any)] = {
    val cd = snap.currentSchema.find(_.name == colName).getOrElse(return None)
    val parse: String => Any = cd.sparkType match {
      case LongType => _.toLong
      case IntegerType => _.toInt
      case ShortType => _.toShort
      case DoubleType => _.toDouble
      case FloatType => _.toFloat
      case _ => return None
    }
    val cmp: (String, String) => Int = cd.sparkType match {
      case DoubleType | FloatType => (a, b) => java.lang.Double.compare(a.toDouble, b.toDouble)
      case _ => (a, b) => java.lang.Long.compare(a.toLong, b.toLong)
    }
    if (snap.files.exists(_.delta)) return None
    // a file participates unless provably free of live rows; every
    // participant must be tombstone-free (bounds = live bounds) and carry
    // real recorded bounds for the column
    val contributing = snap.files.filter(_.liveRows != 0L)
    if (contributing.isEmpty) return None
    if (!contributing.forall(f =>
        f.rows >= 0 && f.delRows == 0L && f.colBounds.contains(colName))) return None
    val lo = contributing.map(_.colBounds(colName)._1).min(Ordering.comparatorToOrdering(
      (a: String, b: String) => cmp(a, b)))
    val hi = contributing.map(_.colBounds(colName)._2).max(Ordering.comparatorToOrdering(
      (a: String, b: String) => cmp(a, b)))
    Some((parse(lo), parse(hi)))
  }
}
