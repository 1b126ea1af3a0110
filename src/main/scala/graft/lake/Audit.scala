package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the AUDIT step of
  * write-audit-publish made a first-class API (the Delta Live Tables /
  * Great Expectations shape, re-expressed as one Spark aggregate):
  * a staged branch is checked against the table's contract and publishes
  * only when every expectation holds.
  *
  * Cost model: ALL expectations evaluate in ONE pass over the table — a
  * single aggregate of conditional counts (plus one extra aggregate per
  * Unique constraint, which needs its own grouping). No per-expectation
  * scans, no driver-side row iteration; at 100 TB an audit costs one scan
  * regardless of how many checks it carries. */
object Audit {

  sealed trait Expectation { def label: String }
  /** every listed column must be non-null. */
  final case class NotNull(cols: Seq[String]) extends Expectation {
    def label = s"not_null(${cols.mkString(",")})"
  }
  /** the column tuple must be unique across the table (post-LWW state). */
  final case class Unique(cols: Seq[String]) extends Expectation {
    def label = s"unique(${cols.mkString(",")})"
  }
  /** an arbitrary SQL predicate every row must satisfy (NULL counts as a
    * violation — an unknown is not a pass). */
  final case class Check(name: String, predicate: String) extends Expectation {
    def label = s"check($name)"
  }
  /** row count must stay within [min, max] (Long.MaxValue = unbounded) —
    * the "did the risky ingest wipe or explode the table" tripwire. */
  final case class RowCount(min: Long, max: Long = Long.MaxValue) extends Expectation {
    def label = s"row_count[$min,${if (max == Long.MaxValue) "∞" else max}]"
  }

  final case class Violation(expectation: String, violations: Long)
  final case class Report(rows: Long, violations: Seq[Violation]) {
    def passed: Boolean = violations.isEmpty
  }

  /** Evaluate expectations against the table's CURRENT state. */
  def check(spark: SparkSession, dir: String, expectations: Seq[Expectation]): Report =
    checkFrame(spark, IceLite.read(spark, IceLite.load(dir)), expectations)

  /** Evaluate against any frame (a branch read, a pre-publish diff, …). */
  def checkFrame(spark: SparkSession, df: DataFrame,
      expectations: Seq[Expectation]): Report = {
    val flat = expectations.filter(!_.isInstanceOf[Unique])
    // one conditional-count aggregate for every non-Unique expectation
    val aggs = count(lit(1)).as("__rows") +: flat.zipWithIndex.map {
      case (NotNull(cols), i) =>
        val anyNull = cols.map(col(_).isNull).reduce(_ || _)
        // coalesce: sum over an EMPTY table is NULL, and zero rows violate nothing
        coalesce(sum(when(anyNull, 1L).otherwise(0L)), lit(0L)).as(s"__e$i")
      case (Check(_, pred), i) =>
        coalesce(sum(when(!coalesce(expr(pred), lit(false)), 1L).otherwise(0L)), lit(0L)).as(s"__e$i")
      case (_: RowCount, i) => lit(0L).as(s"__e$i") // derived from __rows below
      case (u, _) => throw new IllegalStateException(s"unexpected $u")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getLong(0)
    val flatViolations = flat.zipWithIndex.flatMap {
      case (rc: RowCount, _) =>
        if (rows < rc.min || rows > rc.max) Some(Violation(rc.label, rows)) else None
      case (e, i) =>
        val n = row.getLong(i + 1)
        if (n > 0) Some(Violation(e.label, n)) else None
    }
    val uniqueViolations = expectations.collect { case u @ Unique(cols) =>
      val dupes = df.groupBy(cols.map(col): _*).count().where(col("count") > 1)
        .agg(coalesce(sum(col("count") - 1), lit(0L))).head().getLong(0)
      if (dupes > 0) Some(Violation(u.label, dupes)) else None
    }.flatten
    Report(rows, flatViolations ++ uniqueViolations)
  }

  /** Audit a WAP branch and publish it only if every expectation holds:
    * the gate between Branch.fork and Branch.publish. Returns the report
    * and whether a publish happened; a failed audit leaves BOTH main and
    * the branch untouched (the caller decides between fixing and
    * discarding). */
  def auditAndPublish(spark: SparkSession, dir: String, name: String,
      expectations: Seq[Expectation]): (Report, Boolean) = {
    val bdir = Branch.branchDir(dir, name)
    val report = check(spark, bdir, expectations)
    if (report.passed) { Branch.publish(dir, name); (report, true) }
    else (report, false)
  }
}
