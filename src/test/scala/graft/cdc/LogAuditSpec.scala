package graft.cdc

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Transport-integrity audit: gap ranges, duplicate deliveries, and the
  * partition summary's implied-missing reconciliation — on hand-built
  * offset sequences where every expected row is known exactly. */
class LogAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("gap ranges: adjacent holes coalesce, boundaries are exact") {
    // partition 0: offsets 0,1,2,   5,6,   9  → gaps [3,4] and [7,8]
    // partition 1: dense 10..13               → no gaps
    val log = Seq(
      (0, 0L), (0, 1L), (0, 2L), (0, 5L), (0, 6L), (0, 9L),
      (1, 10L), (1, 11L), (1, 12L), (1, 13L))
      .toDF("partition", "offset")
    val rows = LogAudit.auditOffsets(log)
      .orderBy("partition", "off_start")
      .as[(Int, String, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((0, "gap", 3L, 4L, 2L), (0, "gap", 7L, 8L, 2L)))
  }

  test("dups reported per offset with delivery count; not misread as gaps") {
    // offset 4 delivered 3x, offset 6 twice; the sequence 3..7 is dense, so
    // the duplicated offsets must NOT produce zero-width gap rows
    val log = Seq((0, 3L), (0, 4L), (0, 4L), (0, 4L), (0, 5L), (0, 6L), (0, 6L), (0, 7L))
      .toDF("partition", "offset")
    val rows = LogAudit.auditOffsets(log)
      .orderBy("off_start")
      .as[(Int, String, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((0, "dup", 4L, 4L, 3L), (0, "dup", 6L, 6L, 2L)))
  }

  test("partition summary reconciles with gap totals; dups don't inflate it") {
    val log = Seq(
      (0, 0L), (0, 1L), (0, 1L), (0, 4L), // dup at 1, gap [2,3]
      (1, 7L), (1, 9L)) // gap [8,8]
      .toDF("partition", "offset")
    val sum = LogAudit.partitionSummary(log)
      .orderBy("partition")
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(sum == Seq((0, 0L, 4L, 4L, 3L, 2L), (1, 7L, 9L, 2L, 2L, 1L)))
    val gapTotal = LogAudit.auditOffsets(log)
      .filter($"kind" === "gap").agg(org.apache.spark.sql.functions.sum("n"))
      .head().getLong(0)
    assert(gapTotal == 3L) // 2 + 1, equals summary's implied missing
  }

  test("clean log audits empty") {
    val log = (0L to 99L).map(o => (0, o)).toDF("partition", "offset")
    assert(LogAudit.auditOffsets(log).isEmpty)
  }
}
