package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Declarative audit expectations, alone and as the WAP publish gate. */
class AuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", n).build()

  private def batch(rows: Seq[(Long, String, Long, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "grp", "v", "seq", "op")
      .select(col("id").as("id", fid(1)), col("grp").as("grp", fid(2)),
        col("v").as("v", fid(3)), col("seq"), col("op"))
  }

  private def nullGrpBatch(rows: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v", "seq")
      .select(col("id").as("id", fid(1)),
        lit(null).cast("string").as("grp", fid(2)),
        col("v").as("v", fid(3)), col("seq"), lit("UPSERT").as("op"))
  }

  private def fresh(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft-$tag").toString + "/t"
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "grp", "STRING"),
      IceLite.ColDef(3, "v", "BIGINT"))), Vector("id"), buckets = 8)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 100L).map(i => (i, s"g${i % 4}", i * 10, i, "UPSERT"))),
      "seq", "op", "e-0")
    dir
  }

  private val contract = Seq(
    Audit.NotNull(Seq("grp")),
    Audit.Check("v_positive", "v >= 0"),
    Audit.Unique(Seq("id")),
    Audit.RowCount(min = 50, max = 200))

  test("a clean table passes every expectation in one pass") {
    val r = Audit.check(spark, fresh("ok"), contract)
    assert(r.passed && r.rows == 100 && r.violations.isEmpty)
  }

  test("violations are counted per expectation; NULL predicate results violate") {
    val dir = fresh("bad")
    Merge.mergeEpoch(spark, dir, nullGrpBatch(Seq((200L, 5L, 1000L), (201L, -7L, 1001L))),
      "seq", "op", "e-1")
    val r = Audit.check(spark, dir, contract)
    assert(!r.passed && r.rows == 102)
    val by = r.violations.map(v => v.expectation -> v.violations).toMap
    assert(by(("not_null(grp)")) == 2)
    assert(by(("check(v_positive)")) == 1)
    assert(!by.contains("unique(id)"), "keys stay unique post-LWW")
    // a predicate that is NULL for null grp counts as a violation
    val r2 = Audit.check(spark, dir, Seq(Audit.Check("grp_prefix", "grp LIKE 'g%'")))
    assert(r2.violations.head.violations == 2)
  }

  test("Unique counts extra copies on non-key columns") {
    val dir = fresh("uni")
    val r = Audit.check(spark, dir, Seq(Audit.Unique(Seq("grp"))))
    // 4 groups over 100 rows → 96 extra copies
    assert(r.violations == Seq(Audit.Violation("unique(grp)", 96)))
  }

  test("RowCount trips on a wiped table; empty table violates nothing else") {
    val dir = fresh("rc")
    Dml.deleteWhere(spark, dir, "true", "wipe")
    val r = Audit.check(spark, dir, contract)
    assert(r.rows == 0)
    assert(r.violations == Seq(Audit.Violation("row_count[50,200]", 0)))
  }

  test("auditAndPublish gates a WAP branch: bad branch stays unpublished, good one lands") {
    val dir = fresh("gate")
    val mainV = IceLite.load(dir).version

    // bad branch: the risky ingest nulls grp
    val bad = Branch.fork(dir, "bad")
    Merge.mergeEpoch(spark, bad, nullGrpBatch(Seq((300L, 1L, 2000L))), "seq", "op", "e-b")
    val (badReport, badPublished) = Audit.auditAndPublish(spark, dir, "bad", contract)
    assert(!badPublished && !badReport.passed)
    assert(IceLite.load(dir).version == mainV, "failed audit must not publish")
    Branch.discard(dir, "bad", force = true)

    // good branch: clean ingest publishes
    val good = Branch.fork(dir, "good")
    Merge.mergeEpoch(spark, good,
      batch(Seq((301L, "g1", 7L, 2001L, "UPSERT"))), "seq", "op", "e-g")
    val (goodReport, goodPublished) = Audit.auditAndPublish(spark, dir, "good", contract)
    assert(goodPublished && goodReport.passed && goodReport.rows == 101)
    import spark.implicits._
    assert(IceLite.read(spark, IceLite.load(dir)).where(col("id") === 301L).count() == 1)
  }
}
