package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Multi-dimensional (z-order) clustering compaction: per-file bounds on
  * every dimension, ANDed range pruning, soundness under stale deltas. */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", n).build()

  private def batch(rows: Seq[(Long, Long, Double, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "x", "y", "seq", "op")
      .select(col("id").as("id", fid(1)), col("x").as("x", fid(2)),
        col("y").as("y", fid(3)), col("seq"), col("op"))
  }

  private def rows(n: Int): Seq[(Long, Long, Double, Long, String)] =
    (1 to n).map { i =>
      (i.toLong, (i % 100).toLong, ((i * 37) % 1000) / 2.0, i.toLong, "UPSERT")
    }

  private def fresh(tag: String, n: Int = 4000): String = {
    val dir = Files.createTempDirectory(s"graft-$tag").toString + "/t"
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "x", "BIGINT"),
      IceLite.ColDef(3, "y", "DOUBLE"))), Vector("id"), buckets = 4)
    Merge.mergeEpoch(spark, dir, batch(rows(n)), "seq", "op", "e-0")
    dir
  }

  test("z-order compaction: ANDed range read ≡ plain filter, with real file skipping") {
    val dir = fresh("z")
    Compaction.compact(spark, dir, "z-0", zorderBy = Seq("x", "y"), filesPerBucket = 8)
    val snap = IceLite.load(dir)
    assert(snap.files.forall(f => f.colBounds.keySet == Set("x", "y")),
      "every z-ordered file must record bounds for both dimensions")

    val preds = Seq[(String, Any, Any)](("x", 10L, 29L), ("y", 100.0, 199.5))
    val total = snap.files.size
    val kept = IceLite.rangeFilesMulti(snap, preds).size
    assert(total >= 16, s"expected a multi-file layout, got $total")
    assert(kept <= total / 2,
      s"2D box covering ~4% of the space must skip most files: kept $kept of $total")

    import spark.implicits._
    val got = IceLite.readRangeMulti(spark, snap, preds)
      .select("id").as[Long].collect().toSet
    val want = IceLite.read(spark, snap)
      .where(col("x").between(10, 29) && col("y").between(100.0, 199.5))
      .select("id").as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("single-dimension predicates prune via colBounds too") {
    val dir = fresh("z1")
    Compaction.compact(spark, dir, "z-0", zorderBy = Seq("x", "y"), filesPerBucket = 8)
    val snap = IceLite.load(dir)
    val keptX = IceLite.rangeFiles(snap, "x", 0L, 9L).size
    val keptY = IceLite.rangeFiles(snap, "y", 0.0, 49.5).size
    assert(keptX < snap.files.size && keptY < snap.files.size,
      s"each dimension must prune alone: x kept $keptX, y kept $keptY of ${snap.files.size}")
  }

  test("stale low-seq delta disables skipping in its bucket (no lost rows)") {
    val dir = fresh("zguard")
    Compaction.compact(spark, dir, "z-0", zorderBy = Seq("x", "y"), filesPerBucket = 8)
    // a LATE event: seq below the compacted base's maxSeq, value inside the
    // query box, key previously outside it — skipping its bucket's base
    // files could let the stale pre-image win or lose the row entirely
    Merge.mergeEpoch(spark, dir, batch(Seq((4001L, 15L, 150.0, 1L, "UPSERT"))),
      "seq", "op", "e-late", deltaThreshold = 100)
    val snap = IceLite.load(dir)
    import spark.implicits._
    val got = IceLite.readRangeMulti(spark, snap,
      Seq[(String, Any, Any)](("x", 10L, 29L), ("y", 100.0, 199.5)))
      .select("id").as[Long].collect().toSet
    assert(got.contains(4001L), "late row inside the box must be read")
    val want = IceLite.read(spark, snap)
      .where(col("x").between(10, 29) && col("y").between(100.0, 199.5))
      .select("id").as[Long].collect().toSet
    assert(got == want)
  }

  test("colBounds survive snapshot JSON round-trip and time travel") {
    val dir = fresh("zjson", n = 500)
    Compaction.compact(spark, dir, "z-0", zorderBy = Seq("x", "y"), filesPerBucket = 4)
    val v = IceLite.load(dir).version
    val reloaded = IceLite.loadVersion(dir, v)
    assert(reloaded.files.exists(_.colBounds.nonEmpty))
    val f = reloaded.files.find(_.colBounds.nonEmpty).get
    val (mn, mx) = f.colBounds("x")
    assert(mn.toLong <= mx.toLong)
  }

  test("validation: z-order needs 2+ numeric visible columns, not with clusterBy") {
    val dir = fresh("zval", n = 100)
    intercept[IllegalArgumentException](
      Compaction.compact(spark, dir, "bad-0", zorderBy = Seq("x")))
    intercept[IllegalArgumentException](
      Compaction.compact(spark, dir, "bad-1", zorderBy = Seq("x", "nope")))
    intercept[IllegalArgumentException](
      Compaction.compact(spark, dir, "bad-2", clusterBy = Some("x"), zorderBy = Seq("x", "y")))
    intercept[IllegalArgumentException](
      Compaction.compact(spark, dir, "bad-3", zorderBy = Seq("x", IceLite.SeqCol.name)))
  }
}
