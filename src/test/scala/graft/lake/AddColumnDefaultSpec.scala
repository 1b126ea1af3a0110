package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ADD COLUMN WITH DEFAULT (IceLite.addColumn, q110): metadata-only DDL;
  * pre-existing files read the default, later batches lacking the column
  * are filled with it at write time (rewrite-stable), explicit NULLs are
  * preserved — the default is an absence rule, not a read-time coalesce. */
class AddColumnDefaultSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", n).build()

  private def batchNoTier(rows: Seq[(Long, String, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v", "seq", "op")
      .select(col("id").as("id", fid(1)), col("v").as("v", fid(2)),
        col("seq"), col("op"))
  }

  private def batchWithTier(rows: Seq[(Long, String, String, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v", "tier", "seq", "op")
      .select(col("id").as("id", fid(1)), col("v").as("v", fid(2)),
        col("tier").as("tier", fid(3)), col("seq"), col("op"))
  }

  private def fresh(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft-$tag").toString + "/t"
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "v", "STRING"))),
      Vector("id"), buckets = 4)
    Merge.mergeEpoch(spark, dir,
      batchNoTier((1L to 20L).map(i => (i, s"v$i", i, "UPSERT"))),
      "seq", "op", "e-0")
    dir
  }

  private def tiers(dir: String): Map[Long, String] = {
    import spark.implicits._
    IceLite.read(spark, IceLite.load(dir))
      .select("id", "tier").as[(Long, Option[String])].collect()
      .map { case (i, t) => i -> t.orNull }.toMap
  }

  test("old files read the default; AS OF pre-DDL has no column; fenced") {
    val dir = fresh("d1")
    val preV = IceLite.load(dir).version
    IceLite.addColumn(dir, "ddl-0", "tier", "STRING", 3, Some("bronze"))
    IceLite.addColumn(dir, "ddl-0", "tier", "STRING", 3, Some("bronze")) // fence: no-op
    assert(tiers(dir).values.toSet === Set("bronze"))
    val travel = IceLite.loadVersion(dir, preV)
    assert(!travel.currentSchema.exists(_.name == "tier"))
    assert(!IceLite.read(spark, travel).columns.contains("tier"))
  }

  test("later batches lacking the column are filled at write (rewrite-stable)") {
    val dir = fresh("d2")
    IceLite.addColumn(dir, "ddl-0", "tier", "STRING", 3, Some("bronze"))
    Merge.mergeEpoch(spark, dir,
      batchNoTier(Seq((21L, "new", 100L, "UPSERT"), (1L, "over", 101L, "UPSERT"))),
      "seq", "op", "e-1")
    val t = tiers(dir)
    assert(t(21L) === "bronze" && t(1L) === "bronze")
    // compaction must not flip any value: the fill happened at write time
    Compaction.compact(spark, dir, "cmp-0")
    assert(tiers(dir).values.toSet === Set("bronze"))
  }

  test("explicit values and explicit NULLs in a tier-carrying batch are preserved") {
    val dir = fresh("d3")
    IceLite.addColumn(dir, "ddl-0", "tier", "STRING", 3, Some("bronze"))
    Merge.mergeEpoch(spark, dir,
      batchWithTier(Seq((1L, "x", "gold", 100L, "UPSERT"),
        (2L, "y", null, 101L, "UPSERT"))), "seq", "op", "e-1")
    val t = tiers(dir)
    assert(t(1L) === "gold")
    assert(t(2L) === null) // explicit NULL stays NULL — not coalesced
    assert(t(3L) === "bronze")
  }

  test("non-string default casts to the declared type; bad default refused") {
    val dir = fresh("d4")
    IceLite.addColumn(dir, "ddl-n", "score", "BIGINT", 4, Some("7"))
    import spark.implicits._
    val s = IceLite.read(spark, IceLite.load(dir))
      .select("score").as[Long].collect().toSet
    assert(s === Set(7L))
    val e = intercept[IllegalArgumentException] {
      IceLite.addColumn(dir, "ddl-bad", "n", "BIGINT", 5, Some("not-a-number"))
    }
    assert(e.getMessage.contains("does not cast"))
  }

  test("name/id collisions and retired ids are refused") {
    val dir = fresh("d5")
    intercept[IllegalArgumentException] {
      IceLite.addColumn(dir, "ddl-a", "v", "STRING", 9)
    }
    intercept[IllegalArgumentException] {
      IceLite.addColumn(dir, "ddl-b", "other", "STRING", 2)
    }
    IceLite.dropColumn(dir, "ddl-drop", "v")
    intercept[IllegalArgumentException] {
      IceLite.addColumn(dir, "ddl-c", "v2", "STRING", 2) // id 2 retired
    }
  }

  test("reusing a dropped name over stale per-file bounds is refused until compaction clears them") {
    val dir = fresh("addcol-stale")
    Merge.mergeEpoch(spark, dir,
      batchNoTier((1L to 40L).map(i => (i, f"s$i%03d", i, "UPSERT"))),
      "seq", "op", "e-1")
    // cluster-compact by v: files now carry sortCol/sortMin/sortMax for 'v'
    Compaction.compact(spark, dir, "maint-c", clusterBy = Some("v"))
    assert(IceLite.load(dir).files.exists(_.sortCol.contains("v")))
    IceLite.dropColumn(dir, "ddl-drop-v", "v")
    // bounds are keyed by NAME: a new column called 'v' would range-prune
    // (and MetaAgg-serve) with the DEAD column's extremes — refused
    val ex = intercept[IllegalArgumentException] {
      IceLite.addColumn(dir, "ddl-readd", "v", "STRING", 9)
    }
    assert(ex.getMessage.contains("bounds"), ex.getMessage)
    // renameColumn INTO the stale name refuses for the same reason
    IceLite.addColumn(dir, "ddl-w", "w", "STRING", 10)
    val ex2 = intercept[IllegalArgumentException] {
      IceLite.renameColumn(dir, "ddl-rn", "w", "v")
    }
    assert(ex2.getMessage.contains("bounds"), ex2.getMessage)
    // a compaction rewrites the files from post-drop data — no 'v' bounds
    // survive, and the re-add proceeds with its default intact
    Compaction.compact(spark, dir, "maint-c2")
    assert(IceLite.load(dir).files.forall(f =>
      !f.sortCol.contains("v") && !f.colBounds.contains("v")))
    IceLite.addColumn(dir, "ddl-readd2", "v", "STRING", 11, default = Some("dflt"))
    assert(IceLite.read(spark, IceLite.load(dir))
      .filter(col("v") === "dflt").count() == 40)
  }
}
