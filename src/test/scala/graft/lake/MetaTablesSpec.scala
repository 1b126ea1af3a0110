package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Metadata inspection tables: snapshot state as queryable DataFrames,
  * built without data-file reads. */
class MetaTablesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", n).build()

  private def batch(rows: Seq[(Long, Long, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v", "seq", "op")
      .select(col("id").as("id", fid(1)), col("v").as("v", fid(2)),
        col("seq"), col("op"))
  }

  test("files/history/manifests/epochs agree with the snapshot") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-meta").toString + "/t"
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "v", "BIGINT"))),
      Vector("id"), buckets = 4)
    Merge.mergeEpoch(spark, dir, batch((1L to 100L).map(i => (i, i, i, "UPSERT"))),
      "seq", "op", "e-0")
    Merge.mergeEpoch(spark, dir, batch(Seq((1L, 9L, 200L, "UPSERT"))),
      "seq", "op", "e-1")
    val snap = IceLite.load(dir)

    val files = MetaTables.files(spark, dir)
    assert(files.count() == snap.files.size)
    assert(files.agg(sum("rows")).head().getLong(0) == snap.files.map(_.rows).sum)
    assert(files.select("bucket").distinct().count() <= snap.buckets)

    val hist = MetaTables.history(spark, dir)
    val histRows = hist.orderBy("version")
      .select("version", "files", "applied_epochs")
      .as[(Int, Long, Long)].collect()
    assert(histRows.map(_._1).toVector == IceLite.history(dir))
    assert(histRows.last._2 == snap.files.size.toLong,
      "history file counts must come from manifest fileCounts, matching the loaded snapshot")
    assert(histRows.last._3 == 2L, "two applied epochs at head")
    assert(histRows.head._3 == 0L, "create snapshot has no epochs")

    val mans = MetaTables.manifests(spark, dir)
    assert(mans.count() == snap.manifests.size)
    assert(mans.agg(sum("file_count")).head().getLong(0) == snap.files.size.toLong)

    // files-table time travel: the v1 layout differs from head
    val v1Files = MetaTables.files(spark, dir, Some(1))
    assert(v1Files.count() == IceLite.loadVersion(dir, 1).files.size)

    val eps = MetaTables.epochs(spark, dir)
    val row = eps.where(col("namespace") === "e").head()
    assert(row.getLong(1) == 1L, "e-0,e-1 contiguous → watermark 1")
    assert(row.getLong(2) == 0L)
  }
}
