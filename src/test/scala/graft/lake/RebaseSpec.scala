package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Commit rebase identity: touched-bucket conflict detection compares
  * files by PATH (their immutable identity), never by case-class equality
  * — DataFile.bloom is an Array whose equals is reference identity, so two
  * parses of the same manifest are never `==`, and a disjoint-bucket
  * rebase over bloom-bearing files would spuriously conflict (livelocking
  * maintenance under steady ingest). */
class RebaseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
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

  test("a COW commit over bloom-bearing buckets rebases past a disjoint concurrent commit") {
    val dir = Files.createTempDirectory("graft-rebase").toString + "/t"
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "v", "BIGINT"))),
      Vector("id"), buckets = 8)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 80L).map(i => (i, i * 2, i, "UPSERT"))), "seq", "op", "e-0")
    val base = IceLite.load(dir)
    val bloomy = base.files.filter(_.bloom.isDefined)
    assert(bloomy.nonEmpty, "fixture needs bloom-bearing delta files")
    val bucketA = bloomy.head.bucket
    // a key hashing to a DIFFERENT bucket — the concurrent, disjoint commit
    val otherKey = (1000L to 1100L).find(k =>
      graft.functions.XxHash64Host.bucketOf(Seq(k), base.buckets) != bucketA).get
    Merge.mergeEpoch(spark, dir, batch(Seq((otherKey, 1L, 1000L, "UPSERT"))),
      "seq", "op", "e-other")
    assert(IceLite.load(dir).version > base.version)
    // now commit from the STALE base, touching bucketA with entry-identical
    // replacements (same paths): bucketA's files did NOT change, so the
    // rebase must succeed — before the path-identity fix, the re-parsed
    // bloom arrays made the file sets compare unequal and this threw
    val aFiles = base.files.filter(_.bucket == bucketA)
    val committed = IceLite.commit(dir, base, IceLite.CommitDelta(
      "cow-a", Set(bucketA), aFiles, base.currentSchema, maxSeq = base.maxSeq))
    assert(committed.hasEpoch("cow-a") && committed.hasEpoch("e-other"),
      "both commits must land")
    // and the table still reads whole: 80 original keys + the other key
    assert(IceLite.read(spark, committed).count() == 81)
  }
}
