package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Shallow clone: hard-linked zero-copy fork, independent evolution in
  * both directions, link-pinned bytes across source vacuum, carried
  * ledger fencing, version-prefix forks. */
class CloneSpec extends AnyFunSuite {

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

  private def mkTable(dir: String): Unit =
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "v", "BIGINT"))),
      Vector("id"), buckets = 4)

  private def state(dir: String): Map[Long, Long] =
    IceLite.read(spark, IceLite.load(dir)).select("id", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("fork diverges; source history and bytes untouched; links not copies") {
    val root = Files.createTempDirectory("graft-clone").toString
    val src = s"$root/src"; val fork = s"$root/fork"
    mkTable(src)
    Merge.mergeEpoch(spark, src,
      batch((1L to 100L).map(i => (i, i, i, "UPSERT"))), "seq", "op", "e-0")
    val pre = state(src)
    val preVer = IceLite.load(src).version

    IceLite.cloneTable(src, fork)
    def ino(p: String) = Files.getAttribute(Paths.get(p), "unix:ino")
    val srcInos = IceLite.load(src).files.map(f => ino(f.path)).toSet
    assert(IceLite.load(fork).files.nonEmpty)
    assert(IceLite.load(fork).files.forall(f => srcInos(ino(f.path))),
      "cloned files must share source inodes (zero copy)")
    assert(state(fork) == pre)

    // fork writes; source must not move
    Merge.mergeEpoch(spark, fork,
      batch(Seq((1L, 999L, 200L, "UPSERT"), (2L, 0L, 201L, "DELETE"))),
      "seq", "op", "e-1")
    assert(state(fork)(1L) == 999L && !state(fork).contains(2L))
    assert(state(src) == pre && IceLite.load(src).version == preVer)

    // source writes after the fork; fork must not move
    Merge.mergeEpoch(spark, src,
      batch(Seq((3L, 777L, 300L, "UPSERT"))), "seq", "op", "e-2")
    assert(state(src)(3L) == 777L)
    assert(state(fork)(3L) == 3L)
  }

  test("carried ledger fences: re-applying a source epoch on the fork is a no-op") {
    val root = Files.createTempDirectory("graft-clone").toString
    val src = s"$root/src"; val fork = s"$root/fork"
    mkTable(src)
    val e0 = batch((1L to 50L).map(i => (i, i, i, "UPSERT")))
    Merge.mergeEpoch(spark, src, e0, "seq", "op", "e-0")
    IceLite.cloneTable(src, fork)
    Merge.mergeEpoch(spark, fork, e0, "seq", "op", "e-0") // fenced
    assert(IceLite.load(fork).version == 0,
      "a fenced epoch must not commit a new fork version")
    Merge.mergeEpoch(spark, fork,
      batch(Seq((51L, 51L, 100L, "UPSERT"))), "seq", "op", "e-1")
    assert(IceLite.load(fork).version == 1 && state(fork)(51L) == 51L)
  }

  test("source compact + vacuum cannot break the fork: links pin the bytes") {
    val root = Files.createTempDirectory("graft-clone").toString
    val src = s"$root/src"; val fork = s"$root/fork"
    mkTable(src)
    Merge.mergeEpoch(spark, src,
      batch((1L to 80L).map(i => (i, i, i, "UPSERT"))), "seq", "op", "e-0")
    IceLite.cloneTable(src, fork)
    val want = state(fork)
    // source rewrites everything, expires history, vacuums old files
    Merge.mergeEpoch(spark, src,
      batch((1L to 80L).map(i => (i, i * 10, 100 + i, "UPSERT"))), "seq", "op", "e-1")
    Compaction.compact(spark, src, "maint")
    Compaction.expire(src, keepLast = 1)
    Compaction.vacuum(src, olderThanMs = 0L)
    assert(state(src)(1L) == 10L)
    assert(state(fork) == want,
      "the fork must keep serving the fork-point state after source vacuum")
  }

  test("version-prefix clone forks an older snapshot; target-exists refused") {
    val root = Files.createTempDirectory("graft-clone").toString
    val src = s"$root/src"; val fork = s"$root/fork"
    mkTable(src)
    Merge.mergeEpoch(spark, src,
      batch((1L to 20L).map(i => (i, i, i, "UPSERT"))), "seq", "op", "e-0")
    Merge.mergeEpoch(spark, src,
      batch(Seq((1L, 42L, 100L, "UPSERT"))), "seq", "op", "e-1")
    IceLite.cloneTable(src, fork, version = Some(1)) // pre-e-1 snapshot
    assert(state(fork)(1L) == 1L, "prefix clone serves the fork-point state")
    val ex = intercept[IllegalArgumentException] {
      IceLite.cloneTable(src, fork)
    }
    assert(ex.getMessage.contains("already a table"))
  }
}
