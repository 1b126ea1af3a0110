package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Write-audit-publish branching: risky ingest lands on a branch (a real
  * table dir sharing main's snapshot chain), is audited there, and
  * publishes by atomic snapshot fast-forward — or is discarded unseen. */
class BranchSpec extends AnyFunSuite {

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

  private def fresh(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft-$tag").toString + "/t"
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "v", "BIGINT"))),
      Vector("id"), buckets = 8)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 100L).map(i => (i, i * 10, i, "UPSERT"))), "seq", "op", "e-0")
    dir
  }

  private def state(dir: String): Map[Long, Long] = {
    import spark.implicits._
    IceLite.read(spark, IceLite.load(dir))
      .select("id", "v").as[(Long, Long)].collect().toMap
  }

  test("fork shares state; branch commits invisible until publish; publish fast-forwards") {
    val dir = fresh("wap")
    val mainV = IceLite.load(dir).version
    val bdir = Branch.fork(dir, "ingest")
    assert(state(bdir) == state(dir), "fork must share main's exact state")

    // risky ingest on the branch: update 3 keys, delete 1, insert 1
    Merge.mergeEpoch(spark, bdir, batch(Seq(
      (1L, 111L, 1000L, "UPSERT"), (2L, 222L, 1001L, "UPSERT"),
      (3L, 333L, 1002L, "UPSERT"), (4L, 0L, 1003L, "DELETE"),
      (500L, 5L, 1004L, "UPSERT"))), "seq", "op", "e-1")
    assert(IceLite.load(dir).version == mainV, "main must not advance")
    assert(state(dir)(1L) == 10L, "main must not see branch writes")
    assert(Branch.aheadBy(dir, "ingest") == 1)

    // audit on the branch, then publish
    assert(state(bdir)(1L) == 111L && !state(bdir).contains(4L))
    val published = Branch.publish(dir, "ingest")
    assert(published == 1)
    val after = state(dir)
    assert(after(1L) == 111L && after(2L) == 222L && after(3L) == 333L)
    assert(!after.contains(4L) && after(500L) == 5L && after.size == 100)

    // idempotent republish (crash-resume): identical links are skipped
    assert(Branch.publish(dir, "ingest") == 1)

    // discard after publish keeps main fully readable (manifests + data
    // under the branch dir survive; only the branch's snapshot chain goes)
    Branch.discard(dir, "ingest")
    assert(state(dir) == after, "main must read published data after discard")
    // and main can keep committing past the published head
    Merge.mergeEpoch(spark, dir,
      batch(Seq((600L, 6L, 2000L, "UPSERT"))), "seq", "op", "e-2")
    assert(state(dir)(600L) == 6L)
  }

  test("publish fails loudly when main advanced past the fork; main untouched") {
    val dir = fresh("wapc")
    Branch.fork(dir, "ingest")
    val bdir = Branch.branchDir(dir, "ingest")
    Merge.mergeEpoch(spark, bdir,
      batch(Seq((1L, 111L, 1000L, "UPSERT"))), "seq", "op", "e-b")
    // main advances concurrently
    Merge.mergeEpoch(spark, dir,
      batch(Seq((2L, 999L, 1001L, "UPSERT"))), "seq", "op", "e-m")
    val mainState = state(dir)
    val ex = intercept[IllegalArgumentException](Branch.publish(dir, "ingest"))
    assert(ex.getMessage.contains("publish conflict"))
    assert(state(dir) == mainState, "failed publish must leave main untouched")
    assert(state(bdir)(1L) == 111L, "branch must survive a failed publish")
    Branch.discard(dir, "ingest", force = true)
    assert(!Files.isDirectory(Paths.get(bdir)))
  }

  test("crash mid-publish resumes idempotently; discard guards unpublished work") {
    val dir = fresh("wapr")
    val bdir = Branch.fork(dir, "ingest")
    Merge.mergeEpoch(spark, bdir,
      batch(Seq((1L, 111L, 1000L, "UPSERT"))), "seq", "op", "e-1")
    Merge.mergeEpoch(spark, bdir,
      batch(Seq((2L, 222L, 1001L, "UPSERT"))), "seq", "op", "e-2")
    assert(Branch.aheadBy(dir, "ingest") == 2)

    // unpublished branch: discard without force must refuse
    val ex = intercept[IllegalArgumentException](Branch.discard(dir, "ingest"))
    assert(ex.getMessage.contains("unpublished"))

    // simulate a crash mid-publish: only the first version got linked
    val forkV = Branch.forkVersion(dir, "ingest")
    Files.createLink(IceLite.snapPath(dir, forkV + 1), IceLite.snapPath(bdir, forkV + 1))
    // main is on a complete earlier snapshot — readable, missing epoch 2
    assert(state(dir)(1L) == 111L && state(dir)(2L) == 20L)
    // re-publish resumes past the already-linked version
    assert(Branch.publish(dir, "ingest") == 2)
    assert(state(dir)(1L) == 111L && state(dir)(2L) == 222L)
  }

  test("discard at the fork point deletes the branch wholesale") {
    val dir = fresh("wapd")
    val bdir = Branch.fork(dir, "noop")
    Branch.discard(dir, "noop")
    assert(!Files.isDirectory(Paths.get(bdir)))
    assert(state(dir).size == 100)
  }

  test("branch names are validated and double-fork refuses") {
    val dir = fresh("wapn")
    intercept[IllegalArgumentException](Branch.fork(dir, "bad/name"))
    intercept[IllegalArgumentException](Branch.fork(dir, ""))
    Branch.fork(dir, "ok")
    intercept[IllegalArgumentException](Branch.fork(dir, "ok"))
  }
}
