package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Metadata-only aggregates (count / per-bucket counts / numeric min-max
  * from the manifest alone) and snapshot TAGS as retention roots. */
class MetaAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", n).build()

  private def batch(rows: Seq[(Long, Long, String, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v", "s", "seq", "op")
      .select(col("id").as("id", fid(1)), col("v").as("v", fid(2)),
        col("s").as("s", fid(3)), col("seq"), col("op"))
  }

  private def mkTable(dir: String): Unit =
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "v", "BIGINT"),
      IceLite.ColDef(3, "s", "STRING"))), Vector("id"), buckets = 4)

  test("liveCount/minMax follow the maintenance lifecycle exactly") {
    val dir = Files.createTempDirectory("graft-metaagg").toString + "/t"
    mkTable(dir)
    // e-0: 200 upserts; e-1: 20 deletes (with non-null column values — the
    // pollution the tombstone-free precondition exists for) + 1 update
    Merge.mergeEpoch(spark, dir,
      batch((1L to 200L).map(i => (i, i * 10, s"str$i", i, "UPSERT"))),
      "seq", "op", "e-0")
    Merge.mergeEpoch(spark, dir,
      batch((1L to 20L).map(i => (i, 999L, "zzz", 1000 + i, "DELETE")) :+
        (21L, 777L, "upd", 2000L, "UPSERT")),
      "seq", "op", "e-1")

    val afterMerge = IceLite.load(dir)
    assert(afterMerge.files.exists(_.delta), "merge epochs leave delta files")
    assert(MetaAgg.liveCount(afterMerge).isEmpty, "delta files → metadata inconclusive")
    assert(MetaAgg.minMax(afterMerge, "v").isEmpty)

    // first compaction: expire has NOT run, so the tombstone watermark is
    // v0's -1 and every tombstone is retained — count answers (rows −
    // delRows), min/max must refuse (bounds polluted by tombstone values)
    Compaction.compact(spark, dir, "maint-1")
    val s1 = IceLite.load(dir)
    assert(s1.files.forall(f => !f.delta && f.delRows >= 0))
    assert(s1.files.map(_.delRows).sum == 20L, "exact tombstone counts recorded")
    assert(MetaAgg.liveCount(s1).contains(180L))
    assert(MetaAgg.liveCount(s1).get == IceLite.read(spark, s1).count())
    assert(MetaAgg.minMax(s1, "v").isEmpty,
      "tombstones carry stored values (999) → bounds are not live bounds")
    val byBucket = MetaAgg.bucketLiveRows(s1).get
    assert(byBucket.size == 4 && byBucket.values.sum == 180L)

    // expire + recompact: watermark advances past every tombstone, the
    // rewrite purges them, bounds become live-exact
    Compaction.expire(dir, keepLast = 1)
    Compaction.compact(spark, dir, "maint-2")
    val s2 = IceLite.load(dir)
    assert(s2.files.forall(f => !f.delta && f.delRows == 0L))
    assert(MetaAgg.liveCount(s2).contains(180L))
    assert(MetaAgg.minMax(s2, "v").contains((220L, 2000L)),
      s"live v ∈ {777} ∪ {220..2000}: got ${MetaAgg.minMax(s2, "v")}")
    // cross-check against the scan the metadata answer replaces
    val r = IceLite.read(spark, s2).agg(min("v"), max("v"), count(lit(1))).head()
    assert((r.getLong(0), r.getLong(1)) == MetaAgg.minMax(s2, "v").get)
    assert(r.getLong(2) == MetaAgg.liveCount(s2).get)

    assert(MetaAgg.minMax(s2, "s").isEmpty, "strings may be truncated → refused")
    assert(MetaAgg.minMax(s2, "nope").isEmpty, "unknown column")
    // legacy manifests (no delRows recorded) answer None, never a guess
    val legacy = s2.copy(files = s2.files.map(_.copy(delRows = -1L)))
    assert(MetaAgg.liveCount(legacy).isEmpty)
  }

  test("string bounds are truncated Iceberg-style but stay sound") {
    assert(IceLite.truncateLower("a" * 100) == "a" * 32)
    assert(IceLite.truncateUpper("a" * 100).contains("a" * 31 + "b"))
    assert(IceLite.truncateUpper("short").contains("short"))
    assert(IceLite.truncateLower("short") == "short")
    // un-bumpable prefix (all chars at/above the surrogate floor) → no bound
    assert(IceLite.truncateUpper("\uE000" * 40).isEmpty)
    // dangling high surrogate at the cut is dropped from the lower bound
    val emoji = "x" * 31 + "😀" + "y" * 10
    assert(IceLite.truncateLower(emoji) == "x" * 31)

    val dir = Files.createTempDirectory("graft-metaagg-trunc").toString + "/t"
    mkTable(dir)
    val longs = (1L to 50L).map(i => (i, i, f"prefix-$i%03d-" + ("k" * 90), i, "UPSERT"))
    Merge.mergeEpoch(spark, dir, batch(longs), "seq", "op", "e-0")
    Compaction.compact(spark, dir, "maint")
    val snap = IceLite.load(dir)
    val withS = snap.files.filter(_.colBounds.contains("s"))
    assert(withS.nonEmpty, "string bounds recorded on compacted files")
    withS.foreach { f =>
      val (lo, hi) = f.colBounds("s")
      assert(lo.length <= 32 && hi.length <= 32, "bounds bounded in the manifest")
    }
    // soundness: every actual value within [lo, hi] of its file's bounds —
    // check globally (ASCII ⇒ UTF-16 order = UTF-8 order)
    val gLo = withS.map(_.colBounds("s")._1).min
    val gHi = withS.map(_.colBounds("s")._2).max
    val vals = IceLite.read(spark, snap).select("s").collect().map(_.getString(0))
    assert(vals.forall(v => gLo <= v && v <= gHi))
  }

  test("as-of-timestamp time travel resolves the newest snapshot at the cut") {
    val dir = Files.createTempDirectory("graft-asof-ts").toString + "/t"
    mkTable(dir)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 50L).map(i => (i, i, s"s$i", i, "UPSERT"))), "seq", "op", "e-0")
    val v1 = IceLite.load(dir).version
    val t1 = IceLite.commitTimeOf(dir, v1)
    assert(t1 > 0 && IceLite.loadVersionMeta(dir, v1).committedAtMs == t1,
      "commit time is stored in the snapshot JSON, not inferred from mtime")
    Thread.sleep(30)
    Merge.mergeEpoch(spark, dir,
      batch(Seq((1L, 99L, "new", 500L, "UPSERT"))), "seq", "op", "e-1")
    val v2 = IceLite.load(dir).version
    val t2 = IceLite.commitTimeOf(dir, v2)
    assert(t2 > t1, "commit times are monotone along the lineage")
    assert(IceLite.loadAsOf(dir, t1).version == v1)
    assert(IceLite.loadAsOf(dir, (t1 + t2) / 2).version == v1)
    assert(IceLite.loadAsOf(dir, t2).version == v2)
    assert(IceLite.loadAsOf(dir, System.currentTimeMillis() + 1000).version == v2)
    intercept[IllegalArgumentException] {
      IceLite.loadAsOf(dir, IceLite.commitTimeOf(dir, 0) - 10)
    }
    // the resolved snapshot reads the state AT the cut
    assert(IceLite.read(spark, IceLite.loadAsOf(dir, (t1 + t2) / 2))
      .filter(col("id") === 1L).head().getAs[Long]("v") == 1L)
  }

  test("time-based expire drops only pre-cut untagged versions; feed by timestamp") {
    val dir = Files.createTempDirectory("graft-time-expire").toString + "/t"
    mkTable(dir)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 40L).map(i => (i, i, s"a$i", i, "UPSERT"))), "seq", "op", "e-0")
    Thread.sleep(20)
    Merge.mergeEpoch(spark, dir,
      batch(Seq((1L, 100L, "b", 100L, "UPSERT"))), "seq", "op", "e-1")
    Thread.sleep(20)
    Merge.mergeEpoch(spark, dir,
      batch(Seq((2L, 200L, "c", 200L, "UPSERT"), (3L, 0L, "", 201L, "DELETE"))),
      "seq", "op", "e-2")
    val Seq(t1, t2, t3) = (1 to 3).map(IceLite.commitTimeOf(dir, _))
    // wall-clock change feed: (after-v2, after-v3] = exactly e-2's rows
    val feed = IceLite.changesBetween(spark, dir, (t2 + t3) / 2,
      System.currentTimeMillis())
    assert(feed.count() == 2 &&
      feed.select("id").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    IceLite.tag(dir, "keep", 1)
    // cut at t3: v0 and v2 are pre-cut and untagged — dropped; v1 tagged
    // and v3 head survive
    assert(Compaction.expireOlderThan(dir, t3, keepLast = 1) == 2)
    assert(IceLite.history(dir) == Vector(1, 3))
    assert(IceLite.loadAsOf(dir, (t1 + t2) / 2).version == 1,
      "a cut inside the dropped range falls back to the newest retained snapshot")
    intercept[IllegalArgumentException] { IceLite.loadAsOf(dir, t1 - 1) }
    // idempotent: nothing left to drop at the same cut
    assert(Compaction.expireOlderThan(dir, t3, keepLast = 1) == 0)
  }

  test("tags pin snapshots through expire and vacuum") {
    val dir = Files.createTempDirectory("graft-tags").toString + "/t"
    mkTable(dir)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 100L).map(i => (i, i, s"s$i", i, "UPSERT"))), "seq", "op", "e-0")
    val v1 = IceLite.load(dir).version
    IceLite.tag(dir, "model-cut", v1)
    assert(IceLite.tags(dir) == Map("model-cut" -> v1))
    IceLite.tag(dir, "model-cut", v1) // same version: idempotent
    Merge.mergeEpoch(spark, dir,
      batch(Seq((1L, 42L, "new", 500L, "UPSERT"))), "seq", "op", "e-1")
    val v2 = IceLite.load(dir).version
    intercept[IllegalStateException] { IceLite.tag(dir, "model-cut", v2) }
    intercept[IllegalArgumentException] { IceLite.tag(dir, "bad/name", v2) }
    intercept[IllegalArgumentException] { IceLite.tag(dir, "ghost", 99) }

    Compaction.compact(spark, dir, "maint")
    Compaction.expire(dir, keepLast = 1)
    Compaction.vacuum(dir, olderThanMs = 0)
    val hist = IceLite.history(dir)
    assert(hist.contains(v1), s"tagged version survives expire: $hist")
    assert(hist.size == 2, s"untagged versions dropped: $hist")

    // time travel THROUGH the tag after vacuum: the tag pinned v1's files
    val asOf = IceLite.read(spark, IceLite.loadTag(dir, "model-cut"))
    assert(asOf.count() == 100L)
    assert(asOf.filter(col("id") === 1L).head().getAs[Long]("v") == 1L,
      "tag reads the pre-e-1 value")
    assert(IceLite.read(spark, IceLite.load(dir))
      .filter(col("id") === 1L).head().getAs[Long]("v") == 42L)

    // drop the tag: the next expire ends its retention
    assert(IceLite.removeTag(dir, "model-cut"))
    assert(!IceLite.removeTag(dir, "model-cut"))
    Compaction.expire(dir, keepLast = 1)
    assert(!IceLite.history(dir).contains(v1))
    assert(IceLite.tagVersion(dir, "model-cut").isEmpty)
    intercept[IllegalStateException] { IceLite.loadTag(dir, "model-cut") }
  }
}
