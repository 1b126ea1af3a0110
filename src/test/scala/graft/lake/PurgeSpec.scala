package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Key erasure: after purgeKey, NO read path — head scan, time travel to
  * any retained version, point lookup, change feed — serves the key, and
  * every other row is byte-identical to before. */
class PurgeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def state(snap: IceLite.Snapshot): Set[Seq[Any]] =
    IceLite.read(spark, snap)
      .select(col("repo"), col("path"), col("commit"),
        sha2(col("content"), 256).as("sha"))
      .collect().map(_.toSeq).toSet

  test("purge erases the key from every version; everything else untouched") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-purge").toString
    graft.cdc.LogGen.writeLog(spark, graft.cdc.LogGen.Params(
      nEvents = 2000, nRepos = 15, pathsPerRepo = 10, v1Fraction = 0.6),
      s"$root/log", epochs = 3)
    graft.cdc.Replay.replayLog(spark, s"$root/log", s"$root/t", buckets = 8)

    val dir = s"$root/t"
    val head = IceLite.load(dir)
    // victim: hottest live key
    val victim = IceLite.read(spark, head)
      .groupBy("repo", "path").count()
      .orderBy(col("count").desc, col("repo"), col("path"))
      .select("repo", "path").as[(String, String)].head()
    val key = Map[String, Any]("repo" -> victim._1, "path" -> victim._2)
    assert(IceLite.lookupLocal(head, key).nonEmpty, "victim must be live pre-purge")

    val versions = IceLite.history(dir)
    val pre = versions.map(v => v -> state(IceLite.loadVersion(dir, v))).toMap

    val st = Purge.purgeKey(spark, dir, key)
    assert(st.filesRewritten > 0 && st.rowsPurged > 0)
    assert(st.filesCandidates < st.filesTotal,
      s"pruning must rule out most files: $st")

    versions.foreach { v =>
      val snap = IceLite.loadVersion(dir, v)
      val post = state(snap)
      val expected = pre(v).filterNot(r => r.head == victim._1 && r(1) == victim._2)
      assert(post == expected, s"version $v: purge changed a non-victim row or kept the victim")
    }
    assert(IceLite.lookupLocal(IceLite.load(dir), key).isEmpty, "point lookup must miss")
    // the change feed can no longer emit the key either
    val feed = IceLite.changes(spark, dir, fromVersion = 1, toVersion = versions.max)
      .filter(col("repo") === victim._1 && col("path") === victim._2).count()
    assert(feed == 0L, "change feed must not resurrect a purged key")

    // idempotent: a second purge finds nothing
    val again = Purge.purgeKey(spark, dir, key)
    assert(again.filesRewritten == 0 && again.rowsPurged == 0L)

    // audit markers recorded
    assert(Files.exists(java.nio.file.Paths.get(dir, "meta", "purge-0.json")))
    assert(Files.exists(java.nio.file.Paths.get(dir, "meta", "purge-1.json")))
  }

  private def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", n).build()

  private def batch(rows: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("id", "v", "seq", "op")
      .select(col("id").as("id", fid(1)), col("v").as("v", fid(2)),
        col("seq"), col("op"))
  }

  test("purge bumps the version (caches invalidate), voids stale stats, and reaches branches") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-purge-vb").toString
    graft.cdc.LogGen.writeLog(spark, graft.cdc.LogGen.Params(
      nEvents = 800, nRepos = 8, pathsPerRepo = 6, v1Fraction = 0.6),
      s"$root/log", epochs = 2)
    graft.cdc.Replay.replayLog(spark, s"$root/log", s"$root/t", buckets = 4)
    val dir = s"$root/t"
    Compaction.compact(spark, dir, "maint-0") // delta-free: liveCount exact
    val victim = IceLite.read(spark, IceLite.load(dir))
      .groupBy("repo", "path").count()
      .orderBy(col("count").desc, col("repo"), col("path"))
      .select("repo", "path").as[(String, String)].head()
    val key = Map[String, Any]("repo" -> victim._1, "path" -> victim._2)

    // a branch ingests its own epoch holding MORE rows of the victim key
    val bdir = Branch.fork(dir, "audit")
    val extra = Seq((victim._1, victim._2, "c-br", "scala", "branch-copy",
        "a@b", 999999L, "UPSERT"))
      .toDF("repo", "path", "commit", "lang", "content", "author", "seq", "op")
    val pinned = extra.select(IceLite.load(bdir).currentSchema.filterNot(_.hidden)
      .map(c => col(c.name).as(c.name, new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("graft.fieldId", c.id.toLong).build())) ++
      Seq(col("seq"), col("op")): _*)
    Merge.mergeEpoch(spark, bdir, pinned, "seq", "op", "br-0")
    assert(IceLite.lookupLocal(IceLite.load(bdir), key).nonEmpty)

    // a materialized result caches the PRE-purge state (contains the victim)
    val cacheDir = s"$root/cache"
    val q = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("repo").agg(count(lit(1)).as("n"))
    val served0 = ResultCache.run(spark, dir, cacheDir, "by-repo", q)
    assert(!served0.hit)
    val preCount = MetaAgg.liveCount(IceLite.load(dir))
    assert(preCount.isDefined, "compacted table must serve an exact liveCount")
    val vPre = IceLite.load(dir).version

    val st = Purge.purgeKey(spark, dir, key)
    assert(st.rowsPurged > 0)

    // version bumped → the next cache run RECOMPUTES and has no victim rows
    val vPost = IceLite.load(dir).version
    assert(vPost > vPre, "purge must commit a version bump")
    val served1 = ResultCache.run(spark, dir, cacheDir, "by-repo", q)
    assert(!served1.hit, "post-purge read must not hit the pre-purge slot")
    // rewritten files' stats are voided, never wrong: exact-or-None holds
    MetaAgg.liveCount(IceLite.load(dir)).foreach { n =>
      assert(n == preCount.get - st.rowsPurged, s"liveCount if served must be exact: $n")
    }
    // the branch no longer serves the key either (its own epoch included)
    assert(IceLite.lookupLocal(IceLite.load(bdir), key).isEmpty,
      "branch copies must be purged too")
    assert(IceLite.read(spark, IceLite.load(bdir))
      .filter(col("repo") === victim._1 && col("path") === victim._2).count() == 0)
  }

  test("table purge leaves exports pinned; purgeExports erases them too") {
    val dir = Files.createTempDirectory("graft-purge-exp").toString + "/t"
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "v", "BIGINT"))),
      Vector("id"), buckets = 4)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 120L).map(i => (i, i * 2, i, "UPSERT"))), "seq", "op", "e-0")
    Compaction.compact(spark, dir, "maint-1")
    val full = Export.exportSnapshot(dir, "cut")
    val s1 = Export.exportIncremental(dir, "nightly")
    Merge.mergeEpoch(spark, dir, batch(Seq((7L, 777L, 500L, "UPSERT"))),
      "seq", "op", "e-1")
    val touched = IceLite.load(dir).files.filter(_.delta).map(_.bucket).toSet
    Compaction.compact(spark, dir, "maint-2", buckets = Some(touched))
    val s2 = Export.exportIncremental(dir, "nightly")

    val key = Map[String, Any]("id" -> 7L)
    def victimRows(files: Seq[String]): Long =
      spark.read.parquet(files: _*).where(col("id") === 7L).count()
    def fullFiles = Seq(s"${full.dir}/data")
    def chainFiles(v: Int) = Export.incrementalFiles(dir, "nightly", Some(v))

    // the hole: table purge replaces the TABLE's directory entries only —
    // every export's hard link keeps serving the key
    val st = Purge.purgeKey(spark, dir, key)
    assert(st.rowsPurged > 0)
    assert(victimRows(fullFiles) > 0, "full export still pinned pre-exports-purge")
    assert(victimRows(chainFiles(s1.sourceVersion)) > 0)
    assert(victimRows(chainFiles(s2.sourceVersion)) > 0)

    val preLatest = spark.read.parquet(chainFiles(s2.sourceVersion): _*)
      .where(expr(s2.rowFilter)).select("id", "v")
      .collect().map(_.toSeq).toSet

    val est = Purge.purgeExports(spark, dir, key)
    assert(est.exports == 2 && est.rowsPurged > 0 && est.filesRewritten >= 2)
    assert(est.filesCandidates < est.filesTotal,
      s"bucket pruning must rule out most export files: $est")
    assert(victimRows(fullFiles) == 0)
    assert(victimRows(chainFiles(s1.sourceVersion)) == 0)
    assert(victimRows(chainFiles(s2.sourceVersion)) == 0)
    // every non-victim row survives byte-identically
    val postLatest = spark.read.parquet(chainFiles(s2.sourceVersion): _*)
      .where(expr(s2.rowFilter)).select("id", "v")
      .collect().map(_.toSeq).toSet
    assert(postLatest == preLatest.filterNot(_.head == 7L))

    // idempotent; audit marker recorded
    val again = Purge.purgeExports(spark, dir, key)
    assert(again.filesRewritten == 0 && again.rowsPurged == 0L)
    assert(Files.exists(java.nio.file.Paths.get(dir, "export", "purge-0.json")))
  }

  test("batch purge rewrites each candidate file once for the whole batch") {
    val dir = Files.createTempDirectory("graft-purge-batch").toString + "/t"
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "v", "BIGINT"))),
      Vector("id"), buckets = 4)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 120L).map(i => (i, i * 2, i, "UPSERT"))), "seq", "op", "e-0")
    Compaction.compact(spark, dir, "maint") // one file per bucket
    Compaction.expire(dir, keepLast = 1) // single retained version → exact counts
    // victims: 3 keys in one bucket, 2 in another — 5 keys, 2 files
    val byBucket = (1L to 120L)
      .groupBy(i => graft.functions.XxHash64Host.bucketOf(Seq(i), 4))
    val victims = byBucket.values.toSeq.sortBy(-_.size) match {
      case a +: b +: _ => a.take(3) ++ b.take(2)
      case _ => fail("expected at least two buckets")
    }
    val st = Purge.purgeKeys(spark, dir,
      victims.map(i => Map[String, Any]("id" -> i)))
    assert(st.rowsPurged == 5L, s"every victim erased once: $st")
    assert(st.filesRewritten == 2,
      s"5 keys across 2 buckets must cost exactly 2 file rewrites: $st")
    assert(st.filesCandidates == 2, s"bucket pruning per key: $st")
    val left = IceLite.read(spark, IceLite.load(dir)).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !left.contains(v)))
    assert(left.size == 120 - 5, "non-victims all intact")
    // batch marker carries every key
    val marker = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "meta", "purge-0.json")), "UTF-8")
    assert(victims.forall(v => marker.contains(s""""id":"$v"""")))
  }
}
