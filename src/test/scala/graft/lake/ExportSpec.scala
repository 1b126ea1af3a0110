package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Read-optimized snapshot export: engine-neutral hard-linked manifests. */
class ExportSpec extends AnyFunSuite {

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

  test("export refuses what a raw reader would misread; serves the rest") {
    val dir = Files.createTempDirectory("graft-export").toString + "/t"
    mkTable(dir)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 120L).map(i => (i, i * 2, i, "UPSERT"))), "seq", "op", "e-0")
    Merge.mergeEpoch(spark, dir,
      batch((1L to 10L).map(i => (i, 0L, 200 + i, "DELETE"))), "seq", "op", "e-1")

    // delta files present → refuse
    val ex = intercept[IllegalArgumentException] { Export.exportSnapshot(dir, "cut") }
    assert(ex.getMessage.contains("delta-free"))

    Compaction.compact(spark, dir, "maint") // tombstones retained (no expire)
    val info = Export.exportSnapshot(dir, "cut")
    assert(info.created && info.files == IceLite.load(dir).files.size)
    assert(info.rows == 110L, "manifest carries the exact live count")
    assert(info.columns == Seq("id", "v"))

    // hard links, not copies
    val aPart = Files.list(Paths.get(info.dir, "data")).iterator().next()
    assert(Files.getAttribute(aPart, "unix:nlink").asInstanceOf[Number].intValue() >= 2)

    // an engine-neutral read (raw parquet + the manifest's portable filter)
    // reproduces the resolved state exactly — tombstone filter load-bearing
    val raw = spark.read.parquet(s"${info.dir}/data")
      .where(expr(info.rowFilter))
      .select(info.columns.map(col): _*)
    val engine = IceLite.read(spark, IceLite.load(dir)).select("id", "v")
    assert(raw.count() == 110L)
    assert(raw.except(engine).isEmpty && engine.except(raw).isEmpty)

    // idempotent re-publish; different-version republish refuses
    assert(!Export.exportSnapshot(dir, "cut").created)
    Merge.mergeEpoch(spark, dir, batch(Seq((121L, 1L, 300L, "UPSERT"))),
      "seq", "op", "e-2")
    Compaction.compact(spark, dir, "maint-2")
    val ex2 = intercept[IllegalArgumentException] { Export.exportSnapshot(dir, "cut") }
    assert(ex2.getMessage.contains("already published"))

    // the export is a PHYSICAL pin: expire+vacuum reclaim the old snapshot's
    // source paths, the hard links keep serving the exported bytes
    Compaction.expire(dir, keepLast = 1)
    Compaction.vacuum(dir, olderThanMs = 0)
    assert(spark.read.parquet(s"${info.dir}/data")
      .where(expr(info.rowFilter)).count() == 110L)

    assert(Export.removeExport(dir, "cut"))
    assert(!Export.removeExport(dir, "cut"))

    // a crashed export's staging dir is an orphan vacuum sweeps — but only
    // past the retention window (a live exporter's stage survives)
    val stale = Paths.get(dir, "export", ".export-crashed")
    Files.createDirectories(stale)
    Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 3600_000))
    val fresh = Paths.get(dir, "export", ".export-inflight")
    Files.createDirectories(fresh)
    Compaction.vacuum(dir) // default retention: only the stale one goes
    assert(!Files.exists(stale) && Files.exists(fresh))
  }

  test("incremental chain ships each file once; steps pin their bytes") {
    val dir = Files.createTempDirectory("graft-export-inc").toString + "/t"
    mkTable(dir)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 120L).map(i => (i, i * 2, i, "UPSERT"))), "seq", "op", "e-0")

    // delta-bearing snapshots refuse, same contract as full export
    val ex = intercept[IllegalArgumentException] {
      Export.exportIncremental(dir, "nightly")
    }
    assert(ex.getMessage.contains("delta-free"))

    Compaction.compact(spark, dir, "maint-1")
    val s1 = Export.exportIncremental(dir, "nightly")
    assert(s1.created && s1.filesReused == 0 && s1.filesShipped == s1.filesTotal)
    assert(s1.rows == 120L)
    // idempotent per source version
    assert(!Export.exportIncremental(dir, "nightly").created)

    // touch ONE key → one delta bucket; compact only that bucket
    Merge.mergeEpoch(spark, dir, batch(Seq((7L, 777L, 500L, "UPSERT"))),
      "seq", "op", "e-1")
    val touched = IceLite.load(dir).files.filter(_.delta).map(_.bucket).toSet
    assert(touched.size == 1)
    Compaction.compact(spark, dir, "maint-2", buckets = Some(touched))
    val s2 = Export.exportIncremental(dir, "nightly")
    assert(s2.created && s2.filesReused > 0 && s2.filesShipped < s2.filesTotal,
      s"steady-state step ships the delta only (${s2.filesShipped}/${s2.filesTotal})")
    // reused locs point back into the FIRST step's directory
    assert(s2.locs.exists(_.startsWith(s"v${s1.sourceVersion}/")))
    assert(s2.locs.exists(_.startsWith(s"v${s2.sourceVersion}/")))

    // resolved file list reads back to the engine's resolved state
    val raw = spark.read.parquet(Export.incrementalFiles(dir, "nightly"): _*)
      .where(expr(s2.rowFilter)).select("id", "v")
    val engine = IceLite.read(spark, IceLite.load(dir)).select("id", "v")
    assert(raw.count() == 120L)
    assert(raw.except(engine).isEmpty && engine.except(raw).isEmpty)
    assert(raw.where(col("id") === 7L).head().getLong(1) == 777L)

    // readIncremental: latest by default, any step by version
    assert(Export.readIncremental(dir, "nightly").sourceVersion == s2.sourceVersion)
    val back1 = Export.readIncremental(dir, "nightly", Some(s1.sourceVersion))
    assert(back1.filesReused == 0 && back1.filesTotal == s1.filesTotal)

    // physical pin: expire + vacuum reclaim superseded source paths, both
    // steps keep serving — including the OLD step's pre-update value
    Compaction.expire(dir, keepLast = 1)
    Compaction.vacuum(dir, olderThanMs = 0)
    val old = spark.read.parquet(
      Export.incrementalFiles(dir, "nightly", Some(s1.sourceVersion)): _*)
      .where(expr(s1.rowFilter))
    assert(old.count() == 120L)
    assert(old.where(col("id") === 7L).select("v").head().getLong(0) == 14L,
      "the pinned pre-tail cut still serves the pre-update value")
    assert(spark.read.parquet(Export.incrementalFiles(dir, "nightly"): _*)
      .where(expr(s2.rowFilter)).count() == 120L)
  }

  test("chain retention frees exactly the files no retained step references") {
    val dir = Files.createTempDirectory("graft-export-gc").toString + "/t"
    mkTable(dir)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 120L).map(i => (i, i * 2, i, "UPSERT"))), "seq", "op", "e-0")
    Compaction.compact(spark, dir, "maint-1")
    val s1 = Export.exportIncremental(dir, "nightly")
    def touch(id: Long, seq: Long, tag: String): Unit = {
      Merge.mergeEpoch(spark, dir, batch(Seq((id, id * 100, seq, "UPSERT"))),
        "seq", "op", tag)
      val t = IceLite.load(dir).files.filter(_.delta).map(_.bucket).toSet
      Compaction.compact(spark, dir, s"maint-$tag", buckets = Some(t))
    }
    touch(7L, 500L, "e-1")
    val s2 = Export.exportIncremental(dir, "nightly")
    touch(8L, 600L, "e-2")
    val s3 = Export.exportIncremental(dir, "nightly")

    val preStep2 = spark.read.parquet(
      Export.incrementalFiles(dir, "nightly", Some(s2.sourceVersion)): _*)
      .where(expr(s2.rowFilter)).select("id", "v").collect().map(_.toSeq).toSet

    val gc = Export.expireSteps(dir, "nightly", keepLast = 2)
    assert(gc.stepsDropped == 1 && gc.filesFreed >= 1 && gc.filesRetained >= 1,
      s"GC must free the superseded files and keep the referenced ones: $gc")
    // the dropped step is no longer a readable step
    val ex = intercept[IllegalArgumentException] {
      Export.readIncremental(dir, "nightly", Some(s1.sourceVersion))
    }
    assert(ex.getMessage.contains("no step"))
    // retained steps serve bit-identically — including reused locs that
    // resolve into the dropped step's now-headless data dir
    val postStep2 = spark.read.parquet(
      Export.incrementalFiles(dir, "nightly", Some(s2.sourceVersion)): _*)
      .where(expr(s2.rowFilter)).select("id", "v").collect().map(_.toSeq).toSet
    assert(postStep2 == preStep2)
    assert(spark.read.parquet(
      Export.incrementalFiles(dir, "nightly", Some(s3.sourceVersion)): _*)
      .where(expr(s3.rowFilter)).count() == 120L)
    // idempotent; the chain keeps growing after a GC (reuse intact)
    assert(Export.expireSteps(dir, "nightly", keepLast = 2) ==
      Export.ChainGcStats(0, 0, 0))
    touch(9L, 700L, "e-3")
    val s4 = Export.exportIncremental(dir, "nightly")
    assert(s4.created && s4.filesReused > 0)
    assert(spark.read.parquet(
      Export.incrementalFiles(dir, "nightly"): _*)
      .where(expr(s4.rowFilter)).count() == 120L)
  }

  test("manifest bounds prune a raw reader's file list; absent bounds keep") {
    val dir = Files.createTempDirectory("graft-export-skip").toString + "/t"
    mkTable(dir)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 400L).map(i => (i, i, i, "UPSERT"))), "seq", "op", "e-0")
    // clustering compaction: each bucket splits into v-contiguous files
    // with recorded bounds — the manifest inherits them
    Compaction.compact(spark, dir, "maint-1", clusterBy = Some("v"),
      filesPerBucket = 4)
    val s1 = Export.exportIncremental(dir, "skiptest")
    val full = Export.incrementalFiles(dir, "skiptest")
    val pruned = Export.prunedIncrementalFiles(dir, "skiptest",
      Seq(("v", 10L, 40L)))
    assert(pruned.nonEmpty && pruned.size * 2 <= full.size,
      s"bounds must rule out most files: ${pruned.size}/${full.size}")
    val exact = spark.read.parquet(full: _*).where(expr(s1.rowFilter))
      .where(col("v").between(10L, 40L)).select("id", "v")
      .collect().map(_.toSeq).toSet
    val viaPruned = spark.read.parquet(pruned: _*).where(expr(s1.rowFilter))
      .where(col("v").between(10L, 40L)).select("id", "v")
      .collect().map(_.toSeq).toSet
    assert(viaPruned == exact, "pruning must be lossless")
    // a predicate on a column without recorded bounds prunes nothing
    assert(Export.prunedIncrementalFiles(dir, "skiptest",
      Seq(("no_such_col", 0, 1))).size == full.size)
  }

  test("transformed chain rewrites new files only; transform change re-ships") {
    val dir = Files.createTempDirectory("graft-export-san").toString + "/t"
    mkTable(dir)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 120L).map(i => (i, i * 2, i, "UPSERT"))), "seq", "op", "e-0")
    Compaction.compact(spark, dir, "maint-1")
    val ov = Map("v" -> (col("v") * 1000))
    val s1 = Export.exportTransformedIncremental(spark, dir, "san", "x1000", ov)
    assert(s1.created && s1.filesReused == 0 && s1.filesShipped == s1.filesTotal)
    // the published surface carries TRANSFORMED values (and the row filter
    // still works — hidden columns passed through)
    val r1 = spark.read.parquet(Export.incrementalFiles(dir, "san"): _*)
      .where(expr(s1.rowFilter))
    assert(r1.count() == 120L)
    assert(r1.where(col("id") === 7L).select("v").head().getLong(0) == 14000L)
    // idempotent same transform; same version + different transform refuses
    assert(!Export.exportTransformedIncremental(spark, dir, "san", "x1000", ov).created)
    val ex = intercept[IllegalArgumentException] {
      Export.exportTransformedIncremental(spark, dir, "san", "x2",
        Map("v" -> (col("v") * 2)))
    }
    assert(ex.getMessage.contains("different transform"))

    // steady state: one touched bucket → one rewritten file, rest reused
    Merge.mergeEpoch(spark, dir, batch(Seq((7L, 777L, 500L, "UPSERT"))),
      "seq", "op", "e-1")
    val touched = IceLite.load(dir).files.filter(_.delta).map(_.bucket).toSet
    Compaction.compact(spark, dir, "maint-2", buckets = Some(touched))
    val s2 = Export.exportTransformedIncremental(spark, dir, "san", "x1000", ov)
    assert(s2.created && s2.filesReused > 0 && s2.filesShipped < s2.filesTotal)
    val r2 = spark.read.parquet(Export.incrementalFiles(dir, "san"): _*)
      .where(expr(s2.rowFilter))
    assert(r2.where(col("id") === 7L).select("v").head().getLong(0) == 777000L)
    assert(r2.count() == 120L)

    // a CHANGED transform never reuses a predecessor's files
    Merge.mergeEpoch(spark, dir, batch(Seq((8L, 888L, 600L, "UPSERT"))),
      "seq", "op", "e-2")
    val t2 = IceLite.load(dir).files.filter(_.delta).map(_.bucket).toSet
    Compaction.compact(spark, dir, "maint-3", buckets = Some(t2))
    val s3 = Export.exportTransformedIncremental(spark, dir, "san", "x2",
      Map("v" -> (col("v") * 2)))
    assert(s3.created && s3.filesReused == 0,
      s"transform change must force a full re-ship: $s3")
    assert(spark.read.parquet(
      Export.incrementalFiles(dir, "san", Some(s3.sourceVersion)): _*)
      .where(expr(s3.rowFilter))
      .where(col("id") === 7L).select("v").head().getLong(0) == 1554L)

    // a RAW publisher must never extend (or adopt into) a sanitized chain:
    // it would hard-link raw bytes into a surface consumers trust to be
    // transformed. Both at the same version (adopt) and ahead (extend).
    val exSame = intercept[IllegalArgumentException] {
      Export.exportIncremental(dir, "san")
    }
    assert(exSame.getMessage.contains("transformed chain"), exSame.getMessage)
    Merge.mergeEpoch(spark, dir, batch(Seq((9L, 999L, 700L, "UPSERT"))),
      "seq", "op", "e-3")
    val t3 = IceLite.load(dir).files.filter(_.delta).map(_.bucket).toSet
    Compaction.compact(spark, dir, "maint-4", buckets = Some(t3))
    val exAhead = intercept[IllegalArgumentException] {
      Export.exportIncremental(dir, "san")
    }
    assert(exAhead.getMessage.contains("exportTransformedIncremental"))
  }

  test("export refuses mixed-schema-version files after a rename") {
    val dir = Files.createTempDirectory("graft-export-ddl").toString + "/t"
    mkTable(dir)
    Merge.mergeEpoch(spark, dir,
      batch((1L to 50L).map(i => (i, i, i, "UPSERT"))), "seq", "op", "e-0")
    Compaction.compact(spark, dir, "maint")
    IceLite.renameColumn(dir, "ddl-rename", "v", "val")
    // files still carry the pre-rename physical column name
    val ex = intercept[IllegalArgumentException] { Export.exportSnapshot(dir, "cut") }
    assert(ex.getMessage.contains("current schema version"))
    Compaction.compact(spark, dir, "maint-2") // rewrite at the current version
    val info = Export.exportSnapshot(dir, "cut")
    assert(info.columns == Seq("id", "val"))
    val raw = spark.read.parquet(s"${info.dir}/data").where(expr(info.rowFilter))
    assert(raw.columns.contains("val") && raw.count() == 50L)
  }
}
