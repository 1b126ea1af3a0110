package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join-view maintenance: after any interleaving of fact-only, dim-only,
  * and both-sides refreshes the view equals the full re-join; dim deletes
  * degrade to NULL (never drop rows); fact deletes drop rows; replayed
  * refreshes fence. */
class MatJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def applyDim(dDir: String, rows: Seq[(String, String, Long, String)],
      tag: String): Unit = {
    import spark.implicits._
    val pinned = rows.toDF("repo", "tier", "__sq", "__op").select(
      Seq(("repo", 1L), ("tier", 2L)).map { case (c, id) =>
        col(c).as(c, new org.apache.spark.sql.types.MetadataBuilder()
          .putLong(graft.decode.SparkSchema.FieldIdKey, id).build()) } ++
        Seq(col("__sq"), col("__op")): _*)
    Merge.mergeEpoch(spark, dDir, pinned, "__sq", "__op", tag)
  }

  private def fullJoin(fDir: String, dDir: String) =
    IceLite.read(spark, IceLite.load(fDir)).as("f")
      .join(IceLite.read(spark, IceLite.load(dDir)).select(
        col("repo"), col("tier")).as("d"), Seq("repo"), "left_outer")
      .select(col("repo"), col("path"), col("tier"))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)))).toSet

  test("view == full re-join across fact-only, dim-only, and mixed refreshes") {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-mjspec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val (fDir, dDir, outDir) = (s"$root/f", s"$root/d", s"$root/v")
    graft.cdc.LogGen.writeLog(spark, graft.cdc.LogGen.Params(nEvents = 600,
      nRepos = 12, pathsPerRepo = 8, v1Fraction = 0.5), s"$root/log", epochs = 2)
    // stage epoch 1 for later
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/late"))
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(s"$root/log/epoch=1"), new java.io.File(s"$root/late/epoch=1"))
    graft.cdc.Replay.replayLog(spark, s"$root/log", fDir, buckets = 16)
    IceLite.create(dDir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "repo", "STRING"), IceLite.ColDef(2, "tier", "STRING"))),
      Vector("repo"), 4)
    applyDim(dDir, (0 until 12).map(i =>
      (graft.cdc.LogGen.repoName(i), s"t$i", 1L, "UPSERT")), "d1")
    MatJoin.create(fDir, dDir, outDir, buckets = 4)

    def check(label: String): Unit = {
      val got = MatJoin.read(spark, outDir)
        .select(col("repo"), col("path"), col("tier"))
        .collect().map(r => (r.getString(0), r.getString(1),
          Option(r.getString(2)))).toSet
      assert(got == fullJoin(fDir, dDir), s"$label: view != full re-join")
    }
    assert(MatJoin.refresh(spark, fDir, dDir, outDir).applied); check("initial")

    // dim-only movement: retier one repo, DELETE another (NULL degrade)
    applyDim(dDir, Seq((graft.cdc.LogGen.repoName(0), "hot", 2L, "UPSERT"),
      (graft.cdc.LogGen.repoName(1), "", 2L, "DELETE")), "d2")
    val r2 = MatJoin.refresh(spark, fDir, dDir, outDir)
    assert(r2.applied && r2.fFrom == r2.fTo, s"dim-only: $r2"); check("dim-only")
    val degraded = MatJoin.read(spark, outDir)
      .filter(col("repo") === graft.cdc.LogGen.repoName(1))
    assert(degraded.count() > 0 && degraded.filter(col("tier").isNotNull).count() == 0,
      "dim delete must NULL-degrade, not drop, its fact rows")

    // fact-only movement: the staged epoch (includes DELETE events)
    graft.cdc.Replay.replayLog(spark, s"$root/late", fDir, buckets = 16)
    val r3 = MatJoin.refresh(spark, fDir, dDir, outDir)
    assert(r3.applied && r3.dFrom == r3.dTo, s"fact-only: $r3"); check("fact-only")

    // replay fences
    assert(!MatJoin.refresh(spark, fDir, dDir, outDir).applied)
    // fence encoding survives reload
    val (vf, vd) = MatJoin.lastApplied(IceLite.load(outDir))
    assert(vf == IceLite.load(fDir).version && vd == IceLite.load(dDir).version)

    // a join-column bloom index prunes the dim-propagation scan: retier
    // ONE repo and the refresh may only touch that key's fact buckets
    IceLite.addBloomIndex(spark, fDir, "idx-repo", "repo")
    applyDim(dDir, Seq((graft.cdc.LogGen.repoName(2), "cold", 3L, "UPSERT")), "d3")
    val r4 = MatJoin.refresh(spark, fDir, dDir, outDir)
    assert(r4.applied, s"indexed dim-only refresh must apply: $r4")
    val fSnap = IceLite.load(fDir)
    val expected = IceLite.bucketsForValue(fSnap, "repo", graft.cdc.LogGen.repoName(2))
    assert(r4.factBucketsScanned == expected.size &&
      r4.factBucketsScanned < fSnap.buckets,
      s"index must prune the fact scan: ${r4.factBucketsScanned}/${fSnap.buckets}")
    check("indexed dim-only")

    // a NO-OP version bump (compaction: files rewritten, zero net change)
    // must still ADVANCE the watermark via an empty fence commit —
    // otherwise lastApplied pins at the old version and every later
    // refresh re-scans an ever-growing change window to rediscover nothing
    Compaction.compact(spark, fDir, "maint-noop")
    val bumped = IceLite.load(fDir).version
    val r5 = MatJoin.refresh(spark, fDir, dDir, outDir)
    assert(!r5.applied && r5.fTo == bumped, s"no-op refresh: $r5")
    val (vf5, _) = MatJoin.lastApplied(IceLite.load(outDir))
    assert(vf5 == bumped, s"empty refresh must advance the watermark: $vf5 != $bumped")
    val r6 = MatJoin.refresh(spark, fDir, dDir, outDir)
    assert(!r6.applied && r6.fFrom == bumped, s"next refresh starts advanced: $r6")
    check("after no-op bump")
  }
}
