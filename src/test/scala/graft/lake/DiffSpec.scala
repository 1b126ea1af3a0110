package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{LogGen, Replay}

/** Snapshot diff (q123's operator): resolved-state delta between two
  * versions, with the structural bucket-pruning contract — buckets whose
  * file sets are path-identical between the snapshots are never read. */
class DiffSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft-test-diff/$tag"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  /** reference diff: brute-force compare of two FULL resolved reads. */
  private def bruteDiff(dir: String, fromV: Int, toV: Int): Seq[String] = {
    val f = IceLite.read(spark, IceLite.loadVersion(dir, fromV))
      .collect().map(r => (r.getString(0) + "|" + r.getString(1)) -> r.mkString("|")).toMap
    val t = IceLite.read(spark, IceLite.loadVersion(dir, toV))
      .collect().map(r => (r.getString(0) + "|" + r.getString(1)) -> r.mkString("|")).toMap
    val rows = (f.keySet ++ t.keySet).toSeq.flatMap { k =>
      (f.get(k), t.get(k)) match {
        case (None, Some(_)) => Some(s"$k:insert")
        case (Some(_), None) => Some(s"$k:delete")
        case (Some(a), Some(b)) if a != b => Some(s"$k:update")
        case _ => None
      }
    }
    rows.sorted
  }

  private def diffKeys(dir: String, fromV: Int, toV: Int): Seq[String] =
    Diff.betweenVersions(spark, dir, fromV, toV)
      .select(concat_ws("|", col("repo"), col("path")), col("change_type"))
      .collect().map(r => s"${r.getString(0)}:${r.getString(1)}").toSeq.sorted

  test("diff ≡ brute-force state compare across update/delete/insert epochs") {
    val root = freshDir("basic")
    LogGen.writeLog(spark, LogGen.Params(nEvents = 1500, nRepos = 12, pathsPerRepo = 10),
      s"$root/log", epochs = 3)
    Replay.replayLog(spark, s"$root/log", s"$root/t", buckets = 8)
    val head = IceLite.load(s"$root/t").version
    assert(head == 3)
    // v0 (empty) → head: everything is an insert
    val all = diffKeys(s"$root/t", 0, head)
    assert(all.nonEmpty && all.forall(_.endsWith(":insert")))
    assert(all == bruteDiff(s"$root/t", 0, head))
    // epoch windows with genuine update/delete mixes
    assert(diffKeys(s"$root/t", 1, 3) == bruteDiff(s"$root/t", 1, 3))
    assert(diffKeys(s"$root/t", 2, 3) == bruteDiff(s"$root/t", 2, 3))
  }

  test("narrow DML touches few buckets and the diff prunes to exactly those") {
    val root = freshDir("prune")
    LogGen.writeLog(spark, LogGen.Params(nEvents = 2000, nRepos = 16, pathsPerRepo = 12),
      s"$root/log", epochs = 2)
    Replay.replayLog(spark, s"$root/log", s"$root/t", buckets = 16)
    val v2 = IceLite.load(s"$root/t").version
    // touch ONE key (one bucket out of 16) — the canonical narrow DML
    val k = IceLite.read(spark, IceLite.load(s"$root/t"))
      .select("repo", "path").orderBy("repo", "path").head()
    val pred = s"repo = '${k.getString(0)}' AND path = '${k.getString(1)}'"
    Dml.updateWhere(spark, s"$root/t", pred, Seq("lang" -> "'zz'"), "dml-diff-1")
    val v3 = IceLite.load(s"$root/t").version
    val cb = Diff.changedBuckets(
      IceLite.loadVersion(s"$root/t", v2), IceLite.loadVersion(s"$root/t", v3))
    assert(cb.isDefined && cb.get.size == 1,
      s"one-key update must change exactly one bucket, got $cb")
    // pruned diff is still the exact diff
    assert(diffKeys(s"$root/t", v2, v3) == bruteDiff(s"$root/t", v2, v3))
    val d = Diff.betweenVersions(spark, s"$root/t", v2, v3).collect()
    assert(d.nonEmpty && d.forall(r => r.getAs[String]("change_type") == "update"
      && r.getAs[String]("lang") == "zz"))
    // deletes classify as delete with NULL to-side values
    Dml.deleteWhere(spark, s"$root/t", pred, "dml-diff-2")
    val v4 = IceLite.load(s"$root/t").version
    val dd = Diff.betweenVersions(spark, s"$root/t", v3, v4).collect()
    assert(dd.nonEmpty && dd.forall(r => r.getAs[String]("change_type") == "delete"
      && r.isNullAt(r.fieldIndex("lang"))))
    assert(diffKeys(s"$root/t", v3, v4) == bruteDiff(s"$root/t", v3, v4))
  }

  test("rebucket in the window disables pruning but not correctness") {
    val root = freshDir("rebucket")
    LogGen.writeLog(spark, LogGen.Params(nEvents = 800, nRepos = 8, pathsPerRepo = 8),
      s"$root/log", epochs = 2)
    Replay.replayLog(spark, s"$root/log", s"$root/t", buckets = 4)
    val v = IceLite.load(s"$root/t").version
    Compaction.rebucket(spark, s"$root/t", 8, "rebucket-diff")
    val head = IceLite.load(s"$root/t").version
    assert(Diff.changedBuckets(
      IceLite.loadVersion(s"$root/t", v), IceLite.loadVersion(s"$root/t", head)).isEmpty)
    // a pure rebucket changes no logical state: diff is empty
    assert(Diff.betweenVersions(spark, s"$root/t", v, head).count() == 0L)
    assert(diffKeys(s"$root/t", 1, head) == bruteDiff(s"$root/t", 1, head))
  }
}
