package graft.lake

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{LogGen, Replay}

/** Consumer-cursor contract edges the sf0.01 gate doesn't pin: monotonic
  * ack, unknown/duplicate consumer refusal, bounded polls, empty-window
  * schema. */
class FeedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("feed-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val dir: String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-feed-spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    LogGen.writeLog(spark, LogGen.Params(nEvents = 600, nRepos = 10,
      pathsPerRepo = 8), s"$root/log", epochs = 3)
    Replay.replayLog(spark, s"$root/log", s"$root/table", buckets = 4)
    s"$root/table"
  }

  test("create/position/ack lifecycle; duplicate create and rewind refused") {
    Feed.create(dir, "c1", startVersion = 0)
    assert(Feed.position(dir, "c1") == 0)
    intercept[IllegalArgumentException](Feed.create(dir, "c1"))
    intercept[IllegalArgumentException](Feed.position(dir, "nope"))
    Feed.ack(dir, "c1", 2)
    assert(Feed.position(dir, "c1") == 2)
    intercept[IllegalArgumentException](Feed.ack(dir, "c1", 1))
    Feed.ack(dir, "c1", 2) // idempotent re-ack of the same version is fine
    assert(Feed.position(dir, "c1") == 2)
  }

  test("bounded polls cover exactly the remaining versions; drained poll is empty with schema") {
    Feed.create(dir, "c2", startVersion = 0)
    val head = IceLite.load(dir).version
    var total = 0L
    var steps = 0
    var cur = Feed.position(dir, "c2")
    while (cur < head) {
      val (w, to) = Feed.poll(spark, dir, "c2", maxVersions = 1)
      assert(to == cur + 1)
      total += w.count(); steps += 1
      Feed.ack(dir, "c2", to); cur = to
    }
    assert(steps == head)
    val (empty, to) = Feed.poll(spark, dir, "c2")
    assert(to == head && empty.count() == 0)
    assert(empty.columns.contains("repo") && empty.columns.contains(IceLite.SeqCol.name))
    // a full-window poll from a fresh consumer NETS OUT intermediate
    // rewrites absorbed by inline compaction inside the window (the Delta
    // CDF caveat): its rows are a subset of the stepwise delivery, and an
    // LWW applier lands in the same final state either way
    Feed.create(dir, "c3", startVersion = 0)
    val (all, _) = Feed.poll(spark, dir, "c3")
    assert(all.count() <= total)
    Feed.create(dir, "c4", startVersion = 0)
    val step = (1 to head).map { v =>
      val (w, to) = Feed.poll(spark, dir, "c4", maxVersions = 1)
      Feed.ack(dir, "c4", to); w
    }.reduce(_.unionByName(_))
    val key = Seq("repo", "path", IceLite.SeqCol.name)
    assert(all.select(key.head, key.tail: _*)
      .except(step.select(key.head, key.tail: _*)).count() == 0,
      "net window rows must be a subset of stepwise delivery")
    def fold(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.functions._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("repo", "path").orderBy(col(IceLite.SeqCol.name).desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .filter(!col(IceLite.DelCol.name))
        .select("repo", "path", "commit").collect().toSet
    }
    assert(fold(all) == fold(step), "LWW fold must agree across window shapes")
  }

  test("a lagging consumer's cursor is a retention root: expire keeps its versions pollable") {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-feed-retain"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    LogGen.writeLog(spark, LogGen.Params(nEvents = 600, nRepos = 10,
      pathsPerRepo = 8), s"$root/log", epochs = 3)
    Replay.replayLog(spark, s"$root/log", s"$root/t", buckets = 4)
    val d = s"$root/t"
    Feed.create(d, "lag", startVersion = 1) // parked one epoch in
    // aggressive retention would drop v1 without the cursor pin
    val dropped = Compaction.expire(d, keepLast = 1)
    val retained = IceLite.history(d)
    assert(retained.contains(1),
      s"cursor version must survive expire (retained: $retained)")
    assert(retained.forall(_ >= 1) || dropped >= 0)
    // the consumer is NOT wedged: poll works and drains to head
    val (df, to) = Feed.poll(spark, d, "lag", maxVersions = 1)
    assert(df.count() > 0 && to == 2)
    Feed.ack(d, "lag", to)
    // once the cursor advances, a later expire may drop the old floor
    Compaction.expire(d, keepLast = 1)
    assert(!IceLite.history(d).contains(1),
      "advanced cursor must release the old version for retention")
  }

  test("compact keeps a LATE tombstone that an unconsumed delta can still deliver") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-feed-late-del"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    LogGen.writeLog(spark, LogGen.Params(nEvents = 400, nRepos = 6,
      pathsPerRepo = 5), s"$root/log", epochs = 2)
    Replay.replayLog(spark, s"$root/log", s"$root/t", buckets = 4)
    val d = s"$root/t"
    val head0 = IceLite.load(d)
    // a key whose live row has a LOW seq, so a later-but-still-low tombstone wins
    val victim = IceLite.read(spark, head0, includeHidden = true)
      .filter(!coalesce(col(IceLite.DelCol.name), lit(false)))
      .orderBy(col(IceLite.SeqCol.name), col("repo"), col("path"))
      .select(col("repo"), col("path"), col(IceLite.SeqCol.name))
      .as[(String, String, Long)].head()
    val lateSeq = victim._3 + 1 // beats the live row, far below head.maxSeq
    assert(lateSeq <= head0.maxSeq, "fixture needs a genuinely late seq")
    val visible = head0.currentSchema.filterNot(_.hidden)
    val tomb = Seq((victim._1, victim._2)).toDF("repo", "path")
    val batch = tomb.select(visible.map(c =>
        (if (c.name == "repo" || c.name == "path") col(c.name)
         else lit(null).cast(c.sparkType)).as(c.name,
          new org.apache.spark.sql.types.MetadataBuilder()
            .putLong("graft.fieldId", c.id.toLong).build())): _*)
      .withColumn("seq", lit(lateSeq)).withColumn("op", lit("DELETE"))
    Merge.mergeEpoch(spark, d, batch, "seq", "op", "late-del")
    // the PRE-late snapshot stays retained (a consumer could still open a
    // window from it), its maxSeq is far ABOVE lateSeq — the old
    // seq-watermark alone would purge the tombstone, but the delta file is
    // unconsumed, so changes() still delivers it and compact must keep it
    Compaction.expire(d, keepLast = 2)
    Compaction.compact(spark, d, "maint-late")
    // an adjacent-version window over the retained pre-compact snapshots
    // still delivers the late DELETE (the delta file is pinned by v-late)
    val hist = IceLite.history(d)
    val delivered = IceLite.changes(spark, d, hist(0), hist(1))
      .filter(col("repo") === victim._1 && col("path") === victim._2 &&
        coalesce(col(IceLite.DelCol.name), lit(false)))
    assert(delivered.count() == 1, "late tombstone must reach the feed")
    // the tombstone row itself must still exist physically (replica repair
    // / adjacent-version consumers); the key must read as deleted
    val rows = IceLite.read(spark, IceLite.load(d), includeHidden = true)
      .filter(col("repo") === victim._1 && col("path") === victim._2)
      .select(col(IceLite.DelCol.name), col(IceLite.SeqCol.name)).collect()
    assert(rows.exists(r => r.getBoolean(0) && r.getLong(1) == lateSeq),
      s"late tombstone must survive the compaction: ${rows.mkString(",")}")
    assert(IceLite.read(spark, IceLite.load(d))
      .filter(col("repo") === victim._1 && col("path") === victim._2).count() == 0,
      "the key must read as deleted")
  }
}
