package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Log compaction contract: replaying the compacted log produces the
  * IDENTICAL final table state as replaying the full log; survivors are
  * byte-verbatim; newest-event tombstones are retained; dominated epochs
  * vanish without breaking replay. */
class LogCompactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def finalState(tableDir: String) =
    graft.lake.IceLite.read(spark, graft.lake.IceLite.load(tableDir))
      .select(col("repo"), col("path"), col("commit"), col("lang"),
        sha2(col("content"), 256).as("sha"), col("author"))
      .collect().map(_.toSeq).toSet

  test("replay(compacted) == replay(full) across seeds; tombstones retained") {
    Seq(42L, 7L).foreach { seed =>
      val root = Files.createTempDirectory(s"graft-logcompact-$seed").toString
      val p = LogGen.Params(nEvents = 2500, nRepos = 15, pathsPerRepo = 10,
        v1Fraction = 0.6, seed = seed)
      LogGen.writeLog(spark, p, s"$root/log", epochs = 3)

      val st = LogCompact.compactLog(spark, s"$root/log", s"$root/comp")
      assert(st.eventsIn == 2500)
      // ~150 keys under 2500 events: heavy domination
      assert(st.eventsOut * 3 <= st.eventsIn, s"no shrinkage: $st")
      assert(st.tombstonesKept > 0, s"no tombstone survived: $st")

      Replay.replayLog(spark, s"$root/log", s"$root/tFull", buckets = 4)
      Replay.replayLog(spark, s"$root/comp", s"$root/tComp", buckets = 4)
      assert(finalState(s"$root/tFull") == finalState(s"$root/tComp"),
        s"seed $seed: compacted replay diverged")
    }
  }

  test("survivors are byte-verbatim at their original (partition, offset)") {
    val root = Files.createTempDirectory("graft-logcompact-vb").toString
    LogGen.writeLog(spark, LogGen.Params(nEvents = 1000, nRepos = 10,
      pathsPerRepo = 8, v1Fraction = 0.5), s"$root/log", epochs = 2)
    LogCompact.compactLog(spark, s"$root/log", s"$root/comp")
    val full = spark.read.parquet(s"$root/log")
      .select(col("partition"), col("offset"), sha2(col("payload"), 256).as("sha"))
    val comp = spark.read.parquet(s"$root/comp")
      .select(col("partition"), col("offset"), sha2(col("payload"), 256).as("csha"))
    val bad = comp.join(full, Seq("partition", "offset"), "left")
      .filter(col("sha").isNull || col("sha") =!= col("csha")).count()
    assert(bad == 0L)
  }

  test("a key whose newest event is DELETE stays absent after compacted replay") {
    val root = Files.createTempDirectory("graft-logcompact-del").toString
    // deleteEvery=10: plenty of keys end on a tombstone
    LogGen.writeLog(spark, LogGen.Params(nEvents = 1500, nRepos = 12,
      pathsPerRepo = 8, deleteEvery = 10), s"$root/log", epochs = 2)
    val st = LogCompact.compactLog(spark, s"$root/log", s"$root/comp")
    assert(st.tombstonesKept > 0)
    Replay.replayLog(spark, s"$root/comp", s"$root/t", buckets = 4)
    // every retained tombstone's key must be ABSENT from the final state
    import spark.implicits._
    val registry = spark.sparkContext.broadcast(Cdc.registry)
    val ev = spark.read.parquet(s"$root/comp")
      .select("payload", "schemaId", "schemaVersion", "messageType", "partition", "offset")
      .as[graft.decode.ChangeEvent]
    val dead = Replay.decodeForMerge(ev, registry, None).updates
      .filter(col("op") === "DELETE").select("repo", "path")
      .as[(String, String)].collect().toSet
    val live = graft.lake.IceLite.read(spark, graft.lake.IceLite.load(s"$root/t"))
      .select("repo", "path").as[(String, String)].collect().toSet
    assert(dead.nonEmpty && dead.intersect(live).isEmpty)
  }
}
