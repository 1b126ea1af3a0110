package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.cdc.{Cdc, LogGen, Replay}

/** The host-side point lookup must be indistinguishable from the Spark
  * path on every key class — live (incl. schema-evolved v1-origin rows),
  * deleted (tombstone wins), absent — and across a dropColumn. */
class LookupLocalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def replayed(tag: String, nEvents: Int): (String, IceLite.Snapshot) = {
    val root = Files.createTempDirectory(s"graft-$tag").toString
    val logDir = s"$root/log"
    val tableDir = s"$root/table"
    LogGen.writeLog(spark, LogGen.Params(nEvents = nEvents, nRepos = 20,
      pathsPerRepo = 15, v1Fraction = 0.7), logDir, epochs = 2)
    Replay.replayLog(spark, logDir, tableDir, buckets = 8)
    (root, IceLite.load(tableDir))
  }

  private def assertSame(snap: IceLite.Snapshot, key: Map[String, Any]): Unit = {
    val sparkRows = IceLite.lookup(spark, snap, key).collect()
    val local = IceLite.lookupLocal(snap, key)
    assert(sparkRows.length <= 1, s"$key: lookup returned ${sparkRows.length} rows")
    assert(local.isDefined == (sparkRows.length == 1),
      s"$key: local=${local.isDefined} spark=${sparkRows.length}")
    if (local.isDefined) {
      val row = sparkRows(0)
      snap.currentSchema.filterNot(_.hidden).foreach { c =>
        (row.getAs[Any](c.name), local.get(c.name)) match {
          case (a: Array[Byte], b: Array[Byte]) =>
            assert(java.util.Arrays.equals(a, b), s"$key ${c.name}")
          case (a, b) => assert(a == b, s"$key ${c.name}: $a vs $b")
        }
      }
    }
  }

  test("lookupLocal == Spark lookup on live, deleted, and absent keys") {
    import spark.implicits._
    val (root, snap) = replayed("lookuplocal", 2000)

    // live keys, spread across buckets/schema-origins
    val live = IceLite.read(spark, snap).select("repo", "path")
      .orderBy("repo", "path").as[(String, String)].collect()
    assert(live.length > 100)
    live.sliding(1, live.length / 40).flatten.foreach { case (r, p) =>
      assertSame(snap, Map("repo" -> r, "path" -> p))
    }

    // deleted keys: last op in the decoded log is DELETE
    val registry = spark.sparkContext.broadcast(Cdc.registry)
    val ev = spark.read.parquet(s"$root/log")
      .select("payload", "schemaId", "schemaVersion", "messageType", "partition", "offset")
      .as[graft.decode.ChangeEvent]
    val upd = Replay.decodeForMerge(ev, registry, None).updates
    val deleted = upd.groupBy("repo", "path")
      .agg(max_by(col("op"), col("seq")).as("lastOp"))
      .filter(col("lastOp") === "DELETE")
      .select("repo", "path").as[(String, String)].collect()
    assert(deleted.nonEmpty, "seeded log should contain tombstoned keys")
    deleted.take(10).foreach { case (r, p) =>
      val key = Map[String, Any]("repo" -> r, "path" -> p)
      assert(IceLite.lookupLocal(snap, key).isEmpty, s"tombstoned $key must not serve")
      assertSame(snap, key)
    }

    // absent key
    assert(IceLite.lookupLocal(snap,
      Map("repo" -> "no-such-repo", "path" -> "no/such/path")).isEmpty)
  }

  test("lookupLocal across dropColumn: dropped column absent, the rest served") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-lookuplocal-ddl").toString
    val logDir = s"$root/log"
    val tdir = s"$root/table"
    LogGen.writeLog(spark, LogGen.Params(nEvents = 1000, nRepos = 10,
      pathsPerRepo = 10, v1Fraction = 0.7), logDir, epochs = 1)
    Replay.replayLog(spark, logDir, tdir, buckets = 4)
    IceLite.dropColumn(tdir, "ddl-0", "lang")
    val snap = IceLite.load(tdir)
    val live = IceLite.read(spark, snap).select("repo", "path")
      .orderBy("repo", "path").limit(5).as[(String, String)].collect()
    live.foreach { case (r, p) =>
      val key = Map[String, Any]("repo" -> r, "path" -> p)
      val local = IceLite.lookupLocal(snap, key)
      assert(local.isDefined)
      assert(!local.get.contains("lang"), "dropped column must not be served")
      assertSame(snap, key)
    }
  }
}
