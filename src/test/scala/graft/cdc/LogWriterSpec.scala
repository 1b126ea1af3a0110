package graft.cdc

import org.apache.spark.sql.{Dataset, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.decode.ChangeEvent

/** Idempotent producer: epoch fencing, duplicate-batch suppression,
  * registration races. */
class LogWriterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def events(lo: Long, hi: Long): Dataset[ChangeEvent] = {
    import spark.implicits._
    val p = LogGen.Params(nEvents = hi, nRepos = 10, pathsPerRepo = 10)
    spark.range(lo, hi, 1, 2).mapPartitions { it =>
      val fs = Cdc.fsV2; val d = fs.findMessage(Cdc.MessageType).get
      val pid = org.apache.spark.TaskContext.getPartitionId()
      it.map { id =>
        val c = LogGen.rawChange(id, p)
        ChangeEvent(LogGen.encodeChange(c, d, fs, includeAuthor = true),
          Cdc.SchemaId, 2, Cdc.MessageType, pid, id)
      }
    }
  }

  test("epochs fence zombies; duplicate batches are suppressed") {
    val log = Files.createTempDirectory("graft-logwriter").toString + "/log"
    val p1 = LogWriter.register(log, "ingest")
    assert(p1.epoch == 1 && LogWriter.currentEpoch(log, "ingest") == 1)

    val r1 = LogWriter.append(p1, events(0, 100), logEpoch = 0, batchId = 0)
    assert(r1.appended && r1.events == 100L)
    // duplicate delivery of an acked batch: suppressed, nothing re-written
    val dup = LogWriter.append(p1, events(0, 100), logEpoch = 0, batchId = 0)
    assert(!dup.appended && dup.segment == r1.segment)
    assert(spark.read.parquet(log).count() == 100L)

    // failover: the new instance fences the old one
    val p2 = LogWriter.register(log, "ingest")
    assert(p2.epoch == 2)
    intercept[LogWriter.ProducerFencedException] {
      LogWriter.append(p1, events(100, 200), logEpoch = 1, batchId = 1)
    }
    assert(spark.read.parquet(log).count() == 100L, "the zombie wrote nothing")
    val r2 = LogWriter.append(p2, events(100, 200), logEpoch = 1, batchId = 1)
    assert(r2.appended && spark.read.parquet(log).count() == 200L)

    // an unrelated producer id is not fenced by ingest's failover
    val other = LogWriter.register(log, "backfill")
    assert(other.epoch == 1)
    assert(LogWriter.append(other, events(200, 250), logEpoch = 1, batchId = 0).appended)
    assert(spark.read.parquet(log).count() == 250L)

    // the multi-producer log replays like any other
    val table = log.stripSuffix("/log") + "/table"
    Replay.replayLog(spark, log, table, buckets = 4)
    assert(graft.lake.IceLite.read(spark, graft.lake.IceLite.load(table)).count() > 0)

    // CRASH RE-SEND: the producer crashed after publishing batch 1 but
    // before recording the ack, re-registered (epoch 3) and re-sends — the
    // duplicate check must be EPOCH-BLIND: the segment name carries e2 but
    // the batch is the same (producer, batchId)
    val p3 = LogWriter.register(log, "ingest")
    assert(p3.epoch == 3)
    val resend = LogWriter.append(p3, events(100, 200), logEpoch = 1, batchId = 1)
    assert(!resend.appended && resend.segment == r2.segment,
      "a post-crash re-send under a new epoch must be suppressed")
    assert(spark.read.parquet(log).count() == 250L, "no duplicate segment")
  }

  test("registration sweeps orphaned stage dirs past the retention window") {
    val log = Files.createTempDirectory("graft-logwriter-sweep").toString + "/log"
    val meta = java.nio.file.Paths.get(log, "_producers")
    Files.createDirectories(meta)
    val stale = meta.resolve(".stage-dead")
    Files.createDirectories(stale)
    Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 3600_000))
    val fresh = meta.resolve(".stage-live")
    Files.createDirectories(fresh)
    LogWriter.register(log, "p")
    assert(!Files.exists(stale) && Files.exists(fresh))
  }

  test("racing registrations all get distinct epochs") {
    val log = Files.createTempDirectory("graft-logwriter-race").toString + "/log"
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val ts = (1 to 8).map(_ => new Thread(() => acc.add(LogWriter.register(log, "p").epoch)))
    ts.foreach(_.start()); ts.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val epochs = acc.asScala.toVector
    assert(epochs.distinct.size == 8, s"collided: $epochs")
    assert(LogWriter.currentEpoch(log, "p") == epochs.max)
  }
}
