package graft.cdc

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import graft.lake.IceLite

/** Coordinated log GC: ledger-derived truncation points. */
class LogGcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("truncation point = min contiguous watermark; resumed consumers converge") {
    val root = Files.createTempDirectory("graft-loggc").toString
    val log = s"$root/log"
    val dirA = s"$root/a"; val dirB = s"$root/b"
    LogGen.writeLog(spark, LogGen.Params(nEvents = 600, nRepos = 10,
      pathsPerRepo = 10, v1Fraction = 0.5), log, epochs = 3)
    // B lags: replay with epoch 2 stashed away
    Files.move(Paths.get(log, "epoch=2"), Paths.get(root, "stash-epoch=2"))
    Replay.replayLog(spark, log, dirB, buckets = 4)
    Files.move(Paths.get(root, "stash-epoch=2"), Paths.get(log, "epoch=2"))
    Replay.replayLog(spark, log, dirA, buckets = 4)

    import LogGc.Consumer
    assert(LogGc.safeTruncationPoint(Seq(Consumer(dirA))) == 2L)
    assert(LogGc.safeTruncationPoint(Seq(Consumer(dirA), Consumer(dirB))) == 1L)
    assert(LogGc.safeTruncationPoint(Nil) == -1L, "no consumers → nothing provably safe")
    assert(LogGc.safeTruncationPoint(Seq(Consumer(dirA, "ghost-ns"))) == -1L)
    assert(LogGc.safeTruncationPoint(Seq(Consumer(s"$root/missing"))) == -1L)

    val st = LogGc.truncate(log, Seq(Consumer(dirA), Consumer(dirB)))
    assert(st.safePoint == 1L && st.removedEpochs == Seq(0L, 1L) && st.removedFiles > 0)
    assert(LogGc.epochs(log) == Seq(2L))

    // the lagging consumer resumes off the truncated log and converges
    Replay.replayLog(spark, log, dirB, buckets = 4)
    val a = IceLite.read(spark, IceLite.load(dirA)).select("repo", "path", "commit")
    val b = IceLite.read(spark, IceLite.load(dirB)).select("repo", "path", "commit")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)

    // a NEW consumer that only saw the truncated tail has a GAP: its
    // ledger must never advance the point (it needs bootstrap, not GC)
    val dirC = s"$root/c"
    Replay.replayLog(spark, log, dirC, buckets = 4)
    assert(LogGc.safeTruncationPoint(Seq(Consumer(dirC))) == -1L)
  }
}
