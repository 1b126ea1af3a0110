package graft.cdc

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import graft.lake.IceLite

/** COORDINATED LOG GC — when can change-log epochs be physically deleted?
  * Kafka answers with time/size retention and hopes consumers keep up; a
  * lakehouse ingest pipeline can answer EXACTLY, because every consumer's
  * durable progress is already recorded in its table's epoch ledger (the
  * same fencing state that makes replay idempotent). The safe truncation
  * point is the minimum over consumers of their CONTIGUOUS applied
  * watermark — an epoch at or below it can never be read again by any
  * registered consumer: re-replays fence it, resumes start above it.
  *
  * Out-of-order applies beyond a gap (ledger `recent`) deliberately do NOT
  * advance the point: the gap epochs are precisely what that consumer
  * still needs.
  *
  * What truncation costs: a NEW consumer can no longer rebuild from the
  * log alone — it attaches via [[Replay.bootstrap]] (snapshot at original
  * sequences) plus the retained tail, the standard CDC onboarding path
  * (the q81 contract). Deleting an epoch dir is safe against concurrent
  * readers of LATER epochs because epochs are separate directories; the
  * caller owns not racing a replay of the epochs being dropped (they are,
  * by definition, epochs every registered consumer already applied). */
object LogGc {

  /** A registered consumer: a table replaying this log under a fence
    * namespace ([[Replay.replayLog]]'s default is "replay"). */
  final case class Consumer(tableDir: String, namespace: String = "replay")

  final case class TruncateStats(safePoint: Long, removedEpochs: Seq[Long], removedFiles: Int)

  /** Highest epoch every consumer has contiguously applied; -1 = nothing
    * is safe (no consumers ⇒ nothing is provably consumed — refuse rather
    * than delete the world). */
  def safeTruncationPoint(consumers: Seq[Consumer]): Long =
    if (consumers.isEmpty) -1L
    else consumers.iterator.map { c =>
      if (!IceLite.exists(c.tableDir)) -1L
      else IceLite.load(c.tableDir).ledger.watermarks.getOrElse(c.namespace, -1L)
    }.min

  /** Epochs present in a log directory, ascending. */
  def epochs(logDir: String): Seq[Long] = {
    val root = Paths.get(logDir)
    if (!Files.isDirectory(root)) return Nil
    Files.list(root).iterator().asScala
      .flatMap { p =>
        val n = p.getFileName.toString
        if (n.startsWith("epoch=")) Some(n.stripPrefix("epoch=").toLong) else None
      }.toSeq.sorted
  }

  /** Delete every `epoch=<e>` directory with e ≤ the safe point. */
  def truncate(logDir: String, consumers: Seq[Consumer]): TruncateStats = {
    val sp = safeTruncationPoint(consumers)
    val drop = epochs(logDir).filter(_ <= sp)
    var removedFiles = 0
    drop.foreach { e =>
      val dir = Paths.get(logDir, s"epoch=$e")
      removedFiles += Files.walk(dir).iterator().asScala.count(Files.isRegularFile(_))
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
    TruncateStats(sp, drop, removedFiles)
  }
}
