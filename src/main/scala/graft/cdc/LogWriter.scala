package graft.cdc

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{Dataset, SaveMode}
import scala.jdk.CollectionConverters._
import graft.decode.ChangeEvent

/** IDEMPOTENT LOG PRODUCER with ZOMBIE FENCING — the write-side contract a
  * CDC transport needs (Kafka's idempotent/transactional producer, adapted
  * to a shared-filesystem log):
  *
  *  - **Producer epochs.** `register(logDir, id)` bumps the producer's
  *    epoch by atomically creating a marker file (hard-link
  *    create-if-absent, retried under races — two concurrent failovers get
  *    DISTINCT epochs, exactly one per attempt). The newest registration
  *    fences every older instance of the same producer id.
  *  - **Fenced appends.** `append` re-reads the registered epoch
  *    immediately before publishing; a stale instance (a "zombie": the old
  *    leader after a failover) gets [[ProducerFencedException]] and writes
  *    nothing. The check-then-rename window is not atomic — a zombie whose
  *    publish interleaves with the very registration that fences it can
  *    still land ONE segment (Kafka closes this window only because the
  *    partition leader serializes appends). That residual segment is
  *    harmless by construction downstream: its events carry original
  *    sequence numbers, and the merge's seq-LWW absorbs stale/duplicate
  *    deliveries (the q92 contract) — fencing exists to stop UNBOUNDED
  *    zombie writes, not to carry row-level correctness.
  *  - **Exactly-once retries.** A segment's published name embeds
  *    (producer, batchId); the atomic no-replace rename makes a re-send of
  *    an already-acked batch a detected no-op (`appended = false`), so an
  *    at-least-once producer loop never double-writes a batch.
  *
  * Segments are single parquet files under the log's `epoch=<n>/`
  * partition dirs, so [[Replay.replayLog]] and [[LogAudit]] consume a
  * multi-producer log unchanged; producer metadata lives in `_producers/`
  * (underscore-prefixed: invisible to Spark's file index, like
  * `_deadletter`). */
object LogWriter {

  final class ProducerFencedException(msg: String) extends IllegalStateException(msg)

  /** A registered producer instance. `epoch` is its fencing token. */
  final case class Producer(logDir: String, id: String, epoch: Int)

  final case class AppendResult(
      /** False = this (producer, batchId) was already published (duplicate
        * delivery suppressed). */
      appended: Boolean,
      segment: String,
      events: Long)

  /** Register (or fail over) a producer: returns a session holding the new
    * fencing epoch; every earlier instance of `id` is fenced from its next
    * append on. */
  def register(logDir: String, id: String): Producer = {
    require(id.nonEmpty && id.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"producer id must be [A-Za-z0-9_-]+: '$id'")
    val meta = Paths.get(logDir, "_producers")
    Files.createDirectories(meta)
    sweepOrphanStages(meta)
    var attempt = currentEpoch(logDir, id) + 1
    while (true) {
      val marker = meta.resolve(s"$id-epoch-$attempt.marker")
      val tmp = Files.createTempFile(meta, s".$id", ".tmp")
      try {
        Files.createLink(marker, tmp)
        return Producer(logDir, id, attempt)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempt = math.max(attempt + 1, currentEpoch(logDir, id) + 1)
      } finally Files.deleteIfExists(tmp)
    }
    sys.error("unreachable")
  }

  /** The newest registered epoch for a producer id; 0 = never registered. */
  def currentEpoch(logDir: String, id: String): Int = {
    val meta = Paths.get(logDir, "_producers")
    if (!Files.isDirectory(meta)) return 0
    val re = (java.util.regex.Pattern.quote(id) + """-epoch-(\d+)\.marker""").r
    Files.list(meta).iterator().asScala
      .flatMap(p => p.getFileName.toString match {
        case re(e) => Some(e.toInt)
        case _ => None
      }).foldLeft(0)(math.max)
  }

  /** Publish one producer batch as a single-file segment of
    * `epoch=<logEpoch>`. Fences zombies; suppresses duplicate batchIds. */
  /** An already-published segment for this (producer, batchId) under ANY
    * producer epoch. The duplicate check must be epoch-blind: the one time
    * an at-least-once producer actually re-sends is after a crash — which
    * forced a re-register and therefore a NEW epoch — so keying the check
    * on the current epoch's name alone would let exactly that re-send
    * publish a duplicate segment. */
  private def existingSegment(p: Producer, logEpoch: Long,
      batchId: Long): Option[Path] = {
    val dir = Paths.get(p.logDir, s"epoch=$logEpoch")
    if (!Files.isDirectory(dir)) return None
    val re = (java.util.regex.Pattern.quote(s"seg-${p.id}-e") + """\d+""" +
      java.util.regex.Pattern.quote(f"-b$batchId%05d.parquet")).r.pattern
    Files.list(dir).iterator().asScala
      .find(q => re.matcher(q.getFileName.toString).matches())
  }

  def append(p: Producer, events: Dataset[ChangeEvent], logEpoch: Long,
      batchId: Long): AppendResult = {
    val target = Paths.get(p.logDir, s"epoch=$logEpoch",
      f"seg-${p.id}-e${p.epoch}-b$batchId%05d.parquet")
    existingSegment(p, logEpoch, batchId).foreach(s =>
      return AppendResult(appended = false, s.toString, -1L))
    fence(p)
    // stage INSIDE the log dir so the publish rename stays same-filesystem
    // atomic
    val meta = Paths.get(p.logDir, "_producers")
    Files.createDirectories(meta)
    val stage = Files.createTempDirectory(meta, s".stage-${p.id}-")
    try {
      val n = events.count()
      events.coalesce(1).write.mode(SaveMode.Overwrite).parquet(stage.resolve("d").toString)
      val part = Files.list(stage.resolve("d")).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException("segment write produced no parquet part"))
      Files.createDirectories(target.getParent)
      // last-moment fence: a failover that registered while we were
      // writing wins — this instance must not publish. The duplicate
      // re-check is epoch-blind too (a recovered instance may have
      // published this batch under its new epoch while we staged).
      fence(p)
      existingSegment(p, logEpoch, batchId).foreach(s =>
        return AppendResult(appended = false, s.toString, -1L))
      try Files.move(part, target, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          return AppendResult(appended = false, target.toString, -1L)
      }
      AppendResult(appended = true, target.toString, n)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
  }

  /** Crashed appends leave `.stage-*` dirs (the success path deletes them
    * after the atomic publish rename) and a crashed register() leaves its
    * dot-prefixed `.{id}*.tmp` marker temp. Registration is a producer's
    * recovery point, so it sweeps both kinds once they are older than the
    * orphan window. Age is the NEWEST mtime anywhere under the entry — the
    * stage directory's own mtime is frozen at append start (parquet output
    * lands in stage/d/ below it), so a slow live append keeps itself safe
    * through the files it is still writing, not through the parent dir
    * (same in-flight-writer rationale as [[graft.lake.Compaction.vacuum]]). */
  private def sweepOrphanStages(meta: Path): Unit = {
    val cutoff = System.currentTimeMillis() - graft.lake.Compaction.defaultVacuumRetentionMs
    def newestMtime(p: Path): Long =
      try Files.walk(p).iterator().asScala
        .map(f => Files.getLastModifiedTime(f).toMillis).max
      catch { case _: java.io.IOException | _: java.io.UncheckedIOException => Long.MaxValue }
    Files.list(meta).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith(".stage-") || (n.startsWith(".") && n.endsWith(".tmp"))
      }
      .filter(newestMtime(_) <= cutoff)
      .foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(p.toFile))
  }

  private def fence(p: Producer): Unit = {
    val cur = currentEpoch(p.logDir, p.id)
    if (cur > p.epoch)
      throw new ProducerFencedException(
        s"producer '${p.id}' epoch ${p.epoch} fenced by epoch $cur")
  }
}
