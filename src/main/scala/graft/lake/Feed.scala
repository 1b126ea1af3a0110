package graft.lake

import java.nio.file.{Files, Path, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CONSUMER-GROUP CURSORS over the change feed — the bookkeeping a
  * downstream CDC consumer needs to tail a table without inventing its own
  * offset store: each named consumer owns a durable cursor (the snapshot
  * VERSION it has acknowledged through), `poll` returns the change window
  * `(cursor, head]` (or a bounded slice of it), and only an explicit `ack`
  * advances the cursor. Crash between poll and ack → the next poll
  * re-delivers the same window: AT-LEAST-ONCE, the classic consumer
  * contract, and safe here because the feed's rows are (key, __seq)
  * versioned — any idempotent applier (e.g. a [[Merge]]-shaped LWW upsert)
  * absorbs redelivery.
  *
  * The cursor is one tiny JSON per consumer under the table's own meta/
  * (no second system); writes are staged + ATOMIC_MOVE and monotonic
  * (`ack` refuses to move backwards). Single-writer-per-consumer is the
  * assumed deployment (as with Kafka group members); two racing ackers of
  * the SAME consumer are last-writer-wins on equal-or-forward versions
  * only.
  *
  * Scale: `poll` is O(changed files) — [[IceLite.changes]] reads only the
  * delta/carried files of the window, never the table; the cursor read is
  * one small file. A consumer lagging N epochs pays those N epochs'
  * deltas, bounded further by `maxVersions` slicing.
  */
object Feed {

  private def path(dir: String, name: String): Path = {
    require(name.matches("[A-Za-z0-9_-]+"), s"bad consumer name: $name")
    IceLite.metaDir(dir).resolve(s"consumer-$name.json")
  }

  /** Register a consumer starting AFTER `startVersion` (its first poll
    * window opens at startVersion — pass 0 to consume everything since the
    * table's creation). Refuses to re-create an existing consumer. */
  def create(dir: String, name: String, startVersion: Int = 0): Unit = {
    require(startVersion >= 0, s"startVersion must be >= 0, got $startVersion")
    val head = IceLite.load(dir).version // also validates the table exists
    require(startVersion <= head,
      s"startVersion $startVersion is beyond the table head $head")
    require(!Files.exists(path(dir, name)), s"consumer $name already exists at $dir")
    writeCursor(dir, name, startVersion)
  }

  /** The lowest acknowledged version across ALL registered consumers —
    * [[Compaction.expire]]'s retention floor: a cursor at V needs version V
    * (and everything after it) loadable as a change-window endpoint, so
    * retention must never drop a version a lagging consumer still points
    * at. None when the table has no consumers. */
  def minCursor(dir: String): Option[Int] = {
    val meta = IceLite.metaDir(dir)
    if (!Files.isDirectory(meta)) return None
    val it = java.nio.file.Files.list(meta).iterator()
    var min = Option.empty[Int]
    while (it.hasNext) {
      val p = it.next()
      val n = p.getFileName.toString
      if (n.startsWith("consumer-") && n.endsWith(".json")) {
        val v = position(dir, n.stripPrefix("consumer-").stripSuffix(".json"))
        if (min.forall(v < _)) min = Some(v)
      }
    }
    min
  }

  /** The consumer's acknowledged snapshot version. */
  def position(dir: String, name: String): Int = {
    val p = path(dir, name)
    require(Files.exists(p), s"unknown consumer $name at $dir")
    val s = new String(Files.readAllBytes(p), "UTF-8")
    """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"corrupt cursor $p: $s"))
  }

  private def writeCursor(dir: String, name: String, version: Int): Unit = {
    val p = path(dir, name)
    val tmp = Files.createTempFile(IceLite.metaDir(dir), s".tmp-cursor-$name", ".json")
    Files.write(tmp, s"""{"consumer":"$name","version":$version}""".getBytes("UTF-8"))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The next change window `(cursor, min(head, cursor+maxVersions)]` and
    * the version an `ack` should record once the window is durably applied.
    * An up-to-date consumer gets an EMPTY frame (correct schema) and its
    * current position. Does NOT advance the cursor.
    *
    * Window-width semantics (the Delta CDF caveat): `maxVersions = 1`
    * delivers every epoch's rows with full fidelity; a WIDER window that
    * crosses an inline compaction NETS OUT intermediate rewrites of the
    * same key (the compaction's base file keeps only each key's winner).
    * Either shape folds to the same final state under an LWW applier —
    * pinned in FeedSpec. */
  def poll(spark: SparkSession, dir: String, name: String,
      maxVersions: Int = Int.MaxValue): (DataFrame, Int) = {
    val cur = position(dir, name)
    val head = IceLite.load(dir).version
    val to = math.min(head.toLong, cur.toLong + maxVersions).toInt
    (IceLite.changes(spark, dir, cur, math.max(to, cur)), math.max(to, cur))
  }

  /** Advance the cursor to `toVersion` (from a completed poll). Monotonic:
    * a stale acker cannot rewind a newer cursor. */
  def ack(dir: String, name: String, toVersion: Int): Unit = {
    val cur = position(dir, name)
    require(toVersion >= cur,
      s"ack($toVersion) would rewind consumer $name from $cur")
    if (toVersion > cur) writeCursor(dir, name, toVersion)
  }
}
