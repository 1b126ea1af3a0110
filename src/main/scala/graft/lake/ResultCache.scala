package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** SNAPSHOT-KEYED RESULT CACHE — serve a repeated query from its
  * materialized result as long as the table hasn't committed since, with
  * correctness BY CONSTRUCTION: the cache key is (query name, snapshot
  * version), and every write path in the engine — merge, DML, compaction,
  * rebucket, schema change, rollback — commits a new version, so a stale
  * hit is impossible rather than improbable. There are no TTLs, no
  * mtime heuristics, and no invalidation hooks to forget.
  *
  * The hit path costs ONE snapshot-pointer read (metadata, no Spark job)
  * plus a scan of the materialized result — for the dashboard-style
  * aggregates this exists for, that's B rows instead of the table. At
  * 100 TB the miss/hit asymmetry is the whole point: the first consumer
  * of an epoch pays the scan, every later consumer of the same version
  * pays nothing. [[vacuum]] bounds the store: results of superseded
  * versions beyond `keepLast` are dropped (a re-request of an old version
  * would recompute through time travel anyway).
  *
  * Write race: two concurrent misses of the same (name, version) compute
  * identical frames; the slot is staged and atomically renamed, so the
  * loser's rename is a no-op discard, never a torn result. */
object ResultCache {

  final case class Served(df: DataFrame, hit: Boolean, version: Int)

  private def slotDir(cacheDir: String, name: String, v: Int) =
    Paths.get(cacheDir, name, f"v$v%05d")

  /** Run `query` over the CURRENT snapshot of `tableDir`, serving from the
    * cache when this (name, version) was materialized before. */
  def run(spark: SparkSession, tableDir: String, cacheDir: String,
      name: String, query: DataFrame => DataFrame): Served = {
    require(name.matches("[A-Za-z0-9_-]+"), s"unsafe cache name: $name")
    val snap = IceLite.load(tableDir)
    val slot = slotDir(cacheDir, name, snap.version)
    if (Files.exists(slot)) {
      Served(spark.read.parquet(slot.toString), hit = true, snap.version)
    } else {
      val stage = Paths.get(cacheDir, name, s".stage-v${snap.version}-${java.util.UUID.randomUUID()}")
      Files.createDirectories(stage.getParent)
      query(IceLite.read(spark, snap))
        .write.mode("overwrite").parquet(stage.toString)
      try Files.move(stage, slot, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        // lost the race to another writer of the SAME (name, version) —
        // its result is byte-equivalent; discard ours. Surfaces as either
        // exception depending on platform/timing.
        case e @ (_: java.nio.file.FileAlreadyExistsException |
                  _: java.nio.file.FileSystemException) if Files.exists(slot) =>
          org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
      }
      Served(spark.read.parquet(slot.toString), hit = false, snap.version)
    }
  }

  /** Drop materialized results of all but the newest `keepLast` versions
    * under `name`. Returns the number of slots removed. */
  def vacuum(cacheDir: String, name: String, keepLast: Int): Int = {
    val dir = Paths.get(cacheDir, name)
    if (!Files.exists(dir)) return 0
    val slots = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("v")).toVector
      .sortBy(_.getFileName.toString)
    val drop = slots.dropRight(keepLast)
    drop.foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(p.toFile))
    drop.size
  }
}
