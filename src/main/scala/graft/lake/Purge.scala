package graft.lake

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import IceLite._

/** KEY ERASURE ("right to be forgotten") — remove every row of one primary
  * key from the table INCLUDING its history, so no retained snapshot (time
  * travel, change feed, point lookup) can serve it again. Ordinary deletes
  * can't do this: a DELETE event only masks the key at the head while every
  * older snapshot still reads the pre-delete rows — a compliance erasure has
  * to rewrite the physical files that hold them.
  *
  * Mechanics: the union of data files across ALL retained snapshot versions
  * is pruned to the files that can possibly hold the key (per-version
  * bucket derivation — bucket counts differ across a rebucket — then
  * per-file key bounds + bloom, the same pruning stack as point lookups),
  * and each file that actually contains the key is rewritten IN PLACE
  * (stage → atomic rename onto the same path), dropping only the key's
  * rows. Manifests are untouched: every snapshot version keeps referencing
  * the same paths, and their recorded stats (rows, seq range, key bounds,
  * bloom) become conservative over-approximations — pruning stays sound
  * (a stale bloom can only say "maybe present"), counts drift high until
  * the next compaction rewrites the bucket.
  *
  * Scale shape: cost is O(files that can hold the key) — with 64-bucket
  * hashing plus blooms that is a handful of files out of 10^6, each
  * rewritten by one small job. No snapshot version is rewritten, no commit
  * races: purge is an offline maintenance op (like vacuum) and must not run
  * concurrently with a compaction of the same buckets. A reader mid-purge
  * sees each file either whole or already purged (rename is atomic) —
  * never truncated.
  *
  * Out of scope, by design: the upstream change LOG retains the key's
  * events (pair erasure with [[graft.cdc.LogCompact]] + log retention on
  * the log owner's side), and the dead-letter store may hold undecodable
  * payloads for the key (purge those by (partition, offset) if required).
  * An audit marker (`meta/purge-<n>.json`) records what was erased. */
object Purge {

  final case class PurgeStats(
      versions: Int,
      filesTotal: Int,
      /** files the pruning stack could not rule out. */
      filesCandidates: Int,
      /** candidates that actually held the key and were rewritten. */
      filesRewritten: Int,
      rowsPurged: Long)

  /** Erase `key` (all snapshot versions) from the table at `dir`.
    * `key` maps every key column to its value, like [[IceLite.lookup]]. */
  def purgeKey(spark: SparkSession, dir: String, key: Map[String, Any]): PurgeStats = {
    val head = IceLite.load(dir)
    require(head.keyCols.forall(key.contains),
      s"purge key must bind every key column ${head.keyCols}, got ${key.keys}")
    import org.apache.spark.sql.types._
    val curByName = head.currentSchema.map(c => c.name -> c).toMap
    val vals = head.keyCols.map { k =>
      (curByName.get(k).map(_.sparkType), key(k)) match {
        case (Some(LongType), n: Number) => n.longValue()
        case (Some(IntegerType), n: Number) => n.intValue()
        case (Some(ShortType), n: Number) => n.shortValue()
        case (_, v) => v
      }
    }
    val keyValsStr = vals.map(String.valueOf(_))
    val hostHashable = graft.functions.XxHash64Host.supports(vals)
    val keyHash =
      if (hostHashable) Some(graft.functions.XxHash64Host.hashColumns(vals)) else None

    // candidate files across EVERY retained version — bucket pruning is
    // per-version (a rebucket changes the layout), bounds/bloom per-file
    val versions = IceLite.history(dir)
    val candByPath = scala.collection.mutable.LinkedHashMap.empty[String, DataFile]
    var filesTotal = 0
    val seenPaths = scala.collection.mutable.HashSet.empty[String]
    versions.foreach { v =>
      val snap = IceLite.loadVersion(dir, v)
      snap.files.foreach { f =>
        if (seenPaths.add(f.path)) {
          filesTotal += 1
          val bucketOk = !hostHashable ||
            f.bucket == graft.functions.XxHash64Host.bucketOf(vals, snap.buckets)
          if (bucketOk && f.mayContainKeyHash(keyValsStr, keyHash))
            candByPath.getOrElseUpdate(f.path, f)
        }
      }
    }

    // physical key column names per schema version (renameColumn keeps the
    // field id stable; files carry the name current at their write time)
    val keyIds = head.keyCols.map(k => curByName(k).id)
    def keyNamesAt(schemaVersion: Int): Seq[String] = {
      val cols = head.schemas(math.min(schemaVersion, head.currentSchemaVersion))
      keyIds.map(id => cols.find(_.id == id).getOrElse(
        throw new IllegalStateException(s"key field id $id missing at schema v$schemaVersion")).name)
    }

    var rewritten = 0
    var rowsPurged = 0L
    candByPath.values.foreach { f =>
      val names = keyNamesAt(f.schemaVersion)
      val df = spark.read.parquet(f.path)
      // null-safe: a NULL key cell must KEEP its row (<=> is never null)
      val isKey = names.zip(vals).map { case (n, v) => col(n) <=> lit(v) }.reduce(_ && _)
      val hit = df.filter(isKey).count()
      if (hit > 0) {
        val stage = s"$dir/.purge-stage-${System.nanoTime()}"
        df.filter(!isKey).coalesce(1).write.mode("overwrite").parquet(stage)
        val part = Files.list(Paths.get(stage)).iterator()
        val partFile = {
          var found: java.nio.file.Path = null
          while (part.hasNext) { val p = part.next()
            if (p.getFileName.toString.endsWith(".parquet")) found = p }
          require(found != null, s"purge stage wrote no parquet for ${f.path}")
          found
        }
        val target = Paths.get(f.path)
        Files.move(partFile, target,
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        // the original write's checksum sidecar no longer matches the new
        // bytes — drop it (LocalFileSystem skips verification when absent)
        val crc = target.resolveSibling("." + target.getFileName.toString + ".crc")
        Files.deleteIfExists(crc)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
        rewritten += 1
        rowsPurged += hit
      }
    }

    // audit marker: what was erased, when in version history, which files
    val metaDir = Paths.get(dir, "meta")
    val n = Files.list(metaDir).iterator()
    var purgeCount = 0
    while (n.hasNext) if (n.next().getFileName.toString.startsWith("purge-")) purgeCount += 1
    val marker = metaDir.resolve(s"purge-$purgeCount.json")
    val json = s"""{"key":{${head.keyCols.zip(keyValsStr)
      .map { case (k, v) => s""""$k":"${v.replace("\\", "\\\\").replace("\"", "\\\"")}"""" }
      .mkString(",")}},"versions":${versions.length},"files_rewritten":$rewritten,"rows_purged":$rowsPurged}"""
    Files.write(marker, json.getBytes("UTF-8"))

    PurgeStats(versions.length, filesTotal, candByPath.size, rewritten, rowsPurged)
  }
}
