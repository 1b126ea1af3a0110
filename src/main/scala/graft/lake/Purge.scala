package graft.lake

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
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
  def purgeKey(spark: SparkSession, dir: String, key: Map[String, Any]): PurgeStats =
    purgeKeys(spark, dir, Seq(key))

  /** Batch erasure — erasure requests arrive in batches (a day's worth of
    * right-to-be-forgotten tickets), and the dominant cost is file
    * rewrites, so the batch shape matters: candidates are the UNION of
    * each key's pruned file set (per-version bucket + per-file bloom, same
    * stack as single-key), and every candidate file is rewritten ONCE
    * dropping ALL of the batch's keys it holds — K keys cost
    * O(distinct candidate files), never K × per-key rewrites. One audit
    * marker records the whole batch. */
  def purgeKeys(spark: SparkSession, dir: String,
      keys: Seq[Map[String, Any]]): PurgeStats = {
    require(keys.nonEmpty, "purgeKeys needs at least one key")
    val head = IceLite.load(dir)
    keys.foreach(key => require(head.keyCols.forall(key.contains),
      s"purge key must bind every key column ${head.keyCols}, got ${key.keys}"))
    val curByName = head.currentSchema.map(c => c.name -> c).toMap
    val keyVals: Seq[Seq[Any]] = keys.map(normKey(head, curByName, _)).distinct
    // FAIL-CLOSED against legal holds: destroying a held key is the one
    // thing a compliance pipeline must never do — batch tickets that may
    // contain held keys go through LegalHold.guardedPurge instead
    val blocked = keyVals.filter(v => LegalHold.isHeld(dir, head.keyCols, v))
    require(blocked.isEmpty,
      s"purge refused: key(s) under active legal hold: ${blocked.map(v =>
        head.keyCols.zip(v.map(String.valueOf(_))).toMap).mkString("; ")} — " +
        "release the hold first, or use LegalHold.guardedPurge for batches")
    // per-key pruning state
    val perKey = keyVals.map { vals =>
      val strs = vals.map(String.valueOf(_))
      val hh = graft.functions.XxHash64Host.supports(vals)
      val hash = if (hh) Some(graft.functions.XxHash64Host.hashColumns(vals)) else None
      (vals, strs, hh, hash)
    }

    // candidate files across EVERY retained version — bucket pruning is
    // per-version (a rebucket changes the layout), bounds/bloom per-file;
    // a file is a candidate when ANY batch key can live in it
    val versions = IceLite.history(dir)
    val candByPath = scala.collection.mutable.LinkedHashMap.empty[String, DataFile]
    var filesTotal = 0
    val seenPaths = scala.collection.mutable.HashSet.empty[String]
    versions.foreach { v =>
      val snap = IceLite.loadVersion(dir, v)
      snap.files.foreach { f =>
        if (seenPaths.add(f.path)) {
          filesTotal += 1
          val anyKey = perKey.exists { case (vals, strs, hh, hash) =>
            val bucketOk = !hh ||
              f.bucket == graft.functions.XxHash64Host.bucketOf(vals, snap.buckets)
            bucketOk && f.mayContainKeyHash(strs, hash)
          }
          if (anyKey) candByPath.getOrElseUpdate(f.path, f)
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
    val rewrittenPaths = scala.collection.mutable.HashSet.empty[String]
    candByPath.values.foreach { f =>
      val hit = rewriteWithoutKeys(spark, dir, f.path, keyNamesAt(f.schemaVersion), keyVals)
      if (hit > 0) { rewritten += 1; rowsPurged += hit; rewrittenPaths += f.path }
    }
    // commit a VERSION BUMP naming the rewritten paths: (a) every
    // (name, version)-keyed consumer — ResultCache above all — must never
    // serve a pre-purge materialization of erased rows, and version-equal
    // is their only staleness signal since the paths didn't change;
    // (b) the rewritten files' recorded row counts / column bounds are now
    // stale (the erased rows may have been the extremes) — the commit
    // resets them to unknown so MetaAgg stays exact-or-None, never wrong.
    // Strict CAS: a commit that raced the rewrite may have replaced the
    // very files just purged, so it fails loudly and the purge re-runs.
    // Committed whenever CANDIDATES existed (not only on hits): a re-run
    // after a crash between rewrite and commit finds zero hits — the keys
    // are already gone — but must still publish the version bump.
    if (candByPath.nonEmpty)
      IceLite.commitInPlaceRewrite(dir, head, s"purge-rw-${head.version}",
        rewrittenPaths.toSet)

    // WAP branches are full table dirs under <dir>/branches with their own
    // snapshot chains and data files: an erasure that skipped them would
    // leave the key readable there (and re-publishable into main). Recurse
    // — branch epochs' own files go through the same machinery; fork-point
    // files are shared PATHS already rewritten in place above, so the
    // recursion's scan finds them key-free and leaves them alone.
    var branchRewritten = 0
    var branchRows = 0L
    val branchRoot = Paths.get(dir, "branches")
    if (Files.isDirectory(branchRoot)) {
      Files.list(branchRoot).iterator().asScala.toVector
        .filter(b => IceLite.exists(b.toString)).foreach { b =>
          val st = purgeKeys(spark, b.toString, keys)
          branchRewritten += st.filesRewritten
          branchRows += st.rowsPurged
        }
    }

    // audit marker: what was erased, when in version history, which files
    val metaDir = Paths.get(dir, "meta")
    val n = Files.list(metaDir).iterator()
    var purgeCount = 0
    while (n.hasNext) if (n.next().getFileName.toString.startsWith("purge-")) purgeCount += 1
    val marker = metaDir.resolve(s"purge-$purgeCount.json")
    def jsKey(vals: Seq[Any]) = s"{${head.keyCols.zip(vals.map(String.valueOf(_)))
      .map { case (k, v) => s""""$k":"${v.replace("\\", "\\\\").replace("\"", "\\\"")}"""" }
      .mkString(",")}}"
    val json = s"""{"keys":[${keyVals.map(jsKey).mkString(",")}],
      |"versions":${versions.length},"files_rewritten":$rewritten,"rows_purged":$rowsPurged}""".stripMargin
    Files.write(marker, json.getBytes("UTF-8"))

    PurgeStats(versions.length, filesTotal, candByPath.size,
      rewritten + branchRewritten, rowsPurged + branchRows)
  }

  /** Key-column values in declared-type form (lookup-style coercion).
    * Shared with [[LegalHold.guardedPurge]] so the hold check classifies
    * keys under EXACTLY the coercion purgeKeys enforces with. */
  private[lake] def normKey(head: IceLite.Snapshot,
      curByName: Map[String, IceLite.ColDef],
      key: Map[String, Any]): Seq[Any] = {
    import org.apache.spark.sql.types._
    head.keyCols.map { k =>
      (curByName.get(k).map(_.sparkType), key(k)) match {
        case (Some(LongType), n: Number) => n.longValue()
        case (Some(IntegerType), n: Number) => n.intValue()
        case (Some(ShortType), n: Number) => n.shortValue()
        case (_, v) => v
      }
    }
  }

  /** One candidate file, rewritten in place without ANY batch key's rows
    * (stage → atomic rename onto the same path). Returns rows dropped (0 =
    * the file held none of the keys and was left untouched). Null-safe: a
    * NULL key cell KEEPS its row (`<=>` is never null). */
  private def rewriteWithoutKeys(spark: SparkSession, stageRoot: String,
      path: String, names: Seq[String], keyVals: Seq[Seq[Any]]): Long = {
    val df = spark.read.parquet(path)
    val isKey = keyVals.map(vals =>
      names.zip(vals).map { case (n, v) => col(n) <=> lit(v) }.reduce(_ && _)
    ).reduce(_ || _)
    val hit = df.filter(isKey).count()
    if (hit == 0) return 0L
    val stage = s"$stageRoot/.purge-stage-${System.nanoTime()}"
    df.filter(!isKey).coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage)).iterator()
    val partFile = {
      var found: java.nio.file.Path = null
      while (part.hasNext) { val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) found = p }
      require(found != null, s"purge stage wrote no parquet for $path")
      found
    }
    val target = Paths.get(path)
    Files.move(partFile, target,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // the original write's checksum sidecar no longer matches the new
    // bytes — drop it (LocalFileSystem skips verification when absent)
    val crc = target.resolveSibling("." + target.getFileName.toString + ".crc")
    Files.deleteIfExists(crc)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
    hit
  }

  final case class ExportPurgeStats(
      exports: Int,
      filesTotal: Int,
      filesCandidates: Int,
      filesRewritten: Int,
      rowsPurged: Long)

  /** Erase `key` from every PUBLISHED export under `<dir>/export/` — full
    * exports and incremental chains alike. Table purge alone is not enough:
    * export data files are HARD LINKS, and [[purgeKey]]'s atomic rename
    * replaces only the table's directory entry — the export's link keeps
    * the original inode (and the key's rows) alive. That is exactly the
    * pin property exports promise, so a compliance erasure has to rewrite
    * the export paths themselves.
    *
    * Pruning: manifests record the layout's bucket count at publish time
    * and every published file name carries its bucket (`part-NNNNN-bK`), so
    * candidates are derived host-side per manifest — O(chains), never
    * O(exported bytes). A chain step's REUSED locs resolve to the origin
    * step's files and are pruned with the origin manifest's bucket count
    * (a rebucket between steps changes the layout; each step prunes its own
    * shipped files). Legacy manifests without `buckets` fall back to
    * scanning that export's files — sound, just unpruned. Each path is
    * rewritten at most once; manifests stay untouched (their `rows` counts
    * drift high, same conservative contract as table purge). An audit
    * marker (`export/purge-<n>.json`) records what was erased. */
  def purgeExports(spark: SparkSession, dir: String, key: Map[String, Any]): ExportPurgeStats =
    purgeExportsKeys(spark, dir, Seq(key))

  /** Batch form of [[purgeExports]] — same candidate pruning per key, each
    * export path rewritten ONCE dropping every batch key it holds (the
    * [[purgeKeys]] batching argument, applied to the export side). */
  def purgeExportsKeys(spark: SparkSession, dir: String,
      keys: Seq[Map[String, Any]]): ExportPurgeStats = {
    require(keys.nonEmpty, "purgeExportsKeys needs at least one key")
    val head = IceLite.load(dir)
    keys.foreach(key => require(head.keyCols.forall(key.contains),
      s"purge key must bind every key column ${head.keyCols}, got ${key.keys}"))
    val curByName = head.currentSchema.map(c => c.name -> c).toMap
    val keyVals: Seq[Seq[Any]] = keys.map(normKey(head, curByName, _)).distinct
    // same fail-closed hold guard as purgeKeys — exported copies of a held
    // key are preserved evidence too
    val heldBlocked = keyVals.filter(v => LegalHold.isHeld(dir, head.keyCols, v))
    require(heldBlocked.isEmpty,
      s"export purge refused: key(s) under active legal hold: ${heldBlocked.map(v =>
        head.keyCols.zip(v.map(String.valueOf(_))).toMap).mkString("; ")}")
    val perKey = keyVals.map(vals =>
      (vals, graft.functions.XxHash64Host.supports(vals)))
    val exportRoot = Paths.get(dir, "export")
    if (!Files.isDirectory(exportRoot))
      return ExportPurgeStats(0, 0, 0, 0, 0L)

    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val keyIds = head.keyCols.map(k => curByName(k).id)
    // (bucket count, physical key column names) as recorded at publish
    // time — a rename AFTER a publish changes head's names but not the
    // published files'; field ids in the manifest bridge the two
    def manifestMeta(manifest: java.nio.file.Path): (Option[Int], Seq[String]) = {
      val node = om.readTree(new String(Files.readAllBytes(manifest), "UTF-8"))
      val cols = Option(node.get("columns")).map(_.elements().asScala.map(c =>
        Option(c.get("id")).map(_.asLong()).getOrElse(-1L) -> c.get("name").asText()
      ).toMap).getOrElse(Map.empty[Long, String])
      val names = keyIds.map(id => cols.getOrElse(id.toLong, {
        val i = keyIds.indexOf(id); head.keyCols(i)
      }))
      (Option(node.get("buckets")).map(_.asInt()), names)
    }
    val BucketName = raw".*-b(\d+)\.parquet".r
    def fileBucket(p: java.nio.file.Path): Option[Int] = p.getFileName.toString match {
      case BucketName(b) => Some(b.toInt)
      case _ => None
    }

    // path → (bucket count, key names) of the manifest that shipped it
    val byPath = scala.collection.mutable.LinkedHashMap
      .empty[java.nio.file.Path, (Option[Int], Seq[String])]
    def addDataDir(stepDir: java.nio.file.Path): Unit = {
      val manifest = stepDir.resolve("manifest.json")
      val dataDir = stepDir.resolve("data")
      if (!Files.isDirectory(dataDir)) return
      // a chain step GC'd by expireSteps keeps a HEADLESS data dir whose
      // files newer steps still reference — no manifest to prune with, so
      // its files are conservative candidates under head key names
      val meta = if (Files.exists(manifest)) manifestMeta(manifest)
        else (None, head.keyCols)
      Files.list(dataDir).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .foreach(p => byPath.getOrElseUpdate(p.toAbsolutePath, meta))
    }
    var exports = 0
    Files.list(exportRoot).iterator().asScala
      .filterNot(_.getFileName.toString.startsWith("."))
      .filter(Files.isDirectory(_))
      .foreach { e =>
        exports += 1
        addDataDir(e) // a full export
        Files.list(e).iterator().asScala // or a chain of steps
          .filter(p => p.getFileName.toString.matches("v\\d+"))
          .foreach(addDataDir)
      }

    var candidates = 0
    var rewritten = 0
    var rowsPurged = 0L
    byPath.foreach { case (p, (nb, names)) =>
      val anyKey = perKey.exists { case (vals, hh) =>
        (hh, nb, fileBucket(p)) match {
          case (true, Some(n), Some(b)) =>
            b == graft.functions.XxHash64Host.bucketOf(vals, n)
          case _ => true // no layout info → conservative candidate
        }
      }
      if (anyKey) {
        candidates += 1
        val hit = rewriteWithoutKeys(spark, dir, p.toString, names, keyVals)
        if (hit > 0) { rewritten += 1; rowsPurged += hit }
      }
    }

    val n = Files.list(exportRoot).iterator().asScala
      .count(_.getFileName.toString.startsWith("purge-"))
    def jsKey(vals: Seq[Any]) = s"{${head.keyCols.zip(vals.map(String.valueOf(_)))
      .map { case (k, v) => s""""$k":"${v.replace("\\", "\\\\").replace("\"", "\\\"")}"""" }
      .mkString(",")}}"
    val json = s"""{"keys":[${keyVals.map(jsKey).mkString(",")}],
      |"exports":$exports,"files_rewritten":$rewritten,"rows_purged":$rowsPurged}""".stripMargin
    Files.write(exportRoot.resolve(s"purge-$n.json"), json.getBytes("UTF-8"))

    ExportPurgeStats(exports, byPath.size, candidates, rewritten, rowsPurged)
  }
}
