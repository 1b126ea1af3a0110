package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** READ-OPTIMIZED SNAPSHOT EXPORT — hand a snapshot to engines that don't
  * speak this table format (DuckDB, Trino, a plain `spark.read.parquet`).
  * The lakehouse analog of Delta's symlink manifests / Hive's external
  * tables: an export is a self-describing directory
  *
  * {{{
  *   <table>/export/<name>/manifest.json     # columns, row filter, lineage
  *   <table>/export/<name>/data/part-*.parquet
  * }}}
  *
  * whose data files are HARD LINKS to the snapshot's files — zero copy at
  * any scale, and the links keep the bytes alive even after `vacuum`
  * reclaims the source paths (an export is a physical pin, like a tag is a
  * metadata pin; on object stores the same design degrades to a file-list
  * manifest, which `manifest.json`'s `files` array already is).
  *
  * External readers know nothing about merge-on-read resolution or
  * per-file schema versions, so an export REFUSES anything they would
  * misread, rather than producing silently-wrong rows:
  *
  *  - NO DELTA FILES: a delta row supersedes a base row only through the
  *    engine's LWW fold; a raw reader would see both. Compact first.
  *  - UNIFORM SCHEMA VERSION: after a rename, old files carry the old
  *    physical column name that only the engine's field-id mapping
  *    reconciles. Compaction rewrites everything at the current version.
  *
  * Retained tombstones are fine — they are physical rows any engine can
  * filter, and the manifest carries the one-line predicate
  * (`row_filter`, portable SQL) that hides them. Staged-then-atomic-rename
  * publication; re-exporting the same name is idempotent for the same
  * source version and refuses loudly for a different one. */
object Export {

  final case class ExportInfo(
      dir: String,
      files: Int,
      /** Exact live rows when the manifest knows ([[MetaAgg.liveCount]]);
        * -1 when tombstone counts are unrecorded (legacy manifests). */
      rows: Long,
      rowFilter: String,
      columns: Seq[String],
      sourceVersion: Int,
      /** False when this call found an identical export already published
        * (idempotent re-run). */
      created: Boolean)

  /** Portable tombstone predicate — parses identically in Spark SQL and
    * DuckDB (and anything else ANSI-ish). */
  val RowFilter = "COALESCE(__del, FALSE) = FALSE"

  def exportSnapshot(dir: String, name: String, version: Option[Int] = None): ExportInfo = {
    require(name.nonEmpty && name.forall(c =>
        c.isLetterOrDigit || c == '-' || c == '_' || c == '.'),
      s"export name must be [A-Za-z0-9._-]+: '$name'")
    val snap = version.map(IceLite.loadVersion(dir, _)).getOrElse(IceLite.load(dir))
    require(snap.files.forall(!_.delta),
      "export requires a read-optimized (delta-free) snapshot: a raw reader " +
        "cannot resolve merge-on-read deltas — run Compaction.compact first")
    require(snap.files.forall(_.schemaVersion == snap.currentSchemaVersion),
      "export requires every file at the current schema version: old files' " +
        "physical column names predate renames — run Compaction.compact first")
    val target = Paths.get(dir, "export", name)
    val visible = snap.currentSchema.filterNot(_.hidden)
    if (Files.exists(target)) {
      val existing = readManifest(target)
      require(existing.sourceVersion == snap.version,
        s"export '$name' already published from version ${existing.sourceVersion}; " +
          s"pick a new name for version ${snap.version}")
      return existing.copy(created = false)
    }
    Files.createDirectories(target.getParent)
    val stage = Files.createTempDirectory(target.getParent, s".export-$name-")
    val dataDir = stage.resolve("data")
    Files.createDirectories(dataDir)
    val linked = snap.files.sortBy(_.path).zipWithIndex.map { case (f, i) =>
      val ln = dataDir.resolve(f"part-$i%05d-b${f.bucket}.parquet")
      Files.createLink(ln, Paths.get(f.path))
      s"data/${ln.getFileName}"
    }
    val rows = MetaAgg.liveCount(snap).getOrElse(-1L)
    val cols = visible.map(c => s"""{"name":${js(c.name)},"type":${js(c.dataType)},"id":${c.id}}""")
    val manifest =
      s"""{"name":${js(name)},"sourceVersion":${snap.version},"rows":$rows,
         |"buckets":${snap.buckets},
         |"rowFilter":${js(RowFilter)},
         |"columns":[${cols.mkString(",")}],
         |"files":[${linked.map(js).mkString(",")}]}""".stripMargin
    Files.write(stage.resolve("manifest.json"), manifest.getBytes("UTF-8"))
    try Files.move(stage, target, StandardCopyOption.ATOMIC_MOVE)
    catch {
      // lost a publish race: someone else's export is THE export — validate
      // it points at the same version and adopt it
      case _: java.nio.file.FileAlreadyExistsException |
           _: java.nio.file.DirectoryNotEmptyException =>
        org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
        val existing = readManifest(target)
        require(existing.sourceVersion == snap.version,
          s"export '$name' published concurrently from version ${existing.sourceVersion}")
        return existing.copy(created = false)
    }
    ExportInfo(target.toString, linked.size, rows, RowFilter,
      visible.map(_.name), snap.version, created = true)
  }

  // ── INCREMENTAL EXPORT CHAINS ──────────────────────────────────────────
  // Publishing a 100 TB table to external readers cannot re-link (let alone
  // re-copy) every file nightly. An export CHAIN ships each data file ONCE:
  // step vN links only the files that are new since the previous step and
  // its manifest lists the FULL logical file set, pointing unchanged files
  // back at the step that first shipped them ("v3/data/part-00012-b4.parquet",
  // relative to the chain root — the same trick Iceberg manifests and Delta
  // checkpoints use to avoid rewriting unchanged metadata). Because
  // compaction rewrites only touched buckets, a steady-state step ships
  // O(changed buckets), never O(table). Hard links make every step a
  // physical pin: bytes survive vacuum for as long as any step references
  // them, and dropping an old step frees exactly the files no newer step
  // still points to.

  final case class IncExportInfo(
      /** absolute path of this step's directory (chain/v<version>). */
      dir: String,
      chain: String,
      sourceVersion: Int,
      /** full logical file count of the snapshot this step serves. */
      filesTotal: Int,
      /** files newly hard-linked by THIS step (the shipped delta). */
      filesShipped: Int,
      /** files served by reference to earlier steps. */
      filesReused: Int,
      rows: Long,
      rowFilter: String,
      columns: Seq[String],
      /** chain-root-relative locations of the full file set, resolved:
        * `chainRoot/loc` is a readable parquet file. */
      locs: Seq[String],
      created: Boolean)

  /** Publish the CURRENT snapshot as the next step of export chain `chain`.
    * First call ships everything (a full export); later calls ship only
    * files absent from the previous step's manifest. Same refusals as
    * [[exportSnapshot]] (delta-free + uniform schema version — raw readers
    * can't resolve either), idempotent per source version, staged-then-
    * atomic-rename publication, concurrent publishers converge on one
    * winner per version. */
  def exportIncremental(dir: String, chain: String): IncExportInfo = {
    require(chain.nonEmpty && chain.forall(c =>
        c.isLetterOrDigit || c == '-' || c == '_' || c == '.'),
      s"chain name must be [A-Za-z0-9._-]+: '$chain'")
    val snap = IceLite.load(dir)
    require(snap.files.forall(!_.delta),
      "incremental export requires a read-optimized (delta-free) snapshot: " +
        "compact the touched buckets first")
    require(snap.files.forall(_.schemaVersion == snap.currentSchemaVersion),
      "incremental export requires every file at the current schema version")
    val chainRoot = Paths.get(dir, "export", chain)
    Files.createDirectories(chainRoot)
    val steps = chainSteps(chainRoot)
    // a RAW publisher must never extend a SANITIZED chain: reusing a
    // transformed predecessor's map would hard-link raw table bytes for
    // every changed bucket into a chain whose consumers rely on the
    // transform (un-pseudonymized values leaking past the sanitizer), and
    // adopting a transformed step as "this raw export" mislabels its
    // content. The reverse direction is already safe — a transformed
    // publisher ignores a raw predecessor and re-ships everything.
    (steps.sorted.lastOption.toSeq ++ steps.find(_ == snap.version)).distinct
      .foreach { v =>
        readTransformId(chainRoot, v).foreach { tid =>
          throw new IllegalArgumentException(
            s"chain '$chain' is a transformed chain (transformId '$tid' at " +
              s"v$v): extend it with exportTransformedIncremental, not " +
              "exportIncremental")
        }
      }
    steps.find(_ == snap.version).foreach { v =>
      return readIncManifest(chainRoot, v).copy(created = false)
    }
    require(steps.forall(_ < snap.version),
      s"chain '$chain' is already at version ${steps.max}, ahead of " +
        s"snapshot version ${snap.version} — a step never rewinds")
    // previous step's source-path → published-location map: the identity
    // check that decides shipped vs reused (paths are stable per file —
    // compaction/rebucket REPLACE files, never mutate them in place)
    val prev: Map[String, String] = steps.sorted.lastOption
      .map(v => readIncSources(chainRoot, v)).getOrElse(Map.empty)
    val stepName = s"v${snap.version}"
    val stage = Files.createTempDirectory(chainRoot, s".inc-$stepName-")
    val dataDir = stage.resolve("data")
    Files.createDirectories(dataDir)
    var shipped = 0
    val entries = snap.files.sortBy(_.path).zipWithIndex.map { case (f, i) =>
      prev.get(f.path) match {
        case Some(loc) => (f, loc)
        case None =>
          val ln = dataDir.resolve(f"part-$i%05d-b${f.bucket}.parquet")
          Files.createLink(ln, Paths.get(f.path))
          shipped += 1
          (f, s"$stepName/data/${ln.getFileName}")
      }
    }
    val visible = snap.currentSchema.filterNot(_.hidden)
    val rows = MetaAgg.liveCount(snap).getOrElse(-1L)
    val cols = visible.map(c =>
      s"""{"name":${js(c.name)},"type":${js(c.dataType)},"id":${c.id}}""")
    val fileArr = entries.map { case (f, loc) =>
      // per-file column bounds ride the manifest (from the CURRENT
      // snapshot's stats, so even a step-vOld reused file carries the
      // freshest bounds) — a raw reader's data-skipping index, the same
      // role Iceberg manifests' lower_bounds/upper_bounds play
      // clusterBy compactions record their dimension as sortCol/sortMin/
      // sortMax rather than colBounds — fold both into one bounds map
      val eff = f.colBounds ++
        f.sortCol.zip(f.sortMin.zip(f.sortMax)).toMap
      val bounds = if (eff.isEmpty) "" else
        s""","bounds":{${eff.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
          s"${js(c)}:[${js(mn)},${js(mx)}]" }.mkString(",")}}"""
      s"""{"source":${js(f.path)},"loc":${js(loc)}$bounds}"""
    }
    val manifest =
      s"""{"chain":${js(chain)},"sourceVersion":${snap.version},"rows":$rows,
         |"buckets":${snap.buckets},
         |"rowFilter":${js(RowFilter)},
         |"columns":[${cols.mkString(",")}],
         |"files":[${fileArr.mkString(",")}]}""".stripMargin
    Files.write(stage.resolve("manifest.json"), manifest.getBytes("UTF-8"))
    val target = chainRoot.resolve(stepName)
    try Files.move(stage, target, StandardCopyOption.ATOMIC_MOVE)
    catch {
      // lost the publish race for this version: the winner's step IS the
      // step — adopt it (same snapshot version ⇒ same logical content)
      case _: java.nio.file.FileAlreadyExistsException |
           _: java.nio.file.DirectoryNotEmptyException =>
        org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
        return readIncManifest(chainRoot, snap.version).copy(created = false)
    }
    IncExportInfo(target.toString, chain, snap.version, entries.size, shipped,
      entries.size - shipped, rows, RowFilter, visible.map(_.name),
      entries.map(_._2), created = true)
  }

  /** SANITIZED EXPORT CHAIN — a chain whose files are REWRITTEN through
    * column overrides (pseudonymize an identity column, redact text)
    * instead of hard-linked: consumers that must not see the raw values
    * cannot be served links to the raw bytes. Same incremental contract as
    * [[exportIncremental]] — step vN rewrites ONLY files new since the
    * previous step, unchanged sources reuse the previous step's
    * TRANSFORMED file, so steady-state transformation cost is O(changed
    * buckets), never O(table). `transformId` names the transform in the
    * manifest: a step only reuses a predecessor that applied the SAME
    * transform (a changed transform forces a full re-ship — reuse can
    * never serve a stale sanitization), and republishing the same version
    * under a different transformId refuses loudly. Hidden engine columns
    * (`__del`, `seq`, …) pass through untouched, so the manifest's
    * rowFilter keeps working; all chain machinery — [[readIncremental]],
    * [[incrementalFiles]], [[expireSteps]], purge — applies unchanged. */
  def exportTransformedIncremental(spark: org.apache.spark.sql.SparkSession,
      dir: String, chain: String, transformId: String,
      overrides: Map[String, org.apache.spark.sql.Column]): IncExportInfo = {
    require(chain.nonEmpty && chain.forall(c =>
        c.isLetterOrDigit || c == '-' || c == '_' || c == '.'),
      s"chain name must be [A-Za-z0-9._-]+: '$chain'")
    require(transformId.nonEmpty && transformId.forall(c =>
        c.isLetterOrDigit || c == '-' || c == '_' || c == '.'),
      s"transformId must be [A-Za-z0-9._-]+: '$transformId'")
    require(overrides.nonEmpty, "a transformed chain needs at least one override")
    val snap = IceLite.load(dir)
    require(snap.files.forall(!_.delta),
      "transformed export requires a read-optimized (delta-free) snapshot")
    require(snap.files.forall(_.schemaVersion == snap.currentSchemaVersion),
      "transformed export requires every file at the current schema version")
    val visible = snap.currentSchema.filterNot(_.hidden)
    overrides.keys.foreach(k => require(visible.exists(_.name == k),
      s"override target '$k' is not a visible column"))
    val chainRoot = Paths.get(dir, "export", chain)
    Files.createDirectories(chainRoot)
    val steps = chainSteps(chainRoot)
    steps.find(_ == snap.version).foreach { v =>
      require(readTransformId(chainRoot, v).contains(transformId),
        s"step v$v already published with a different transform")
      return readIncManifest(chainRoot, v).copy(created = false)
    }
    require(steps.forall(_ < snap.version),
      s"chain '$chain' is already ahead of snapshot version ${snap.version}")
    // reuse ONLY a same-transform predecessor — otherwise full re-ship
    val prev: Map[String, String] = steps.sorted.lastOption
      .filter(v => readTransformId(chainRoot, v).contains(transformId))
      .map(v => readIncSources(chainRoot, v)).getOrElse(Map.empty)
    val stepName = s"v${snap.version}"
    val stage = Files.createTempDirectory(chainRoot, s".san-$stepName-")
    val dataDir = stage.resolve("data")
    Files.createDirectories(dataDir)
    // per-file transform jobs are independent (distinct temp dirs, distinct
    // targets): ship a few concurrently so one file's job latency doesn't
    // serialize the step (guide §2.6 overlap); entry order is preserved by
    // the ordered parallel map
    val shippedCtr = new java.util.concurrent.atomic.AtomicInteger(0)
    import scala.collection.parallel.CollectionConverters._
    val shipPool = new java.util.concurrent.ForkJoinPool(4)
    val parFiles = snap.files.sortBy(_.path).zipWithIndex.par
    parFiles.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(shipPool)
    val entries = try parFiles.map { case (f, i) =>
      prev.get(f.path) match {
        case Some(loc) => (f, loc)
        case None =>
          val target = dataDir.resolve(f"part-$i%05d-b${f.bucket}.parquet")
          val df0 = spark.read.parquet(f.path)
          val df = overrides.foldLeft(df0) { case (d, (k, c)) => d.withColumn(k, c) }
          val tmp = Files.createTempDirectory(stage, ".xf-")
          df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = Files.list(tmp).iterator().asScala
            .find(_.toString.endsWith(".parquet"))
            .getOrElse(throw new IllegalStateException(s"no parquet for ${f.path}"))
          Files.move(part, target, StandardCopyOption.ATOMIC_MOVE)
          org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
          shippedCtr.incrementAndGet()
          (f, s"$stepName/data/${target.getFileName}")
      }
    }.toVector finally shipPool.shutdown()
    val shipped = shippedCtr.get()
    val rows = MetaAgg.liveCount(snap).getOrElse(-1L)
    val cols = visible.map(c =>
      s"""{"name":${js(c.name)},"type":${js(c.dataType)},"id":${c.id}}""")
    val fileArr = entries.map { case (f, loc) =>
      s"""{"source":${js(f.path)},"loc":${js(loc)}}"""
    }
    val manifest =
      s"""{"chain":${js(chain)},"sourceVersion":${snap.version},"rows":$rows,
         |"buckets":${snap.buckets},
         |"transformId":${js(transformId)},
         |"rowFilter":${js(RowFilter)},
         |"columns":[${cols.mkString(",")}],
         |"files":[${fileArr.mkString(",")}]}""".stripMargin
    Files.write(stage.resolve("manifest.json"), manifest.getBytes("UTF-8"))
    val target = chainRoot.resolve(stepName)
    try Files.move(stage, target, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: java.nio.file.DirectoryNotEmptyException =>
        org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
        require(readTransformId(chainRoot, snap.version).contains(transformId),
          s"step v${snap.version} published concurrently with a different transform")
        return readIncManifest(chainRoot, snap.version).copy(created = false)
    }
    IncExportInfo(target.toString, chain, snap.version, entries.size, shipped,
      entries.size - shipped, rows, RowFilter, visible.map(_.name),
      entries.map(_._2), created = true)
  }

  private def readTransformId(chainRoot: Path, version: Int): Option[String] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(Files.readAllBytes(
        chainRoot.resolve(s"v$version").resolve("manifest.json")), "UTF-8"))
    Option(node.get("transformId")).map(_.asText())
  }

  /** Read a chain step's manifest back (latest step when `version` is
    * None). `locs` come back resolvable as `<table>/export/<chain>/<loc>`. */
  def readIncremental(dir: String, chain: String,
      version: Option[Int] = None): IncExportInfo = {
    val chainRoot = Paths.get(dir, "export", chain)
    val steps = chainSteps(chainRoot)
    require(steps.nonEmpty, s"no published steps in chain '$chain'")
    val v = version.getOrElse(steps.max)
    require(steps.contains(v), s"chain '$chain' has no step v$v (has ${steps.sorted})")
    readIncManifest(chainRoot, v)
  }

  /** Absolute paths of a chain step's full file set — the raw-reader
    * surface (feed straight to `spark.read.parquet` / `parquet_scan`). */
  def incrementalFiles(dir: String, chain: String,
      version: Option[Int] = None): Seq[String] = {
    val chainRoot = Paths.get(dir, "export", chain)
    readIncremental(dir, chain, version).locs
      .map(l => chainRoot.resolve(l).toString)
  }

  /** DATA-SKIPPING read surface for raw readers: the step's file set
    * pruned host-side to files whose manifest-recorded bounds can overlap
    * every ANDed range predicate `(column, lo, hi)` — no engine, no file
    * opens, just the manifest (the consumer-side half of Iceberg's
    * lower/upper-bounds pruning). Sound by construction: a file without
    * recorded bounds for a column is always kept, and exports are
    * delta-free so no merge-on-read resolution can leak a pruned row.
    * Numeric columns compare numerically (via the manifest's declared
    * type), strings as UTF-8. Feed the result to `spark.read.parquet` /
    * `parquet_scan` and re-apply the exact predicate. */
  def prunedIncrementalFiles(dir: String, chain: String,
      preds: Seq[(String, Any, Any)],
      version: Option[Int] = None): Seq[String] = {
    val chainRoot = Paths.get(dir, "export", chain)
    val steps = chainSteps(chainRoot)
    require(steps.nonEmpty, s"no published steps in chain '$chain'")
    val v = version.getOrElse(steps.max)
    require(steps.contains(v), s"chain '$chain' has no step v$v (has ${steps.sorted})")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(Files.readAllBytes(
        chainRoot.resolve(s"v$v").resolve("manifest.json")), "UTF-8"))
    val typeByName = node.get("columns").elements().asScala
      .map(c => c.get("name").asText() -> c.get("type").asText()).toMap
    def cmpFor(colName: String): (String, String) => Int =
      typeByName.get(colName).map(_.toUpperCase) match {
        case Some("BIGINT" | "INT" | "INTEGER" | "SMALLINT") =>
          (a, b) => java.lang.Long.compare(a.toLong, b.toLong)
        case Some("DOUBLE" | "FLOAT" | "REAL") =>
          (a, b) => java.lang.Double.compare(a.toDouble, b.toDouble)
        case _ => IceLite.utf8Compare
      }
    val compiled = preds.map { case (c, lo, hi) =>
      (c, cmpFor(c), String.valueOf(lo), String.valueOf(hi))
    }
    node.get("files").elements().asScala.filter { fe =>
      val bounds = Option(fe.get("bounds"))
      !compiled.exists { case (c, cmp, loS, hiS) =>
        bounds.flatMap(b => Option(b.get(c))).exists { arr =>
          val mn = arr.get(0).asText(); val mx = arr.get(1).asText()
          cmp(mx, loS) < 0 || cmp(mn, hiS) > 0
        }
      }
    }.map(fe => chainRoot.resolve(fe.get("loc").asText()).toString).toSeq
  }

  /** STREAMING PUBLICATION policy — one call per applied micro-batch (wire
    * as `Tail.start(onBatchCommitted = ...)`): compact exactly the buckets
    * that block a publish (delta-bearing ones, plus any at a stale schema
    * version — non-empty only right after a mid-stream DDL/evolution, a
    * one-time rewrite), then publish the next chain step. Steady-state
    * cost per batch is O(buckets the batch touched); the chain TRACKS the
    * stream. Idempotent per snapshot version (exportIncremental's
    * contract); a crash between the compact and the publish just defers
    * the step to the next batch — the chain may lag, never lie. */
  def publishStep(spark: org.apache.spark.sql.SparkSession, dir: String,
      chain: String, epochTag: String): IncExportInfo = {
    val snap = IceLite.load(dir)
    val blocking = snap.files.filter(f =>
      f.delta || f.schemaVersion != snap.currentSchemaVersion).map(_.bucket).toSet
    if (blocking.nonEmpty)
      Compaction.compact(spark, dir, epochTag, buckets = Some(blocking))
    exportIncremental(dir, chain)
  }

  final case class ChainGcStats(
      stepsDropped: Int,
      /** files deleted — no retained step references them. */
      filesFreed: Int,
      /** dropped steps' files kept on disk because a retained step's
        * manifest still points at them. */
      filesRetained: Int)

  /** Chain retention: drop every step but the newest `keepLast`, freeing
    * EXACTLY the files no retained step still points to. A retained step's
    * manifest may reference files physically shipped by a dropped step
    * (that is the chain's whole reuse design) — those files stay in the
    * dropped step's `data/` dir, headless but referenced; only genuinely
    * unreferenced files are deleted. The dropped step's manifest goes
    * FIRST (one unlink — the step atomically stops being readable before
    * any of its bytes do), so a crash mid-GC leaves orphan data files
    * (re-droppable, never a dangling manifest). Without this, a nightly
    * chain grows O(days × changed buckets) forever. */
  def expireSteps(dir: String, chain: String, keepLast: Int): ChainGcStats = {
    require(keepLast >= 1, "keepLast must retain at least the newest step")
    val chainRoot = Paths.get(dir, "export", chain)
    val steps = chainSteps(chainRoot).sorted
    val drop = steps.dropRight(keepLast)
    if (drop.isEmpty) return ChainGcStats(0, 0, 0)
    val referenced: Set[String] =
      steps.takeRight(keepLast).flatMap(v => readIncManifest(chainRoot, v).locs).toSet
    var freed = 0
    var retained = 0
    drop.foreach { v =>
      val stepDir = chainRoot.resolve(s"v$v")
      Files.deleteIfExists(stepDir.resolve("manifest.json"))
      val dataDir = stepDir.resolve("data")
      if (Files.isDirectory(dataDir)) {
        Files.list(dataDir).iterator().asScala.toSeq.foreach { p =>
          if (referenced(s"v$v/data/${p.getFileName}")) retained += 1
          else { Files.deleteIfExists(p); freed += 1 }
        }
        if (!Files.list(dataDir).iterator().hasNext) {
          Files.deleteIfExists(dataDir)
          Files.deleteIfExists(stepDir)
        }
      }
    }
    ChainGcStats(drop.size, freed, retained)
  }

  /** Published (readable) steps = v-dirs that still carry their manifest —
    * a GC'd step's headless data dir is storage for newer steps' reused
    * locs, not a step. */
  private def chainSteps(chainRoot: Path): Seq[Int] = {
    if (!Files.exists(chainRoot)) return Nil
    Files.list(chainRoot).iterator().asScala
      .filter(p => Files.exists(p.resolve("manifest.json")))
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d+") => s.drop(1).toInt }
      .toSeq
  }

  private def readIncManifest(chainRoot: Path, version: Int): IncExportInfo = {
    val target = chainRoot.resolve(s"v$version")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(
        Files.readAllBytes(target.resolve("manifest.json")), "UTF-8"))
    val stepPrefix = s"v$version/"
    val locs = node.get("files").elements().asScala
      .map(_.get("loc").asText()).toSeq
    IncExportInfo(
      target.toString,
      node.get("chain").asText(),
      version,
      locs.size,
      locs.count(_.startsWith(stepPrefix)),
      locs.count(!_.startsWith(stepPrefix)),
      node.get("rows").asLong(),
      node.get("rowFilter").asText(),
      node.get("columns").elements().asScala.map(_.get("name").asText()).toSeq,
      locs,
      created = true)
  }

  private def readIncSources(chainRoot: Path, version: Int): Map[String, String] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(Files.readAllBytes(
        chainRoot.resolve(s"v$version").resolve("manifest.json")), "UTF-8"))
    node.get("files").elements().asScala
      .map(f => f.get("source").asText() -> f.get("loc").asText()).toMap
  }

  /** Load a published export's manifest. */
  def readManifest(target: Path): ExportInfo = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(Files.readAllBytes(target.resolve("manifest.json")), "UTF-8"))
    ExportInfo(
      target.toString,
      node.get("files").size(),
      node.get("rows").asLong(),
      node.get("rowFilter").asText(),
      node.get("columns").elements().asScala.map(_.get("name").asText()).toSeq,
      node.get("sourceVersion").asInt(),
      created = true)
  }

  /** Drop a published export (the snapshot itself is untouched; hard-linked
    * bytes survive wherever another link still references them). */
  def removeExport(dir: String, name: String): Boolean = {
    val target = Paths.get(dir, "export", name)
    if (!Files.exists(target)) false
    else { org.apache.commons.io.FileUtils.deleteDirectory(target.toFile); true }
  }

  private def js(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
