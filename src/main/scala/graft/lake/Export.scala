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
