package graft.lake

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType, MetadataBuilder}
import scala.jdk.CollectionConverters._

/** IceLite — an Iceberg-semantics table layer owned by this engine
  * (SURVEY.md §7.1): parquet data files + JSON snapshot metadata,
  * field-ID-based schema evolution, atomic commit-by-rename with
  * epoch fencing (exactly-once sink), snapshot history for resume.
  *
  * Layout:
  *   <dir>/meta/v00000.json …   — snapshots; latest = max version
  *   <dir>/data/epoch=<e>/…     — parquet data files, hash-bucketed on key
  *
  * On a production object store the create-if-absent link would be a
  * conditional PUT / catalog compare-and-swap (Iceberg's commit protocol);
  * the local-FS link(2) has the same linearizability contract.
  */
object IceLite {

  /** One table column: `id` is the proto field number (Iceberg field-ID
    * semantics — rename keeps the id, so old files map by id, not name).
    * Negative ids are engine-reserved hidden columns (CDC bookkeeping). */
  final case class ColDef(id: Int, name: String, dataType: String) {
    def sparkType: DataType = DataType.fromDDL(dataType)
    def hidden: Boolean = id < 0
  }

  /** Hidden CDC bookkeeping columns: last applied sequence per key and the
    * tombstone flag. Version-ordered MERGE compares against __seq so
    * out-of-order / late / replayed events are absorbed (LWW); tombstones
    * keep DELETEs winning over late lower-seq upserts. */
  val SeqCol = ColDef(-1, "__seq", "BIGINT")
  val DelCol = ColDef(-2, "__del", "BOOLEAN")
  def withCdcCols(schema: Vector[ColDef]): Vector[ColDef] = schema :+ SeqCol :+ DelCol

  /** `delta = true` marks a merge-on-read file: it holds ONLY one epoch's
    * change rows for its bucket (newest-seq-wins against older files at
    * read time) rather than the bucket's full resolved state. */
  final case class DataFile(path: String, bucket: Int, rows: Long, schemaVersion: Int,
      delta: Boolean = false)

  final case class Snapshot(
      version: Int,
      /** committed epoch ids. NAMESPACED strings ("replay-3", "tail-<uuid>-7")
        * so fences from different sources (batch replay partition numbers vs
        * streaming batchIds, which restart at 0 with a fresh checkpoint)
        * can never collide and silently drop each other's batches. */
      epochs: Vector[String],
      /** all schema versions ever committed; last = current. Index = schemaVersion. */
      schemas: Vector[Vector[ColDef]],
      keyCols: Vector[String],
      buckets: Int,
      files: Vector[DataFile],
      /** highest __seq ever committed — the change-feed watermark: rows in
        * later snapshots with __seq above OUR maxSeq are exactly the
        * changes applied after this snapshot. */
      maxSeq: Long = -1L) {
    def currentSchemaVersion: Int = schemas.length - 1
    def currentSchema: Vector[ColDef] = schemas.last
    def currentStruct: StructType = structOf(currentSchema)
    def hasEpoch(e: String): Boolean = epochs.contains(e)
  }

  def structOf(cols: Seq[ColDef]): StructType = StructType(cols.map { c =>
    StructField(c.name, c.sparkType, nullable = true,
      new MetadataBuilder().putLong("graft.fieldId", c.id.toLong).build())
  })

  /** Extract (id,name,type) triples from a DataFrame schema whose columns
    * carry "graft.fieldId" metadata (as produced by decode.SparkSchema). */
  def colDefsOf(schema: StructType): Vector[ColDef] = schema.fields.toVector.map { f =>
    val id =
      if (f.metadata.contains("graft.fieldId")) f.metadata.getLong("graft.fieldId").toInt
      else throw new IllegalArgumentException(s"column ${f.name} lacks graft.fieldId metadata")
    ColDef(id, f.name, f.dataType.sql)
  }

  // ------------------------------------------------------------------ json

  private val mapper = new ObjectMapper()

  private def toJson(s: Snapshot): String = {
    val root = mapper.createObjectNode()
    root.put("version", s.version)
    val eps = root.putArray("epochs"); s.epochs.foreach(eps.add)
    val schemas = root.putArray("schemas")
    s.schemas.foreach { cols =>
      val arr = schemas.addArray()
      cols.foreach { c =>
        val o = arr.addObject()
        o.put("id", c.id); o.put("name", c.name); o.put("type", c.dataType)
      }
    }
    val keys = root.putArray("keyCols"); s.keyCols.foreach(keys.add)
    root.put("buckets", s.buckets)
    root.put("maxSeq", s.maxSeq)
    val files = root.putArray("files")
    s.files.foreach { f =>
      val o = files.addObject()
      o.put("path", f.path); o.put("bucket", f.bucket)
      o.put("rows", f.rows); o.put("schemaVersion", f.schemaVersion)
      if (f.delta) o.put("delta", true)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private def fromJson(json: String): Snapshot = {
    val n = mapper.readTree(json)
    Snapshot(
      version = n.get("version").asInt(),
      epochs = n.get("epochs").elements().asScala.map(_.asText()).toVector,
      schemas = n.get("schemas").elements().asScala.map { arr =>
        arr.elements().asScala.map(c =>
          ColDef(c.get("id").asInt(), c.get("name").asText(), c.get("type").asText())).toVector
      }.toVector,
      keyCols = n.get("keyCols").elements().asScala.map(_.asText()).toVector,
      buckets = n.get("buckets").asInt(),
      maxSeq = Option(n.get("maxSeq")).map(_.asLong()).getOrElse(-1L),
      files = n.get("files").elements().asScala.map(f =>
        DataFile(f.get("path").asText(), f.get("bucket").asInt(),
          f.get("rows").asLong(), f.get("schemaVersion").asInt(),
          delta = Option(f.get("delta")).exists(_.asBoolean()))).toVector)
  }

  // ---------------------------------------------------------------- commits

  private def metaDir(dir: String): Path = Paths.get(dir, "meta")
  private def snapPath(dir: String, v: Int): Path = metaDir(dir).resolve(f"v$v%05d.json")

  def create(dir: String, schema: Vector[ColDef], keyCols: Vector[String], buckets: Int): Snapshot = {
    Files.createDirectories(metaDir(dir))
    Files.createDirectories(Paths.get(dir, "data"))
    val snap = Snapshot(0, Vector.empty, Vector(schema), keyCols, buckets, Vector.empty)
    writeAtomic(dir, snap)
    snap
  }

  def exists(dir: String): Boolean =
    Files.isDirectory(metaDir(dir)) && latestVersion(dir).isDefined

  private def latestVersion(dir: String): Option[Int] = {
    val md = metaDir(dir)
    if (!Files.isDirectory(md)) return None
    val vs = Files.list(md).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") => s.drop(1).dropRight(5).toInt }
      .toVector
    if (vs.isEmpty) None else Some(vs.max)
  }

  def load(dir: String): Snapshot = {
    val v = latestVersion(dir).getOrElse(
      throw new IllegalStateException(s"no IceLite table at $dir"))
    fromJson(new String(Files.readAllBytes(snapPath(dir, v)), "UTF-8"))
  }

  /** Snapshot history (time travel / resume ledger). */
  def history(dir: String): Vector[Int] = {
    val md = metaDir(dir)
    Files.list(md).iterator().asScala.map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") => s.drop(1).dropRight(5).toInt }
      .toVector.sorted
  }

  def loadVersion(dir: String, v: Int): Snapshot =
    fromJson(new String(Files.readAllBytes(snapPath(dir, v)), "UTF-8"))

  /** Atomic create-if-absent: write a tmp file, then hard-LINK it to the
    * snapshot name — link(2) fails atomically with EEXIST when the target
    * exists, so of two racing committers of the same version exactly one
    * wins. (A plain rename/ATOMIC_MOVE silently REPLACES on POSIX — that
    * would be last-writer-wins, i.e. a lost update.) On an object store
    * this is a conditional PUT / catalog compare-and-swap. */
  private def writeAtomic(dir: String, snap: Snapshot): Boolean = {
    val tmp = Files.createTempFile(metaDir(dir), ".tmp-snap", ".json")
    try {
      Files.write(tmp, toJson(snap).getBytes("UTF-8"))
      Files.createLink(snapPath(dir, snap.version), tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  /** What one epoch changes: which buckets' files it replaces, the files it
    * adds (their `schemaVersion` is assigned at commit time against whatever
    * snapshot the commit lands on), and the schema those files conform to. */
  final case class CommitDelta(
      epochId: String,
      touched: Set[Int],
      addFiles: Vector[DataFile],
      dataSchema: Vector[ColDef],
      /** highest __seq in this epoch's batch (-1 = none/unknown). */
      maxSeq: Long = -1L)

  /** Commit `delta` on top of `base`. Returns the committed snapshot, or the
    * CURRENT snapshot unchanged if the epoch was already committed by someone
    * else (idempotent replay — the exactly-once fence, SURVEY.md §2.3).
    *
    * Concurrency contract: if another committer landed since `base` was read,
    * the delta is REBASED onto the current snapshot — its file replacements
    * and epoch entry are re-applied so the intervening commit's data files
    * and epochs are preserved (no lost update). Rebase is only legal when the
    * intervening commits are disjoint: if they replaced files in any of OUR
    * touched buckets, or evolved the schema away from ours, our rewritten
    * bucket files were derived from stale data — the commit FAILS LOUDLY with
    * ConcurrentModificationException and the caller must re-run the merge
    * (Iceberg's validation-then-retry protocol). */
  def commit(dir: String, base: Snapshot, delta: CommitDelta): Snapshot = {
    var cur = base
    var guard = 0
    while (guard < 10000) {
      if (cur.hasEpoch(delta.epochId)) return cur // fenced: duplicate epoch is a no-op
      if (cur.version != base.version) {
        val oursAtBase = base.files.filter(f => delta.touched(f.bucket)).toSet
        val oursAtCur = cur.files.filter(f => delta.touched(f.bucket)).toSet
        if (oursAtBase != oursAtCur)
          throw new java.util.ConcurrentModificationException(
            s"epoch ${delta.epochId}: concurrent commit replaced files in touched buckets; re-run the merge against the current snapshot")
        if (cur.schemas != base.schemas && cur.currentSchema != delta.dataSchema)
          throw new java.util.ConcurrentModificationException(
            s"epoch ${delta.epochId}: concurrent schema evolution; re-run the merge against the current snapshot")
      }
      val schemas2 =
        if (delta.dataSchema == cur.currentSchema) cur.schemas else cur.schemas :+ delta.dataSchema
      val sv = schemas2.length - 1
      val attempt = cur.copy(
        version = cur.version + 1,
        epochs = cur.epochs :+ delta.epochId,
        schemas = schemas2,
        files = cur.files.filterNot(f => delta.touched(f.bucket)) ++
          delta.addFiles.map(_.copy(schemaVersion = sv)),
        maxSeq = math.max(cur.maxSeq, delta.maxSeq))
      if (writeAtomic(dir, attempt)) return attempt
      cur = load(dir) // lost the race — re-read, re-fence, rebase or fail
      guard += 1
    }
    throw new IllegalStateException("commit retry limit exceeded")
  }

  // ------------------------------------------------------------------ reads

  /** Read a set of data files, mapping each file's stored schema version to
    * the CURRENT schema by field id: renamed columns re-aliased, missing
    * columns null-filled, widened columns cast (Iceberg read semantics).
    *
    * Merge-on-read resolution: buckets carrying delta files are resolved to
    * one row per key (newest __seq wins — one hash shuffle over ONLY those
    * buckets' rows); buckets with base files alone are emitted as-is, no
    * shuffle. Callers that run their own per-key LWW (the MERGE itself)
    * pass `resolve = false` to avoid a redundant exchange. */
  def read(spark: SparkSession, snap: Snapshot, fileFilter: DataFile => Boolean = _ => true,
      includeHidden: Boolean = false, resolve: Boolean = true): DataFrame = {

    val cur = snap.currentSchema
    def mapped(files: Seq[DataFile]): Option[DataFrame] = {
      val groups = files.groupBy(_.schemaVersion)
      groups.toSeq.sortBy(_._1).map { case (sv, fs) =>
        val old = snap.schemas(sv)
        val oldById = old.map(c => c.id -> c).toMap
        val df = spark.read.schema(structOf(old)).parquet(fs.map(_.path): _*)
        df.select(cur.map { c =>
          oldById.get(c.id) match {
            case Some(oc) => col(oc.name).cast(c.sparkType).as(c.name)
            case None => lit(null).cast(c.sparkType).as(c.name)
          }
        }: _*)
      }.reduceOption(_.unionAll(_))
    }

    val selected = snap.files.filter(fileFilter)
    val morBuckets = selected.filter(_.delta).map(_.bucket).toSet
    val (unresolved, plain) =
      if (resolve) selected.partition(f => morBuckets.contains(f.bucket))
      else (Vector.empty[DataFile], selected)

    val plainDf = mapped(plain)
    val resolvedDf = mapped(unresolved).map { df =>
      // newest version per key wins; ties impossible (seq is a total order
      // per key). Tombstones survive resolution so downstream filtering /
      // compaction sees them.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(snap.keyCols.map(col): _*).orderBy(col(SeqCol.name).desc)
      df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
    }

    val all = (plainDf ++ resolvedDf).reduceOption(_.unionAll(_)).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.currentStruct))
    if (includeHidden) all
    else {
      val hidden = cur.filter(_.hidden).map(_.name)
      val live = if (hidden.contains(DelCol.name))
        all.where(!coalesce(col(DelCol.name), lit(false))) else all
      live.drop(hidden: _*)
    }
  }

  def readBuckets(spark: SparkSession, snap: Snapshot, buckets: Set[Int]): DataFrame =
    read(spark, snap, f => buckets.contains(f.bucket))

  /** Incremental CHANGE FEED between two committed snapshot versions: every
    * change row applied after `fromVersion`, up to and including
    * `toVersion` — upserts plus DELETE tombstones (__del = true), with
    * __seq exposed for downstream ordering. Cost is O(changed files): only
    * files added after `fromVersion` are read (with merge-on-read those are
    * the epochs' delta files), filtered by the from-snapshot's __seq
    * watermark so rows carried along by inline COW compactions are
    * excluded. This is the "CDC out" side of the engine: a downstream
    * consumer can tail the table itself incrementally. NOTE: if a COW
    * compaction ran inside the version window, intermediate versions of a
    * key collapse to the newest (net-change semantics); consume between
    * adjacent versions for the full per-epoch change stream. */
  def changes(spark: SparkSession, dir: String, fromVersion: Int, toVersion: Int): DataFrame = {
    val from = loadVersion(dir, fromVersion)
    val to = loadVersion(dir, toVersion)
    val old = from.files.map(_.path).toSet
    val changed = read(spark, to, f => !old.contains(f.path),
      includeHidden = true, resolve = false)
    changed.filter(col(SeqCol.name) > from.maxSeq)
  }

  /** The bucket expression — xxhash64 on the key columns mod B. Balanced
    * (not repo-only) so hot repos don't produce hot buckets; hot-KEY skew in
    * the merge join is handled by AQE + salting in Merge. */
  def bucketExpr(keyCols: Seq[String], buckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(buckets.toLong)).cast("int")

  /** Point lookup by full key: computes the key's bucket, reads ONLY that
    * bucket's files (1/B of the table), applies the key filter (pushed to
    * the parquet scan — files are key-sorted within buckets, so row-group
    * stats prune further). The lake's O(table/B) primary-key get. */
  def lookup(spark: SparkSession, snap: Snapshot, key: Map[String, Any]): DataFrame = {
    require(snap.keyCols.forall(key.contains), s"need all key cols ${snap.keyCols}")
    val bucket = spark.range(1)
      .select(snap.keyCols.map(k => lit(key(k)).as(k)): _*)
      .select(bucketExpr(snap.keyCols, snap.buckets))
      .head().getInt(0)
    snap.keyCols.foldLeft(readBuckets(spark, snap, Set(bucket))) { (df, k) =>
      df.filter(col(k) === lit(key(k)))
    }
  }
}
