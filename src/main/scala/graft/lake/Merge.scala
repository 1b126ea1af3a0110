package graft.lake

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import scala.jdk.CollectionConverters._
import IceLite._

/** Key-partitioned MERGE INTO upsert (SURVEY.md §2.3):
  * dedup batch to one row/key (max_by over the CDC sequence) →
  * schema-evolve the table → full-outer join against only the touched
  * buckets → rewrite those buckets → atomic epoch-fenced commit.
  *
  * Scale notes (100 TB design point):
  *  - the ONLY wide shuffle per epoch is the merge join, keyed on the table
  *    key; both sides hash-partition identically, AQE handles residual skew
  *    (hot keys are already spread because buckets hash (repo, path), not repo);
  *  - untouched buckets are carried forward — merge cost is
  *    O(batch + tableSize × touchedBuckets / totalBuckets), not O(tableSize);
  *  - dedup is a partial-agg-friendly hash aggregate (max_by), no sort.
  */
object Merge {

  final case class MergeStats(
      epochId: Long,
      applied: Boolean,
      batchRows: Long,
      upserts: Long,
      deletes: Long,
      touchedBuckets: Int,
      rewrittenRows: Long)

  /** Evolve `current` schemas with the update batch's columns, matched by
    * field id: new id → append column; same id, new name → rename; same id,
    * int→bigint → widen (Iceberg-compatible evolution set). */
  def evolve(current: Vector[ColDef], incoming: Vector[ColDef]): Vector[ColDef] = {
    val byId = current.map(c => c.id -> c).toMap
    val updated = current.map { c =>
      incoming.find(_.id == c.id) match {
        case Some(in) if in.name != c.name || widens(c, in) =>
          c.copy(name = in.name, dataType = if (widens(c, in)) in.dataType else c.dataType)
        case _ => c
      }
    }
    val added = incoming.filterNot(in => byId.contains(in.id))
    updated ++ added
  }

  private def widens(oldC: ColDef, newC: ColDef): Boolean =
    (oldC.sparkType, newC.sparkType) match {
      case (IntegerType, LongType) => true
      case (org.apache.spark.sql.types.FloatType, org.apache.spark.sql.types.DoubleType) => true
      case _ => false
    }

  /** Apply one batch of change rows to the table at `dir`.
    *
    * `updates` columns: the table's data columns (carrying graft.fieldId
    * metadata) — must include the key columns — plus `seqCol` (LONG, total
    * order per key; last writer wins) and `opCol` (STRING, "UPSERT"|"DELETE").
    */
  def mergeEpoch(
      spark: SparkSession,
      dir: String,
      updates: DataFrame,
      seqCol: String,
      opCol: String,
      epochId: Long): MergeStats = {

    val base = IceLite.load(dir)
    if (base.hasEpoch(epochId)) // exactly-once fence: replayed epoch is a no-op
      return MergeStats(epochId, applied = false, 0, 0, 0, 0, 0)

    val keyCols = base.keyCols
    val dataColDefs = colDefsOf(org.apache.spark.sql.types.StructType(
      updates.schema.fields.filterNot(f => f.name == seqCol || f.name == opCol)))
    val newSchema = evolve(base.currentSchema, dataColDefs)
    val schemas = if (newSchema == base.currentSchema) base.schemas else base.schemas :+ newSchema
    val schemaVersion = schemas.length - 1

    // ---- 1. dedup to one row per key: hash agg (partial+final), no sort
    val allCols = updates.columns
    val deduped = updates
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(allCols.map(col): _*), col(seqCol)).as("__r"))
      .select((keyCols.map(k => col(k)) ++
        allCols.filterNot(keyCols.contains).map(c => col(s"__r.$c").as(c))): _*)
      .withColumn("__bucket", bucketExpr(keyCols, base.buckets))

    deduped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE action for all batch stats: per-bucket row/delete counts (≤ B rows)
    val bucketStats = deduped.groupBy("__bucket")
      .agg(count(lit(1)).as("n"),
        sum(when(col(opCol) === "DELETE", 1L).otherwise(0L)).as("dels"))
      .collect()
    val touched = bucketStats.map(_.getInt(0)).toSet
    val batchRows = bucketStats.map(_.getLong(1)).sum
    val deletes = bucketStats.map(_.getLong(2)).sum

    if (batchRows == 0) {
      deduped.unpersist()
      val next = base.copy(epochs = base.epochs :+ epochId, schemas = schemas)
      IceLite.commit(dir, base, next, epochId)
      return MergeStats(epochId, applied = true, 0, 0, 0, 0, 0)
    }

    // ---- 2. target side: only touched buckets, mapped to the evolved schema,
    // WITH the hidden CDC columns (__seq per key, __del tombstone)
    val target = IceLite.read(spark, base.copy(schemas = schemas),
      f => touched.contains(f.bucket), includeHidden = true)

    // ---- 3. version-ordered full-outer merge on the key: the update wins
    // only if its seq is newer than the last applied seq — late, duplicate
    // and out-of-order events (across epochs) are absorbed; DELETEs persist
    // as tombstones so a late lower-seq upsert cannot resurrect a key
    val visible = newSchema.filterNot(_.hidden)
    val visCols = visible.map(_.name)
    // updates may lack columns the evolved table has (old-descriptor events
    // into an evolved table) — null-fill those, Iceberg-style
    val updCols = deduped.columns.toSet
    val u = deduped.select(
      (visible.map(cd =>
        (if (updCols(cd.name)) col(cd.name).cast(cd.sparkType)
         else lit(null).cast(cd.sparkType)).as(s"__u_${cd.name}")) :+
        col(seqCol).as("__u_seq") :+ col(opCol).as("__u_op")): _*)
    val t = target.select(
      (visCols.map(c => col(c).as(s"__t_$c")) :+
        col(IceLite.SeqCol.name).as("__t_seq") :+
        col(IceLite.DelCol.name).as("__t_del")): _*)

    val joined = t.join(u,
      keyCols.map(k => t(s"__t_$k") === u(s"__u_$k")).reduce(_ && _),
      "full_outer")

    val uWins = col("__u_seq").isNotNull &&
      (col("__t_seq").isNull || col("__u_seq") > col("__t_seq"))
    val merged = joined
      .select((visCols.map(c =>
        when(uWins, col(s"__u_$c")).otherwise(col(s"__t_$c")).as(c)) :+
        when(uWins, col("__u_seq")).otherwise(col("__t_seq")).as(IceLite.SeqCol.name) :+
        when(uWins, col("__u_op") === "DELETE")
          .otherwise(coalesce(col("__t_del"), lit(false))).as(IceLite.DelCol.name)): _*)
      .withColumn("__bucket", bucketExpr(keyCols, base.buckets))

    // ---- 4. rewrite touched buckets, one file per bucket per epoch; row
    // count rides the write job as an Observation (no second scan)
    val epochDir = Paths.get(dir, "data", s"epoch=$epochId").toString
    val obs = org.apache.spark.sql.Observation(s"merge-rows-$epochId")
    merged
      .repartition(math.max(touched.size, 1), col("__bucket"))
      .sortWithinPartitions(col("__bucket") +: keyCols.map(col): _*) // key-clustered files
      .observe(obs, count(lit(1)).as("rows"))
      .write.partitionBy("__bucket").mode("overwrite").parquet(epochDir)
    val rewrittenRows = obs.get("rows").asInstanceOf[Long]

    // ---- 5. snapshot: carried-forward + new files
    val newFiles = listBucketFiles(epochDir, schemaVersion)
    val carried = base.files.filterNot(f => touched.contains(f.bucket))
    deduped.unpersist()

    val next = base.copy(
      epochs = base.epochs :+ epochId,
      schemas = schemas,
      files = carried ++ newFiles)
    IceLite.commit(dir, base, next, epochId)

    MergeStats(epochId, applied = true, batchRows, batchRows - deletes, deletes,
      touched.size, rewrittenRows)
  }

  private def listBucketFiles(epochDir: String, schemaVersion: Int): Vector[DataFile] = {
    val root = Paths.get(epochDir)
    if (!Files.isDirectory(root)) return Vector.empty
    Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("__bucket="))
      .flatMap { bdir =>
        val bucket = bdir.getFileName.toString.stripPrefix("__bucket=").toInt
        Files.list(bdir).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(p => DataFile(p.toString, bucket, -1L, schemaVersion))
      }.toVector
  }
}
