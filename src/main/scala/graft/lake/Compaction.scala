package graft.lake

import java.nio.file.Paths
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
import IceLite._

/** Snapshot maintenance: every epoch leaves one file per touched bucket, so
  * after E epochs a bucket may be referenced by its newest file only — but
  * dropped tombstones and old epoch dirs accumulate on disk, and a
  * long-running table benefits from rewriting buckets into fresh,
  * key-sorted files (and purging tombstones older than the rewrite).
  *
  * Compaction = a MERGE with an empty batch that rewrites every bucket:
  * read current state (hidden cols included), drop tombstones, rewrite one
  * sorted file per bucket, commit as a new snapshot (epoch-fenced like any
  * other commit). Old files stay on disk for time travel until vacuum.
  */
object Compaction {

  final case class CompactionStats(buckets: Int, rowsBefore: Long, rowsAfter: Long, filesReplaced: Int)

  def compact(spark: SparkSession, dir: String, epochId: String): CompactionStats = {
    val base = IceLite.load(dir)
    if (base.hasEpoch(epochId)) return CompactionStats(0, 0, 0, 0)

    // rowsBefore (incl. tombstones) rides the same job as an Observation on
    // the pre-filter scan — DataFile.rows is unknown (-1) by design
    val preObs = org.apache.spark.sql.Observation(s"compact-pre-$epochId")
    val cur = IceLite.read(spark, base, includeHidden = true)
      .observe(preObs, count(lit(1)).as("rows"))
    val live = cur.where(!coalesce(col(DelCol.name), lit(false))) // purge tombstones
      .withColumn("__bucket", bucketExpr(base.keyCols, base.buckets))

    val epochDir = Paths.get(dir, "data", s"epoch=$epochId-compact").toString
    val obs = org.apache.spark.sql.Observation(s"compact-$epochId")
    live
      .repartition(base.buckets, col("__bucket"))
      .sortWithinPartitions(col("__bucket") +: base.keyCols.map(col): _*)
      .observe(obs, count(lit(1)).as("rows"))
      .write.partitionBy("__bucket").mode("overwrite").parquet(epochDir)
    val rowsAfter = obs.get("rows").asInstanceOf[Long]
    val rowsBefore = preObs.get("rows").asInstanceOf[Long]

    val newFiles = listBucketFiles(epochDir, base.currentSchemaVersion)
    // a compaction touches EVERY bucket — any concurrent commit conflicts
    // (IceLite.commit fails loudly rather than losing its files)
    IceLite.commit(dir, base, IceLite.CommitDelta(
      epochId, (0 until base.buckets).toSet, newFiles, base.currentSchema))
    // filesReplaced: superseded by the new per-bucket files; physical removal
    // happens in vacuum once time travel can go
    CompactionStats(base.buckets, rowsBefore, rowsAfter, base.files.size)
  }

  /** Remove data files not referenced by the latest snapshot (ends time
    * travel for older snapshots — call after compact once history can go). */
  def vacuum(dir: String): Int = {
    val snap = IceLite.load(dir)
    val live = snap.files.map(f => Paths.get(f.path).toAbsolutePath.toString).toSet
    val dataRoot = Paths.get(dir, "data")
    var removed = 0
    java.nio.file.Files.walk(dataRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .filterNot(p => live.contains(p.toAbsolutePath.toString))
      .foreach { p => java.nio.file.Files.deleteIfExists(p); removed += 1 }
    removed
  }

  private def listBucketFiles(epochDir: String, schemaVersion: Int): Vector[DataFile] = {
    val root = Paths.get(epochDir)
    if (!java.nio.file.Files.isDirectory(root)) return Vector.empty
    java.nio.file.Files.list(root).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("__bucket="))
      .flatMap { bdir =>
        val bucket = bdir.getFileName.toString.stripPrefix("__bucket=").toInt
        java.nio.file.Files.list(bdir).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(p => DataFile(p.toString, bucket, -1L, schemaVersion))
      }.toVector
  }
}
