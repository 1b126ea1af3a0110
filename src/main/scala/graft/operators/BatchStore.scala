package graft.operators

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Shared machinery for PERSISTED batch-partitioned stores (SigStore's
  * minhash signatures, EmbStore's embeddings): each ingest batch writes its
  * own `batch=N/<key>=K/` subtree (idempotent under foreachBatch replay),
  * readers prune by HOST-SIDE directory listing, and offline compaction
  * consolidates accumulated batch dirs with a crash-safe swap:
  *
  *  1. stage consolidated copies under `.compact-<id>/` carrying a
  *     `_CONSOLIDATED` marker (the marker travels with the rename),
  *  2. atomically MOVE each side into place as `batch=<id>`,
  *  3. only then delete superseded dirs.
  *
  * Readers resolve each side's LIVE batch set independently — a
  * consolidated dir supersedes every lower id — so every crash window
  * serves the exact full data set, and the next compaction sweeps strays. */
private[operators] object BatchStore {

  /** Marker file a consolidated (compacted) batch dir carries. Leading
    * underscore keeps it invisible to Spark's file listing. */
  val ConsolidatedMarker = "_CONSOLIDATED"

  def batchIdOf(p: Path): Long =
    p.getFileName.toString.stripPrefix("batch=").toLong

  def listBatchDirs(root: String): Vector[Path] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) Vector.empty
    else Files.list(r).iterator().asScala
      .filter(_.getFileName.toString.startsWith("batch=")).toVector
      .sortBy(batchIdOf)
  }

  /** The LIVE batch dirs of one side: any `batch=i` with i below the
    * newest consolidated id is superseded — still on disk only when a
    * compaction crashed between its moves and its deletes. */
  def liveBatchDirs(root: String): Vector[Path] = {
    val all = listBatchDirs(root)
    val consolidated = all.filter(p => Files.exists(p.resolve(ConsolidatedMarker)))
    if (consolidated.isEmpty) all
    else { val c = batchIdOf(consolidated.last); all.filter(batchIdOf(_) >= c) }
  }

  /** `<key>=K` dirs across a side's live batches holding `touched` keys. */
  def prunedPaths(rootDir: String, keyName: String, touched: Set[Int]): Seq[String] =
    liveBatchDirs(rootDir)
      .flatMap(b => touched.toSeq.sorted.iterator.map(k => b.resolve(s"$keyName=$k"))
        .filter(Files.isDirectory(_)))
      .map(_.toString).sorted

  /** Crash-recovery sweep: delete superseded batch dirs and stranded
    * `.compact-*` stage dirs. Runs at every compaction entry. */
  def sweepSuperseded(dir: String, roots: Seq[String]): Unit = {
    roots.foreach { root =>
      val all = listBatchDirs(root)
      val cons = all.filter(p => Files.exists(p.resolve(ConsolidatedMarker)))
      if (cons.nonEmpty) {
        val c = batchIdOf(cons.last)
        all.filter(batchIdOf(_) < c)
          .foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(p.toFile))
      }
    }
    val d = Paths.get(dir)
    if (Files.isDirectory(d))
      Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.startsWith(".compact-"))
        .foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(p.toFile))
  }

  /** The crash-safe consolidation protocol over N sides. `sides` maps each
    * side's root dir to a stage writer (given the side's stage path, write
    * the consolidated copy there). Returns the number of batch dirs
    * collapsed (0 when every side already has ≤ 1 live batch).
    * `crashPoint` is a test seam: called with "staged" then
    * "moved-<side-name>" after each move. */
  def compact(dir: String,
      sides: Seq[(String, String => Unit)],
      intoBatchId: Long,
      crashPoint: String => Unit = _ => ()): Int = {
    sweepSuperseded(dir, sides.map(_._1))
    val liveBySide = sides.map { case (root, _) => liveBatchDirs(root) }
    if (liveBySide.forall(_.size <= 1)) return 0
    require(liveBySide.flatten.forall(batchIdOf(_) < intoBatchId),
      s"intoBatchId=$intoBatchId must exceed every live batch id")
    val stage = s"$dir/.compact-$intoBatchId"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
    sides.foreach { case (root, write) =>
      val sideName = Paths.get(root).getFileName.toString
      write(s"$stage/$sideName")
      Files.createFile(Paths.get(s"$stage/$sideName", ConsolidatedMarker))
    }
    crashPoint("staged")
    sides.foreach { case (root, _) =>
      val sideName = Paths.get(root).getFileName.toString
      Files.move(Paths.get(s"$stage/$sideName"), Paths.get(s"$root/batch=$intoBatchId"))
      crashPoint(s"moved-$sideName")
    }
    sides.foreach { case (root, _) =>
      listBatchDirs(root).filter(batchIdOf(_) < intoBatchId)
        .foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(p.toFile))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
    liveBySide.map(_.size).sum
  }
}
