package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The IVF index invariants: (1) probing through the cell-partitioned
  * store returns EXACTLY what the unindexed assignment join returns for
  * the same centroids — pruning can never change results; (2) the probed
  * read selects only the probed cells' directories (files-read audit);
  * (3) training is deterministic across runs. */
class IvfIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ivf-index-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("indexed probing == unindexed assignment join; pruned read touches only probed cells") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dir = Files.createTempDirectory("graft-ivf").toString
    val idx = SimilarityOps.buildIvfIndex(spark, e, dir, cells = 16, iters = 3)
    val queries = e.filter(col("vec_id") < 5)

    val indexed = SimilarityOps.ivfTopKIndexed(spark, idx, queries, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val cents = idx.centroids(spark)
    val plain = SimilarityOps.ivfTopKUnindexed(spark, e, cents, queries, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(indexed.nonEmpty && indexed.toSeq == plain.toSeq,
      s"indexed=${indexed.length} unindexed=${plain.length}")

    // files-read audit: 5 queries × nprobe=4 probe ≤ 20 of 16 cells, but
    // overlapping probes must select a strict subset when queries cluster
    val probed = {
      import spark.implicits._
      val qrows = queries.select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect()
      qrows.flatMap { case (_, emb) =>
        SimilarityOps.IvfCells.nearestCells(cents, emb, 4) }.toSet
    }
    val pruned = idx.prunedPaths(probed)
    val all = idx.allPaths
    assert(pruned.forall(p => probed.exists(c => p.endsWith(s"cell=$c"))),
      s"pruned paths outside the probe set: $pruned")
    assert(pruned.size <= probed.size && pruned.size <= all.size)
    if (probed.size < all.size)
      assert(pruned.size < all.size, s"no pruning: ${pruned.size} of ${all.size} dirs")
  }

  test("appendBatch == one-shot build with the same centroids; idempotent; compaction preserves results") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val wave1 = e.filter(col("vec_id") % 3 =!= 0)
    val wave2 = e.filter(col("vec_id") % 3 === 0)
    val queries = e.filter(col("vec_id") < 5)
    val cents = SimilarityOps.trainCentroids(spark, wave1, k = 16, iters = 3)

    val incDir = Files.createTempDirectory("graft-ivf-inc").toString
    val inc = SimilarityOps.buildIvfIndexWith(spark, wave1, incDir, cents)
    inc.appendBatch(spark, wave2, batchId = 1L)
    val fullDir = Files.createTempDirectory("graft-ivf-full").toString
    val full = SimilarityOps.buildIvfIndexWith(spark, e, fullDir, cents)

    def topk(idx: SimilarityOps.IvfIndex): Seq[(Long, Long, Long, Double)] =
      SimilarityOps.ivfTopKIndexed(spark, idx, queries, k = 10, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val want = topk(full)
    assert(want.nonEmpty && topk(inc) == want, "append diverged from one-shot build")

    // idempotency: a foreachBatch replay overwrites, never duplicates
    inc.appendBatch(spark, wave2, batchId = 1L)
    assert(inc.data(spark).count() == e.count())
    assert(topk(inc) == want, "re-append changed results")

    // the pruned read spans BOTH live batch dirs (wave-2 vectors are served)
    assert(inc.allPaths.exists(_.contains("batch=0")) &&
      inc.allPaths.exists(_.contains("batch=1")), s"paths: ${inc.allPaths.take(4)}")

    // a crash between stage and swap leaves the index serving everything...
    case object Boom extends RuntimeException("injected crash")
    intercept[Boom.type] {
      inc.compactBatches(spark, intoBatchId = 1000L,
        crashPoint = w => if (w == "staged") throw Boom)
    }
    assert(topk(inc) == want, "crashed compaction changed results")
    // ...and the re-run consolidates to ONE live batch with identical results
    inc.compactBatches(spark, intoBatchId = 2000L)
    assert(BatchStore.liveBatchDirs(inc.dataDir).map(BatchStore.batchIdOf) == Vector(2000L))
    assert(inc.data(spark).count() == e.count())
    assert(topk(inc) == want, "compaction changed results")
  }

  test("training is deterministic and centroids round-trip through the dump") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val a = SimilarityOps.trainCentroids(spark, e, k = 16, iters = 3)
    val b = SimilarityOps.trainCentroids(spark, e, k = 16, iters = 3)
    assert(a.map(_._1).toSeq == b.map(_._1).toSeq)
    assert(a.zip(b).forall { case ((_, va, _), (_, vb, _)) => va.sameElements(vb) })
    val dir = Files.createTempDirectory("graft-ivf-rt").toString
    val idx = SimilarityOps.buildIvfIndex(spark, e, dir, cells = 16, iters = 3)
    val rt = idx.centroids(spark)
    assert(rt.zip(a).forall { case ((_, vr, _), (_, va, _)) => vr.sameElements(va) },
      "dumped centroids differ from trained ones")
  }

  test("a zero-norm vector assigns deterministically instead of crashing the pass") {
    // cos(0-vector, c) = 0/0 = NaN — before the guard, NaN never won the
    // `>` selection, best stayed -1, and taken(-1) threw AIOOBE, killing
    // the whole assignment job on ONE bad embedding
    val cents = Array((0L, Array(1.0, 0.0), 1.0), (1L, Array(0.0, 1.0), 1.0))
    val cells = SimilarityOps.IvfCells.nearestCells(cents, Seq(0f, 0f), 2)
    assert(cells.size == 2 && cells.toSet == Set(0L, 1L),
      s"zero vector must assign to SOME cells deterministically: $cells")
    val again = SimilarityOps.IvfCells.nearestCells(cents, Seq(0f, 0f), 2)
    assert(cells == again, "assignment of a zero vector must be deterministic")
  }
}
