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
}
