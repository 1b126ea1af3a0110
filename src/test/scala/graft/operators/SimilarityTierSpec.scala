package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q20 tier semantics:
  *  - the EXACT tiers (typed block pairing vs spill-aware SMJ self-join)
  *    must produce bit-identical pairs;
  *  - the hot-label BANDED tier must cut the candidate set far below n²/2
  *    while keeping high recall on true near-duplicates. */
class SimilarityTierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("neardup pairs: exact SMJ tier ≡ typed block tier (values bit-identical)") {
    val sf = "/root/testdata/sf0.001"
    val fast = SimilarityOps.neardupPairs(spark, sf).collect().map(_.toString).sorted.toSeq
    val smj = SimilarityOps.neardupPairs(spark, sf, blockCap = 0, bandPrefilter = false)
      .collect().map(_.toString).sorted.toSeq
    assert(fast == smj)
    assert(fast.nonEmpty)
  }

  test("hot-label banded tier: candidates << n²/2, high recall on true near-dups") {
    import spark.implicits._
    // ONE synthetic hot label: 600 seeded random unit-ish vectors, of which
    // 60 get a small-noise duplicate (the planted near-dups, cos ≥ ~0.99)
    val rnd = new scala.util.Random(42)
    def vec(): Array[Float] = Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
    val base = Vector.fill(600)(vec())
    val dups = (0 until 60).map { i =>
      val src = base(i * 10)
      src.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat)
    }
    val all = (base ++ dups).zipWithIndex.map { case (v, i) => (7, i.toLong, v.toSeq) }
    val df = all.toDF("label", "vec_id", "embedding")

    val n = all.size.toLong
    val allPairs = n * (n - 1) / 2
    val cands = SimilarityOps.bandedCandidates(spark, df).count()
    assert(cands < allPairs / 5, s"banding must cut candidates: $cands of $allPairs")

    // planted pairs: (i*10, 600+i) — exact tier finds them all at cos ≥ 0.9
    val exact = SimilarityOps.neardupPairsOf(spark, df, blockCap = Int.MaxValue)
      .filter(col("cos") >= 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 55, s"sanity: planted dups visible to the exact tier (${exact.size})")
    val banded = SimilarityOps.neardupPairsOf(spark, df, blockCap = 0, bandPrefilter = true)
      .filter(col("cos") >= 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val recall = banded.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"banded tier recall on true near-dups: $recall")
    // any pair the banded tier emits carries the bit-identical exact cosine
    assert(banded.subsetOf(exact))
  }
}
