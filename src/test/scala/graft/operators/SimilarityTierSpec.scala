package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q20's two exact tiers (typed block pairing vs spill-aware SMJ self-join)
  * must produce bit-identical pairs — proven by forcing every label through
  * the join tier with blockCap = 0 and comparing to the fast-path result. */
class SimilarityTierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("neardup pairs: SMJ tier ≡ typed block tier (values bit-identical)") {
    val sf = "/root/testdata/sf0.001"
    val fast = SimilarityOps.neardupPairs(spark, sf).collect().map(_.toString).sorted.toSeq
    val smj = SimilarityOps.neardupPairs(spark, sf, blockCap = 0).collect().map(_.toString).sorted.toSeq
    assert(fast == smj)
    assert(fast.nonEmpty)
  }
}
