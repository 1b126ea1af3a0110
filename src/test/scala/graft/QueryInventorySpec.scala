package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract sanity: every oracle belongs to a query, the flagship
  * entry produces rows, and a representative query from each operator family
  * runs on sf0.001. (Full oracle cross-check runs via tools/oracle_check.py
  * against DuckDB — that is the per-round correctness gate.) */
class QueryInventorySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("oracle keys ⊆ query keys; inventory is non-trivial") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
    assert(qs.size >= 20, s"only ${qs.size} queries")
    assert(os.size >= 20, s"only ${os.size} oracles")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (name <- Seq("q01_pricing_summary", "q12_exact_dedup", "q17_minhash_sig",
      "q21_ann_bruteforce_topk", "q23_media_meta")) {
    test(s"$name runs on sf0.001 with rows") {
      assert(SparkEntry.queries(name)(spark, sf).count() > 0)
    }
  }
}
