package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Misra-Gries: the final tracked set supersets every key above
  * the global threshold across wave cuts and restarts, state stays within
  * the shards × k bound, and the candidate recount equals the exact batch
  * heavy-hitter set. */
class HeavyHittersStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Zipf-ish keyed stream: key k_i with multiplicity ~ n/(i+1). */
  private def feed(nKeys: Int, scale: Int, nShards: Int, chunks: Int) = {
    import spark.implicits._
    val rows = (0 until nKeys).flatMap { i =>
      (0 until (scale / (i + 1)).max(1)).map(r => (s"k$i", i.toLong * 1000 + r))
    }
    rows.toDF("key", "ord")
      .withColumn("shard", (abs(hash(col("key"))) % nShards).cast("int"))
      .withColumn("band",
        least(lit(chunks - 1), (col("ord") % chunks).cast("int")))
  }

  test("final candidates recount == exact heavy hitters; state bounded; survives restarts") {
    val nShards = 2; val k = 6; val chunks = 3
    val keyed = feed(nKeys = 40, scale = 120, nShards = nShards, chunks = chunks)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-hh-spec"
    val emissions = HeavyHittersStream.sketchToCompletion(
      spark, keyed, root, chunks, k)
    val fin = HeavyHittersStream.finalSketch(emissions)
    val cands = fin.select("key").distinct().collect().map(_.getString(0)).toSet
    assert(cands.size <= nShards * k, s"state bound violated: ${cands.size}")
    val counts = keyed.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val exact = counts.filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(exact.nonEmpty, "test is vacuous without true heavy hitters")
    assert(exact.subsetOf(cands),
      s"MG guarantee violated: missing ${exact.diff(cands)}")
    // the recount of candidates at the global threshold IS the exact set
    val got = counts.filter { case (key, c) => cands(key) && c * (k + 1) > n }.keySet
    assert(got == exact)
    // eviction really happened (lossy sketch, not everything-fits)
    assert(cands.size < counts.size)
  }

  test("wave cuts don't change the answer: 2 waves == 4 waves") {
    val nShards = 2; val k = 5
    def run(chunks: Int): Set[String] = {
      val keyed = feed(nKeys = 30, scale = 90, nShards = nShards, chunks = chunks)
      val root = s"${System.getProperty("java.io.tmpdir")}/graft-hh-spec-w$chunks"
      val fin = HeavyHittersStream.finalSketch(
        HeavyHittersStream.sketchToCompletion(spark, keyed, root, chunks, k))
      val cands = fin.select("key").distinct().collect().map(_.getString(0)).toSet
      val counts = keyed.groupBy("key").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = counts.values.sum
      counts.filter { case (key, c) => cands(key) && c * (k + 1) > n }.keySet
    }
    assert(run(2) == run(4))
  }
}
