package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing: the distributed prefix sum must be a pure function of
  * (corpus, budget) — the bucket count is an execution knob, never a
  * semantics knob — and chunk assignment must match the hand-computed
  * global concatenation. */
class PackingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docs(toks: Seq[Int]) =
    toks.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")

  test("chunk ids match the hand-computed global token axis") {
    // token counts 3,4,5,2 on a budget of 6:
    // starts 0,3,7,12 → chunks 0,0,1,2
    val out = CurationOps.packSequences(spark, docs(Seq(3, 4, 5, 2)), budget = 6, buckets = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 3L, 0L, 0L), (1L, 4L, 3L, 0L), (2L, 5L, 7L, 1L), (3L, 2L, 12L, 2L)))
  }

  test("bucket count is execution-only: 1, 3 and 13 buckets pack identically") {
    val d = docs(Seq.tabulate(40)(i => 1 + (i * 7) % 11))
    val ref = CurationOps.packSequences(spark, d, budget = 16, buckets = 1)
      .orderBy("doc_id").collect().toSeq
    for (b <- Seq(3, 13)) {
      val got = CurationOps.packSequences(spark, d, budget = 16, buckets = b)
        .orderBy("doc_id").collect().toSeq
      assert(got == ref, s"buckets=$b diverged from buckets=1")
    }
  }

  test("sparse doc_id space (empty buckets) still packs densely by order") {
    val d = Seq((5L, "a b c"), (900L, "d e"), (901L, "f"))
      .toDF("doc_id", "text")
    val out = CurationOps.packSequences(spark, d, budget = 4, buckets = 8)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    // starts 0,3,5 → chunks 0,0,1 despite the id gap spanning empty buckets
    assert(out == Seq((5L, 3L, 0L, 0L), (900L, 2L, 3L, 0L), (901L, 1L, 5L, 1L)))
  }
}
