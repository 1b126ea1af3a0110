package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins q45's repetition semantics on SYNTHETIC text: the sf corpora are
  * uniform-random keyword soup with no repetitive documents, so the DuckDB
  * gate can only verify the arithmetic, not that the flag ever fires —
  * the same blind spot the tokenizer-regex gate has (TokenizeSpec). */
class RepetitionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("repetition-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("repetitive boilerplate is flagged; varied text is not; fractions are exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(30)("spam").mkString(" ")),              // pure repetition
      (2L, (1 to 30).map(i => s"w$i").mkString(" ")),        // all distinct
      (3L, "ab " * 3 + (1 to 24).map(i => s"v$i").mkString(" ")), // mild repeat
      (4L, "")                                               // empty → dropped
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(spark, docs)
      .collect().map(row => row.getLong(0) ->
        (row.getDouble(2), row.getDouble(3), row.getBoolean(5))).toMap

    assert(r.keySet == Set(1L, 2L, 3L)) // empty doc emits nothing
    // doc 1: 30× "spam" → top frac 1.0, all 29 2-grams identical → 1 - 1/29
    assert(r(1L)._1 == 1.0)
    assert(math.abs(r(1L)._2 - (1.0 - 1.0 / 29.0)) < 1e-12)
    assert(r(1L)._3, "pure repetition must be flagged")
    // doc 2: all distinct → top frac 1/30, zero 2-gram repetition, clean
    assert(math.abs(r(2L)._1 - 1.0 / 30.0) < 1e-12)
    assert(r(2L)._2 == 0.0 && !r(2L)._3)
    // doc 3: "ab" 3× of 27 words → top frac 3/27 ≤ 0.2; 2-grams: "ab ab"
    // twice among 26 → rep = 1 - 25/26 ≤ 0.2 → not flagged
    assert(!r(3L)._3)
  }
}
