package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q38's pre-tokenizer on whitespace the testdata corpus doesn't
  * contain (tabs, newlines, double spaces) — exactly the inputs where a
  * backslash lost in SQL-string unescaping turned `[^a-z0-9\s]` into
  * `[^a-z0-9s]` and counted whitespace runs as punctuation pretokens
  * while the DuckDB oracle (whose pattern was correct) disagreed.
  * Expected values are hand-derived from the documented pattern
  * `'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+` under leftmost-first
  * alternation — the same values the oracle's RE2 produces. */
class TokenizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("tokenize-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(text: String): (Long, Long, Long) = {
    import spark.implicits._
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tok").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry_q38(spark, dir)
    out.select("n_ws_tokens", "n_pretokens", "n_subword_est")
      .as[(Long, Long, Long)].head()
  }

  private def SparkEntry_q38(s: SparkSession, d: String) =
    TextOps.queries.find(_.name == "q38_bpe_token_count").get.fn(s, d)

  test("tab and double-space are whitespace, not punctuation pretokens") {
    // "a\tb  c" → pretokens [a, b, " c"]: the tab is skipped (no alternative
    // matches \s), the first of the two spaces is skipped, the second rides
    // the " ?[a-z]+" alternative
    assert(run("a\tb  c") == (3L, 3L, 3L))
  }

  test("newlines separate without producing tokens") {
    // "one\ntwo\n\n3" → ws-split 3, pretokens [one, two, 3] (trim-len 3,3,1
    // → subwords 1+1+1)
    assert(run("one\ntwo\n\n3") == (3L, 3L, 3L))
  }

  test("contractions, digits and punctuation runs follow the GPT-2-ish split") {
    // "don't stop!! 42 times" → [don, 't, " stop", "!!", " 42", " times"]
    // subwords: ceil(3/4)+1+ceil(4/4)+1+1+ceil(5/4) = 1+1+1+1+1+2 = 7
    assert(run("don't stop!! 42 times") == (4L, 6L, 7L))
  }

  test("shared IVF nearest-cells: one implementation, smallest-cid tie-break, cos-desc order") {
    // two identical centroids (cid 5 and 9) → the tie must go to cid 5;
    // a third, orthogonal centroid ranks last for this query vector
    val v = Array(1.0, 0.0)
    val w = Array(0.0, 1.0)
    def cent(id: Long, a: Array[Double]) = (id, a, math.sqrt(a.map(x => x * x).sum))
    val cents = Array(cent(3L, w), cent(5L, v), cent(9L, v)) // sorted by cid
    val got = SimilarityOps.IvfCells.nearestCells(cents, Seq(1.0f, 0.0f), 3)
    assert(got == Seq(5L, 9L, 3L))
    // take = 1 (the executor-side assignment) agrees with the head of the
    // driver-side probe ranking by construction — same function
    assert(SimilarityOps.IvfCells.nearestCells(cents, Seq(1.0f, 0.0f), 1) == Seq(5L))
  }
}
