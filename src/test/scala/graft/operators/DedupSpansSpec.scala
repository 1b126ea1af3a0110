package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q181 exact substring (span) dedup: first occurrence kept, later spans
  * removed, overlap unions, sub-n docs untouched, within-doc repeats cut. */
class DedupSpansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(docs: Seq[(Long, String)], n: Int = 13) = {
    import spark.implicits._
    TextOps.dedupSpans(docs.toDF("doc_id", "text"), n)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
  }

  test("copied block: source doc intact, copy fully removed") {
    val words = (1 to 20).map(i => s"w$i")
    val a = words.mkString(" ")                       // 20 tokens
    val b = words.slice(2, 17).mkString(" ")          // tokens 3..17 of a: 15 tokens
    val m = run(Seq(0L -> a, 1L -> b))
    assert(m(0L) == ((20L, 20L, 0L, a)), "first occurrence keeps every token")
    // every 13-gram of b re-occurs from a; spans 1..13, 2..14, 3..15 cover all 15
    assert(m(1L) == ((15L, 0L, 15L, "")), "duplicate block removed entirely")
  }

  test("partial overlap: only the duplicated span is cut, remainder survives") {
    val words = (1 to 20).map(i => s"w$i")
    val a = words.mkString(" ")
    // 13 copied tokens then 5 unique ones: exactly one dup 13-gram at pos 1
    val c = (words.take(13) ++ (1 to 5).map(i => s"u$i")).mkString(" ")
    val m = run(Seq(0L -> a, 2L -> c))
    assert(m(0L)._3 == 0L)
    assert(m(2L) == ((18L, 5L, 13L, "u1 u2 u3 u4 u5")))
  }

  test("within-doc repetition: second occurrence removed, first kept") {
    val s13 = (1 to 13).map(i => s"a$i")
    val text = (s13 ++ Seq("sep") ++ s13).mkString(" ") // 27 tokens; gram@15 == gram@1
    val m = run(Seq(5L -> text))
    assert(m(5L) == ((27L, 14L, 13L, (s13 ++ Seq("sep")).mkString(" "))))
  }

  test("docs shorter than n produce no grams and are untouched") {
    val shortText = (1 to 12).map(i => s"s$i").mkString(" ")
    val m = run(Seq(7L -> shortText, 8L -> shortText))
    // identical 12-token docs share no 13-gram → both fully kept
    assert(m(7L) == ((12L, 12L, 0L, shortText)))
    assert(m(8L) == ((12L, 12L, 0L, shortText)))
  }

  test("overlapping removed spans union (no double-count)") {
    val words = (1 to 30).map(i => s"w$i")
    val a = words.mkString(" ")
    // copy tokens 1..14 (two overlapping dup grams @1,@2 → union 1..14)
    val d = (words.take(14) ++ (1 to 4).map(i => s"z$i")).mkString(" ")
    val m = run(Seq(0L -> a, 9L -> d))
    assert(m(9L) == ((18L, 4L, 14L, "z1 z2 z3 z4")))
  }
}
