package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import TopKByValue.{Buf, In}

/** TopKByValue's comparator must be a TOTAL order with NaN ranked greatest
  * — Java's `>` is false on every NaN comparison, which silently dropped
  * NaN rows from a full buffer and made merge order-dependent, while both
  * Spark's window ORDER BY DESC and the DuckDB oracle rank NaN first. */
class TopKByValueSpec extends AnyFunSuite {

  private val agg = new TopKByValue(3)

  private def fold(xs: Seq[In]): Seq[In] =
    xs.foldLeft(agg.zero)(agg.reduce).items

  test("NaN ranks first under DESC, like the window oracle") {
    val xs = Seq(In(5.0, 1), In(Double.NaN, 2), In(9.0, 3), In(1.0, 4))
    assert(fold(xs).map(_.eventId) == Seq(2L, 3L, 1L))
  }

  test("NaN arriving into a FULL buffer is kept, not silently dropped") {
    val xs = Seq(In(5.0, 1), In(9.0, 2), In(7.0, 3), In(Double.NaN, 4))
    assert(fold(xs).map(_.eventId) == Seq(4L, 2L, 3L))
  }

  test("merge is order-independent with NaN present") {
    val a = Seq(In(5.0, 1), In(Double.NaN, 2))
    val b = Seq(In(9.0, 3), In(7.0, 4), In(8.0, 5))
    val m1 = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
      b.foldLeft(agg.zero)(agg.reduce)).items
    val m2 = agg.merge(b.foldLeft(agg.zero)(agg.reduce),
      a.foldLeft(agg.zero)(agg.reduce)).items
    assert(m1 == m2 && m1.map(_.eventId) == Seq(2L, 3L, 5L))
  }

  test("-0.0 and 0.0 tie and break by eventId (SQL equality, not bit order)") {
    val xs = Seq(In(0.0, 5), In(-0.0, 2), In(-1.0, 9))
    assert(fold(xs).map(_.eventId) == Seq(2L, 5L, 9L))
  }
}
