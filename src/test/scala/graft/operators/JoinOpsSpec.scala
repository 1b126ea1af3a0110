package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AS-OF and range join vs naive per-row reference semantics — including
  * the tie/no-match/null edges the sf0.01 oracle gate may not cover. */
class JoinOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("join-ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("asofJoin == naive greatest-(ts,tiebreak)-at-or-before semantics on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // deliberately collision-heavy: few keys, few distinct ts values so
    // equal-ts ties (left==right and right==right) occur often
    val left = (0 until 300).map(i =>
      (i.toLong, (rnd.nextInt(6)).toLong, rnd.nextInt(40).toLong))
    val right = (0 until 200).map(j =>
      ((rnd.nextInt(6)).toLong, rnd.nextInt(40).toLong, j.toLong, rnd.nextInt(1000).toDouble))

    val lDf = left.toDF("lid", "k", "t")
    val rDf = right.toDF("k", "t", "rid", "v")
    val got = JoinOps.asofJoin(lDf, rDf, "k", "k", "t", "t", "rid", Seq("rid", "v"))
      .select("lid", "rid", "v")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap

    val want = left.map { case (lid, k, t) =>
      val cands = right.filter(r => r._1 == k && r._2 <= t)
      lid -> (if (cands.isEmpty) None
              else { val m = cands.maxBy(c => (c._2, c._3)); Some((m._3, m._4)) })
    }.toMap
    assert(got == want)
    assert(want.values.exists(_.isEmpty) && want.values.exists(_.nonEmpty),
      "seed must exercise both matched and unmatched left rows")
  }

  test("asofJoin: equal timestamps match inclusively; null left ts matches nothing") {
    import spark.implicits._
    val lDf = Seq((1L, 1L, Some(10L)), (2L, 1L, None))
      .toDF("lid", "k", "t")
    val rDf = Seq((1L, 10L, 7L, 1.5)).toDF("k", "t", "rid", "v")
    val got = JoinOps.asofJoin(lDf, rDf, "k", "k", "t", "t", "rid", Seq("rid", "v"))
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> 7L, 2L -> -1L))
  }

  test("rangeJoin == naive |Δts| <= tol filter, each pair exactly once (boundaries inclusive)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val tol = 10L
    // ts values clustered so pairs straddle bucket boundaries; include
    // EXACT-boundary deltas (multiples of tol) to pin inclusivity
    val left = (0 until 250).map(i => (i.toLong, (rnd.nextInt(50) * 5).toLong))
    val right = (0 until 80).map(j => (j.toLong, (rnd.nextInt(50) * 5).toLong))
    val got = JoinOps.rangeJoin(
        left.toDF("lid", "lt"), right.toDF("rid", "rt"), "lt", "rt", tol)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = for { (lid, lt) <- left; (rid, rt) <- right
                     if math.abs(lt - rt) <= tol } yield (lid, rid)
    assert(got.sorted.toSeq == want.sorted.toSeq,
      s"got ${got.length} pairs (${got.toSet.size} distinct), want ${want.length}")
    assert(want.exists { case (l, r) =>
      math.abs(left(l.toInt)._2 - right(r.toInt)._2) == tol },
      "seed must exercise an exact-boundary pair")
  }

  test("wordNgrams: sliding windows, short docs dropped") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "x y"), (3L, "  p  q r  "))
      .toDF("doc_id", "text")
    val got = TextOps.wordNgrams(docs, 3).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a b c"), (1L, "b c d"), (3L, "p q r")))
  }

  test("decontaminate counts distinct benchmark grams per doc") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d e"), (2L, "z z z")).toDF("doc_id", "text")
    val bench = Seq("b c d", "c d e", "q q q").toDF("gram")
    val got = TextOps.decontaminate(corpus, bench, 3)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 2L, true), (2L, 0L, false)))
  }

  test("bucketedSmbJoin: the join subtree has ZERO shuffle exchanges (bucketing is the distribution)") {
    val joined = JoinOps.bucketedSmbJoin(spark, "/root/testdata/sf0.001")
    val rows = joined.collect() // execute → AQE finalizes its plan
    // string-render the final plan: AQE wraps stages in QueryStageExec
    // leaves that tree-collect does not descend into, but the rendering
    // shows the whole tree
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"expected a shuffle-free co-located join, found:\n$plan")
    // and it is a sort-merge join over bucketed scans, not a broadcast
    assert(plan.contains("SortMergeJoin"), s"expected a SortMergeJoin, got:\n$plan")
    assert(plan.contains("Bucketed: true"), s"expected bucketed scans, got:\n$plan")
    // result sanity vs a plain (shuffled) join of the same inputs
    val plain = spark.read.parquet(s"${System.getProperty("java.io.tmpdir")}/graft-q100/a")
      .join(spark.read.parquet(s"${System.getProperty("java.io.tmpdir")}/graft-q100/b"), Seq("user_id"))
      .select("user_id", "cnt_a", "sum_a", "cnt_b", "sum_b")
    assert(rows.toSet == plain.collect().toSet)
  }
}
