package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** pageRank vs a naive per-node integer reference — pins the exact
  * floor-division semantics the DuckDB oracle also relies on. */
class GraphOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graph-ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("pageRank == naive integer reference on a seeded random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val raw = (0 until 60).map(_ => (rnd.nextInt(10).toLong, rnd.nextInt(10).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = (raw ++ raw.map(_.swap)).distinct // symmetrize: no dangling nodes

    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val base = GraphOps.baseFor(deg.size.toLong)
    var r = deg.keys.map(_ -> base).toMap
    for (_ <- 1 to 3) {
      val inflow = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = inflow.map { case (n, in) => n -> (15 * base + 85 * in) / 100 }
    }
    assert(got == r)
  }

  test("triangleCounts: K4 and a seeded random graph vs brute force") {
    import spark.implicits._
    // K4: 4 triangles total, every node in exactly 3
    val k4 = (for (a <- 0 to 3; b <- (a + 1) to 3) yield (a.toLong, b.toLong))
    val gotK4 = GraphOps.triangleCounts(k4.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotK4 == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))

    // seeded random graph: brute-force count of each triangle on the driver
    val rnd = new scala.util.Random(11)
    val edges = (0 until 200).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val es = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val exp = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      i <- nodes; j <- nodes if i < j && es((i, j))
      k <- nodes if j < k && es((j, k)) && es((i, k))
    } { exp(i) += 1; exp(j) += 1; exp(k) += 1 }
    val got = GraphOps.triangleCounts(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp.toMap)
    assert(exp.values.sum > 0, "random graph must actually contain triangles")
  }

  test("baseFor caps the mass so 85x the worst-case inflow stays inside Long") {
    for (n <- Seq(1L, 10L, 90000L, 1000000L, 3000000000L)) {
      val b = GraphOps.baseFor(n)
      assert(b >= 1L && b <= GraphOps.Base)
      // whole mass on one node, damped: must not wrap
      assert(85L * (b * math.min(n, GraphOps.MassCap / b)) > 0)
      assert(b * math.min(n, GraphOps.MassCap / b) <= GraphOps.MassCap)
    }
  }

  test("kHopDistances == Floyd-style brute force on a seeded random digraph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = (0 until 80).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }.distinct
    val seeds = Seq(0L, 7L)
    val k = 3
    val got = GraphOps.kHopDistances(edges.toDF("src", "dst"), seeds.toDF("node"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

    // brute force: dist relaxation over all edges, k sweeps
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to k) {
      val next = edges.flatMap { case (a, b) => dist.get(a).map(d => b -> (d + 1)) }
      dist = (dist.toSeq ++ next).groupBy(_._1).map { case (n, ds) => n -> ds.map(_._2).min }
    }
    assert(got == dist.toSeq.sortBy(_._1))
  }
}
