package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Min-label-propagation connected components (q35's engine): transitive
  * closure semantics, convergence detection, loud non-convergence. */
class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("cc-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def cc(edges: Seq[(Long, Long)], maxIters: Int = 30): Map[Long, Long] = {
    import spark.implicits._
    DedupOps.connectedComponents(edges.toDF("a", "b"), maxIters)
      .as[(Long, Long)].collect().toMap
  }

  test("a chain collapses transitively to its minimum (where one-hop q32 would not)") {
    // 1-2, 2-3, 3-4: 4 never pairs with 1 directly
    assert(cc(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components keep separate labels; edge direction is irrelevant") {
    val got = cc(Seq((5L, 2L), (2L, 9L), (7L, 8L), (11L, 10L)))
    assert(got == Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 7L -> 7L, 8L -> 7L, 10L -> 10L, 11L -> 10L))
  }

  test("a star and a cycle both converge") {
    val star = cc(Seq((100L, 1L), (100L, 2L), (100L, 3L)))
    assert(star.values.toSet == Set(1L))
    val cycle = cc(Seq((4L, 5L), (5L, 6L), (6L, 4L)))
    assert(cycle == Map(4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("pointer-doubling variant == min-label propagation on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val n = 60
      val edges = (1 to 80).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val slow = cc(edges)
      val fast = DedupOps.connectedComponentsFast(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(fast == slow)
    }
  }

  test("pointer doubling collapses a 4096-node path in O(log n) rounds (min-label needs n)") {
    import spark.implicits._
    val chain = (0L until 4095L).map(i => (i, i + 1))
    // maxIters 25 ≫ log2(4096)=12 but ≪ the 4096 min-label alone would need:
    // convergence inside the cap PROVES the doubling is doing its job
    val got = DedupOps.connectedComponentsFast(chain.toDF("a", "b"), maxIters = 25)
      .as[(Long, Long)].collect()
    assert(got.length == 4096 && got.forall(_._2 == 0L))
  }

  test("non-convergence inside the round cap throws loudly instead of mislabeling") {
    // a 6-chain needs ~5 propagation rounds; cap at 1
    val e = intercept[IllegalStateException] {
      cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)), maxIters = 1)
    }
    assert(e.getMessage.contains("not converged"))
  }
}
