package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** knnWithinCells ≡ per-cell brute force, and clusters over it ≡ naive
  * union-find on the same edges. */
class KnnGraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val d = 8

  private def corpus(n: Int) = {
    import spark.implicits._
    (0L until n).map { i =>
      val vec = Array.tabulate(d) { j =>
        (((graft.cdc.LogGen.mix(i * 13 + j) >>> 11).toDouble % 1000) / 500.0 - 1.0).toFloat
      }
      (i, vec.toSeq)
    }.toDF("vec_id", "embedding").repartition(5)
  }

  test("top-3 within-cell neighbors == brute force; clusters == union-find") {
    import spark.implicits._
    val e = corpus(150)
    val cents = SimilarityOps.trainCentroids(spark, e, k = 6, iters = 3)
    val got = SimilarityOps.knnWithinCells(spark, e, cents, j = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    // brute force: assign via the same op, pair in memory
    val asg = SimilarityOps.assignCells(spark, e, cents)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = asg.flatMap { case (id, va, cell) =>
      asg.filter(o => o._3 == cell && o._1 != id)
        .map(o => (o._1, cos(va, o._2)))
        .sortBy { case (nid, c) => (-c, nid) }
        .take(3).zipWithIndex
        .map { case ((nid, _), ix) => (id, ix + 1, nid) }
    }.toSet
    assert(got == want)

    // clusters: CC over undirected knn edges == naive union-find
    val edges = SimilarityOps.knnWithinCells(spark, e, cents, j = 3)
      .select(col("vec_id").as("a"), col("nbr").as("b"))
    val comp = DedupOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val parent = scala.collection.mutable.Map((0L until 150L).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    want.foreach { case (a, _, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val naive = (0L until 150L).map(i => i -> find(i)).toMap
    (0L until 150L).foreach { i =>
      assert(comp.getOrElse(i, i) == naive(i), s"cluster mismatch at $i")
    }
  }
}
