package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SemDeDup invariants: (1) a verdict's dup_of is always a LOWER id from
  * the SAME cell at cosine ≥ τ, and it is the smallest such id; (2) docs
  * without a qualifying same-cell lower neighbor survive; (3) a planted
  * exact duplicate is always caught (identical vectors share an argmax
  * cell by construction); (4) verdicts are deterministic across runs. */
class SemDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("semdedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def buildVerdicts(tag: String) = {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // plant an exact duplicate of vec 7 under a fresh high id
    val dup = e.filter(col("vec_id") === 7)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"), col("label"))
    val corpus = e.select("vec_id", "embedding", "label").unionByName(dup)
    val dir = Files.createTempDirectory(s"graft-semdedup-$tag").toString
    val cents = SimilarityOps.trainCentroids(spark, corpus, k = 8, iters = 3)
    val idx = SimilarityOps.buildIvfIndexWith(spark, corpus, dir, cents)
    SemDedup.verdicts(spark, idx)
  }

  test("dup_of is the smallest same-cell lower id at cos ≥ τ; planted exact dup caught") {
    val v = buildVerdicts("a").cache()
    val rows = v.collect().map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.length == 501)
    // every dup points strictly down, within its own cell
    val cellOf = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (id, cell, dupOf, dupCos) =>
      dupOf.foreach { d =>
        assert(d < id, s"dup_of $d !< $id")
        assert(cellOf(d) == cell, s"dup_of $d in cell ${cellOf(d)} != $cell")
        assert(dupCos.exists(_ >= SemDedup.Tau))
      }
    }
    // the planted exact duplicate of 7 must be flagged, with cos ≈ 1
    val planted = rows.find(_._1 == 100007L).get
    assert(planted._3.contains(7L) || planted._3.exists(_ < 7L),
      s"planted dup not caught: $planted")
    assert(planted._4.exists(_ > 0.999))
    // min-id rule: recompute each cell's qualifying set brute-force
    val byCell = rows.groupBy(_._2)
    val embOf = {
      import spark.implicits._
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    }
    // spot-check 20 verdicts against a brute-force within-cell scan
    val cos = (a: Seq[Float], b: Seq[Float]) => {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    byCell.values.flatMap(_.take(3)).take(20).foreach {
      case (id, cell, dupOf, _) if embOf.contains(id) =>
        val lower = byCell(cell).filter(r => r._1 < id && embOf.contains(r._1))
          .map(_._1).sorted
        val expected = lower.find(l => cos(embOf(l), embOf(id)) >= SemDedup.Tau)
        assert(dupOf == expected, s"id=$id: got $dupOf expected $expected")
      case _ => ()
    }
  }

  test("verdicts are deterministic across independent builds") {
    val a = buildVerdicts("b").collect().map(_.toSeq).sortBy(_.head.toString)
    val b = buildVerdicts("c").collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("incremental wave verdicts == batch recompute restricted to new ids; read is cell-pruned") {
    import scala.jdk.CollectionConverters._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val wave1 = e.filter(col("vec_id") < 300)
    val wave2 = e.filter(col("vec_id") >= 300)
    val dir = Files.createTempDirectory("graft-semdedup-inc").toString
    val cents = SimilarityOps.trainCentroids(spark, wave1, k = 8, iters = 3)
    val idx = SimilarityOps.buildIvfIndexWith(spark, wave1, dir, cents)
    idx.appendBatch(spark, wave2, batchId = 1L)
    val inc = SemDedup.verdictsForBatch(spark, idx, batchId = 1L)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val full = SemDedup.verdicts(spark, idx)
      .filter(col("vec_id") >= 300)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(inc.nonEmpty && inc.toSeq == full.toSeq)
    // pruning audit: the incremental member read touches ONLY the cells
    // the new batch landed in
    val touched = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"${idx.dataDir}/batch=1")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("cell="))
      .map(_.stripPrefix("cell=").toLong).toSet
    val pruned = idx.prunedPaths(touched)
    assert(pruned.forall(p => touched.exists(c => p.endsWith(s"cell=$c"))))
    if (touched.size < 8)
      assert(pruned.size < idx.allPaths.size, "no pruning despite untouched cells")
  }
}
