package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.Replay

/** Top-level so Spark's case-class Encoder can instantiate it. */
case class PropEv(repo: String, path: String, content: String, seq: Long, op: String)

/** Property-based MERGE semantics: for RANDOM op sequences (upserts,
  * deletes, duplicate seqs never generated; late/out-of-order arrivals by
  * construction) split into RANDOM epoch boundaries, replaying through
  * mergeEpoch — whatever mix of delta-append and inline-COW epochs the
  * thresholds produce — must yield exactly the per-key LWW fold with
  * DELETE-wins-at-higher-seq. Spark-session cost bounds the sample count;
  * each case still covers hundreds of events across several epochs. */
class MergePropSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  

  private val genCase: Gen[(List[PropEv], List[Int], Int)] = for {
    nKeys <- Gen.choose(3, 12)
    nEvents <- Gen.choose(20, 300)
    seqs <- Gen.pick(nEvents, 1 to 10000)          // unique seqs (total order)
    keys <- Gen.listOfN(nEvents, Gen.choose(0, nKeys - 1))
    dels <- Gen.listOfN(nEvents, Gen.prob(0.25))
    // random epoch boundaries: each event assigned to one of up to 5 epochs
    epochOf <- Gen.listOfN(nEvents, Gen.choose(0, 4))
    deltaThreshold <- Gen.oneOf(0, 1, 3, 8)        // force COW / mixed / delta
  } yield {
    val evs = seqs.toList.lazyZip(keys).lazyZip(dels).map { (s, k, d) =>
      PropEv(s"r${k % 3}", s"p$k", s"c$s", s.toLong, if (d) "DELETE" else "UPSERT")
    }
    (evs, epochOf, deltaThreshold)
  }

  private def toUpdates(evs: Seq[PropEv]): DataFrame = {
    import spark.implicits._
    val df = evs.toDF()
      .withColumn("commit", lit("c")).withColumn("lang", lit("scala"))
    val ids = Map("repo" -> 1, "path" -> 2, "commit" -> 3, "lang" -> 4, "content" -> 5)
    df.select(df.columns.map { c =>
      ids.get(c) match {
        case Some(id) => col(c).as(c, new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("graft.fieldId", id.toLong).build())
        case None => col(c)
      }
    }: _*)
  }

  test("∀ random op sequences and epoch splits: table state == LWW fold (delete wins at higher seq)") {
    var seed = Seed(4242L)
    var case_ = 0
    while (case_ < 8) {
      genCase(Gen.Parameters.default.withSize(50), seed).foreach { case (evs, epochOf, thr) =>
        val dir = java.nio.file.Files.createTempDirectory(s"graft-prop$case_").toString
        Replay.createTable(dir, buckets = 4)
        val byEpoch = evs.zip(epochOf).groupBy(_._2).toSeq.sortBy(_._1)
        byEpoch.foreach { case (e, pairs) =>
          Merge.mergeEpoch(spark, dir, toUpdates(pairs.map(_._1)), "seq", "op",
            s"prop-$case_-$e", deltaThreshold = thr)
        }
        // reference fold in plain Scala
        val expect = evs.groupBy(ev => (ev.repo, ev.path)).toSeq
          .map { case (_, g) => g.maxBy(_.seq) }
          .filter(_.op != "DELETE")
          .map(ev => (ev.repo, ev.path, ev.content)).sorted
        val got = IceLite.read(spark, IceLite.load(dir))
          .select("repo", "path", "content")
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted.toSeq
        assert(got == expect,
          s"case $case_ (thr=$thr, epochs=${byEpoch.size}, events=${evs.size})")
      }
      seed = seed.next
      case_ += 1
    }
  }
}
