package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based MERGE INTO semantics: for RANDOM base tables, RANDOM
  * sources (matched / unmatched / new keys, random delete flags) and RANDOM
  * clause configurations (matched-delete on/off; SET explicit, SET with
  * t.* arithmetic, SET *; insert on/off; NOT MATCHED BY SOURCE scope
  * on/off), one mergeInto epoch must yield exactly the four-clause model
  * fold computed in plain Scala. Spark-session cost bounds the sample
  * count; each case still exercises every clause boundary. */
class MergeIntoPropSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", n).build()

  private def mkTable(dir: String, rows: Seq[(Long, String, Long)]): Unit = {
    import spark.implicits._
    IceLite.create(dir, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "grp", "STRING"),
      IceLite.ColDef(3, "v", "BIGINT"))), Vector("id"), buckets = 4)
    Merge.mergeEpoch(spark, dir,
      rows.toDF("id", "grp", "v")
        .select(col("id").as("id", fid(1)), col("grp").as("grp", fid(2)),
          col("v").as("v", fid(3)),
          col("id").as("seq"), lit("UPSERT").as("op")),
      "seq", "op", "e-0")
  }

  private final case class Cfg(
      matchedDelete: Boolean, // WHEN MATCHED AND s.del THEN DELETE
      sets: Int,              // 0 = SET v = s.v; 1 = SET v = s.v + t.v; 2 = SET *
      insert: Boolean,
      bySource: Boolean)      // NOT MATCHED BY SOURCE AND grp='g0' THEN DELETE

  private val genCase: Gen[(Seq[(Long, String, Long)],
      Seq[(Long, String, Long, Boolean)], Cfg)] = for {
    nKeys <- Gen.choose(8, 30)
    matchedIds <- Gen.someOf(1L to nKeys.toLong)
    nNew <- Gen.choose(0, 8)
    newIds <- Gen.pick(nNew, (nKeys + 1L) to (nKeys + 20L))
    grps <- Gen.listOfN(matchedIds.size + nNew, Gen.oneOf("g0", "g1", "g2"))
    vs <- Gen.listOfN(matchedIds.size + nNew, Gen.choose(0L, 9999L))
    dels <- Gen.listOfN(matchedIds.size + nNew, Gen.prob(0.3))
    cfg <- for {
      md <- Gen.oneOf(true, false)
      st <- Gen.choose(0, 2)
      in <- Gen.oneOf(true, false)
      bs <- Gen.oneOf(true, false)
    } yield Cfg(md, st, in, bs)
  } yield {
    val base = (1L to nKeys.toLong).map(i => (i, s"g${i % 4}", i * 10))
    val srcIds = (matchedIds ++ newIds).toSeq
    val src = srcIds.lazyZip(grps).lazyZip(vs).lazyZip(dels)
      .map((id, g, v, d) => (id, g, v, d))
    (base, src, cfg)
  }

  test("∀ random tables, sources and clause configs: mergeInto == the four-clause model") {
    import spark.implicits._
    var seed = Seed(777L)
    var case_ = 0
    while (case_ < 6) {
      genCase(Gen.Parameters.default.withSize(60), seed).foreach { case (base, src, cfg) =>
        val dir = java.nio.file.Files.createTempDirectory(s"graft-mprop$case_").toString + "/t"
        mkTable(dir, base)
        val sourceDf = src.toDF("id", "grp", "v", "del")
        val sets = cfg.sets match {
          case 0 => Seq("v" -> "s.v")
          case 1 => Seq("v" -> "s.v + t.v")
          case _ => Seq.empty // SET *: every source-carried data col (grp, v)
        }
        Dml.mergeInto(spark, dir, sourceDf,
          matchedDelete = if (cfg.matchedDelete) Some("s.del") else None,
          matchedSet = sets,
          insertNotMatched = cfg.insert,
          epochId = s"mprop-$case_",
          notMatchedBySourceDelete = if (cfg.bySource) Some("grp = 'g0'") else None)

        // plain-Scala four-clause model
        val baseMap = base.map { case (i, g, v) => i -> (g, v) }.toMap
        val srcMap = src.map { case (i, g, v, d) => i -> (g, v, d) }.toMap
        val model = scala.collection.mutable.Map.empty[Long, (String, Long)]
        baseMap.foreach { case (id, (g, v)) =>
          srcMap.get(id) match {
            case Some((sg, sv, sd)) =>
              if (cfg.matchedDelete && sd) () // WHEN MATCHED AND s.del DELETE
              else cfg.sets match {
                case 0 => model(id) = (g, sv)
                case 1 => model(id) = (g, sv + v)
                case _ => model(id) = (sg, sv) // SET *
              }
            case None =>
              // WHEN NOT MATCHED BY SOURCE AND grp='g0' THEN DELETE
              if (!(cfg.bySource && g == "g0")) model(id) = (g, v)
          }
        }
        if (cfg.insert) srcMap.foreach { case (id, (sg, sv, _)) =>
          if (!baseMap.contains(id)) model(id) = (sg, sv)
        }

        val got = IceLite.read(spark, IceLite.load(dir))
          .select("id", "grp", "v").collect()
          .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
        assert(got == model.toMap,
          s"case $case_ cfg=$cfg src=${src.size} base=${base.size}\n" +
            s"only-got=${(got.keySet -- model.keySet).toSeq.sorted}\n" +
            s"only-model=${(model.keySet -- got.keySet).toSeq.sorted}\n" +
            s"diff=${got.keySet.intersect(model.keySet.toSet)
              .filter(k => got(k) != model(k)).toSeq.sorted.map(k => (k, got(k), model(k)))}")
      }
      seed = seed.next
      case_ += 1
    }
  }
}
