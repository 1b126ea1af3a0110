package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The provenance ledger (q190) must be the exact per-document inverse of
  * the q44 pipeline: its 'kept' rows are q44's materialized survivors (same
  * ids, same shards), every document appears exactly once, and stage
  * evidence is self-consistent (dup_of strictly below, only on dup drops;
  * shard only on keeps). */
class ProvenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("kept rows == q44 output; one row per doc; evidence columns consistent") {
    val prov = SparkEntry_q190(spark).cache()
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(prov.count() == total, "one provenance row per input document")
    assert(prov.select("doc_id").distinct().count() == total)

    val verdicts = prov.select("verdict").distinct()
      .collect().map(_.getString(0)).toSet
    assert(verdicts.subsetOf(Set("dropped_quality", "dropped_repetition",
      "dropped_dup", "dropped_sample", "kept")))

    // dup_of strictly below its doc, and only on dup drops
    assert(prov.filter(col("dup_of").isNotNull &&
      (col("verdict") =!= "dropped_dup" || col("dup_of") >= col("doc_id")))
      .count() == 0)
    assert(prov.filter(col("verdict") === "dropped_dup" && col("dup_of").isNull)
      .count() == 0)
    // shard present iff kept
    assert(prov.filter((col("verdict") === "kept") =!= col("shard").isNotNull)
      .count() == 0)

    // the kept slice IS q44's materialized output (ids + shards)
    val q44 = graft.SparkEntry.queries("q44_curation_pipeline")(spark, sfDir)
      .select(col("doc_id"), col("shard"))
    val kept = prov.filter(col("verdict") === "kept").select("doc_id", "shard")
    assert(kept.exceptAll(q44).count() == 0 && q44.exceptAll(kept).count() == 0,
      "provenance 'kept' must equal the q44 pipeline output")
  }

  private def SparkEntry_q190(s: SparkSession) =
    graft.SparkEntry.queries("q190_curation_provenance")(s, sfDir)
}
