package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{Cdc, LogGen}

/** Projection pushdown into proto_decode: the rule must fire on the shapes
  * the optimizer actually produces, never fire when the whole struct is
  * read, and a pruned decode must return the same values for the fields it
  * keeps. */
class PruneProtoDecodeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    PruneProtoDecode.install(s)
    s
  }

  private def payload(repo: String, content: String, seq: Long): Array[Byte] = {
    val fs = Cdc.fsV2
    val desc = fs.findMessage("RepoChange").get
    LogGen.encodeChange(LogGen.RawChange(repo, "p", "c", "scala", content, seq, "UPSERT", "au"),
      desc, fs, includeAuthor = true)
  }

  // parquet-backed (a LocalRelation input would be constant-folded away,
  // decode and all, before the rule could be observed)
  private lazy val raw: DataFrame = {
    import spark.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-prune-spec"
    Seq(payload("r1", "body-1", 5L), payload("r2", "body-2", 9L)).toDF("payload")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def decodesIn(df: DataFrame): Seq[ProtoDecode] =
    df.queryExecution.optimizedPlan.flatMap(_.expressions.flatMap(_.collect {
      case pd: ProtoDecode => pd
    }))

  test("subset projection narrows the decode to the accessed field numbers") {
    val df = raw
      .select(ProtoFunctions.proto_decode(col("payload"), Cdc.protoV2, "RepoChange").as("m"))
      .select(col("m.repo").as("repo"), col("m.seq").as("seq"))
    val pds = decodesIn(df)
    assert(pds.nonEmpty)
    // repo = field 1, seq = field 6; content (5) and the rest are skipped
    assert(pds.forall(_.allowed.contains(Set(1, 6))), s"got ${pds.map(_.allowed)}")
    val out = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("r1", 5L), ("r2", 9L)))
  }

  test("bare struct use disables pruning") {
    val df = raw
      .select(ProtoFunctions.proto_decode(col("payload"), Cdc.protoV2, "RepoChange").as("m"))
      .select(col("m.repo"), col("m"))
    assert(decodesIn(df).forall(_.allowed.isEmpty))
    // full decode still carries every field
    val row = df.orderBy("repo").collect().head.getStruct(1)
    assert(row.getAs[String]("content") == "body-1")
  }

  test("pruned and full decode agree on the kept fields; pruned drops the fat one") {
    val full = raw
      .select(ProtoFunctions.proto_decode(col("payload"), Cdc.protoV2, "RepoChange").as("m"))
      .select(col("m.repo").as("repo"), col("m.content").as("content"),
        col("m.seq").as("seq"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(full == Set(("r1", "body-1", 5L), ("r2", "body-2", 9L)))
    // and an explicit pruned expression fills proto defaults for skipped fields
    import org.apache.spark.sql.graft.ColumnShim.{column, expression}
    val pruned = column(ProtoDecode(
      expression(col("payload")), Left(Cdc.protoV2), "RepoChange", Some(Set(1, 6))))
    val r = raw.select(pruned.as("m")).selectExpr("m.repo", "m.content", "m.seq")
      .orderBy("m.repo").collect().head
    assert(r.getString(0) == "r1" && r.getString(1) == "" && r.getLong(2) == 5L)
  }
}
