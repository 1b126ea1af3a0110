package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{Cdc, LogGen}

class ProtoDecodeExpressionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def payload(repo: String, seq: Long): Array[Byte] = {
    val fs = Cdc.fsV1
    val desc = fs.findMessage("RepoChange").get
    LogGen.encodeChange(LogGen.RawChange(repo, "p", "c", "scala", "x", seq, "UPSERT", ""),
      desc, fs, includeAuthor = false)
  }

  test("proto_decode Column API decodes binary to struct") {
    import spark.implicits._
    val df = Seq(payload("r1", 5L), payload("r2", 9L)).toDF("payload")
    val out = df.select(ProtoFunctions.proto_decode($"payload", Cdc.protoV1, "RepoChange").as("m"))
      .select("m.repo", "m.seq").as[(String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("r1", 5L), ("r2", 9L)))
  }

  test("proto_decode in SQL via function registry; malformed → null") {
    import spark.implicits._
    ProtoFunctions.register(spark)
    Seq(payload("r1", 5L), Array[Byte](0x0f, 0x01)).toDF("payload")
      .createOrReplaceTempView("raw_log")
    val lit = Cdc.protoV1.replace("'", "''")
    val rows = spark.sql(
      s"SELECT proto_decode(payload, '$lit', 'RepoChange').repo AS repo FROM raw_log")
      .as[Option[String]].collect().toSeq
    assert(rows.contains(Some("r1")))
    assert(rows.contains(None)) // malformed payload decodes to null
  }

  test("GraftExtensions builds a working proto_decode from injected builder") {
    // extensions only apply to freshly-built sessions; in a shared-JVM test
    // suite we validate the injection contract directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(exts)
    val expr = ProtoDecode(Literal(payload("rX", 1L)), Left(Cdc.protoV1), "RepoChange")
    val row = expr.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val schema = expr.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(row.getString(schema.fieldIndex("repo")) == "rX")
    assert(row.getLong(schema.fieldIndex("seq")) == 1L)
  }

  test("GraftExtensions on a fresh session wires function + pruning rule end-to-end") {
    // a FRESH SparkSession built with the extensions must resolve
    // proto_decode in SQL and run PruneProtoDecode without any
    // register()/install() call. NB the `spark.sql.extensions=...` config
    // string is read from the SPARKCONTEXT's conf (SparkSession.
    // applyExtensions), which in this shared-context suite already exists
    // without it — so the test applies the same object through the
    // builder's withExtensions path; on a cluster the --conf flag reaches
    // the context and takes the config path.
    val SS = org.apache.spark.sql.SparkSession
    val (prevDefault, prevActive) = (SS.getDefaultSession, SS.getActiveSession)
    SS.clearDefaultSession(); SS.clearActiveSession()
    try {
      val fresh = SS.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(prevActive.isEmpty || !(fresh eq prevActive.get),
        "must be a newly-built session, or the test proves nothing")
      import fresh.implicits._
      // parquet-backed input: a local Seq relation would be constant-folded
      // (decode and all) before the optimizer rule could see it
      val dir = java.nio.file.Files.createTempDirectory("graft-ext").toString + "/log"
      Seq(payload("rE", 9L)).toDF("payload").write.parquet(dir)
      fresh.read.parquet(dir).createOrReplaceTempView("ext_log")
      val lit = Cdc.protoV1.replace("'", "''")
      val df = fresh.sql(
        s"SELECT proto_decode(payload, '$lit', 'RepoChange').repo AS repo FROM ext_log")
      assert(df.as[String].collect().toSeq == Seq("rE"))
      // the injected optimizer rule narrowed the decode to the read ordinal
      val pruned = df.queryExecution.optimizedPlan.flatMap(
        _.expressions.flatMap(_.collect { case pd: ProtoDecode => pd }))
      assert(pruned.nonEmpty && pruned.forall(_.allowed.exists(_.contains(1))),
        s"injected rule must prune: ${pruned.map(_.allowed)}")
    } finally {
      SS.clearDefaultSession(); SS.clearActiveSession()
      prevDefault.foreach(SS.setDefaultSession)
      prevActive.foreach(SS.setActiveSession)
    }
  }
}
