package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Claim check: split + resolve is a byte-exact round trip, blobs are
  * content-addressed write-once (idempotent re-check-in, dedup across
  * re-deliveries), and the threshold is a strict bound. */
class ClaimCheckSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeLog(root: String): String = {
    val logDir = s"$root/log"
    LogGen.writeLog(spark, LogGen.Params(nEvents = 400, nRepos = 10,
      pathsPerRepo = 5, v1Fraction = 0.5), logDir, epochs = 2)
    logDir
  }

  test("split + resolve round-trips every payload byte-exactly; dedup on re-delivery") {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-claim-spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val logDir = writeLog(root)
    // duplicate a slice of the log (re-delivered oversized payloads)
    val log = spark.read.parquet(logDir)
    val dupDir = s"$root/log-dup"
    log.unionByName(log.filter(pmod(col("offset"), lit(3)) === 0))
      .write.partitionBy("epoch").mode("overwrite").parquet(dupDir)
    val st = ClaimCheck.checkIn(spark, dupDir, s"$root/claimed", s"$root/blobs", 700)
    assert(st.claimed > 0 && st.claimed < st.events, s"real split: $st")
    assert(st.blobs < st.claimed, "re-delivered payloads must share one blob")
    val resolved = ClaimCheck.resolver(spark, s"$root/blobs")(
      spark.read.parquet(s"$root/claimed"))
    val a = resolved.select(col("offset"), col("partition"), sha2(col("payload"), 256).as("h"))
      .groupBy("offset", "partition").agg(sort_array(collect_list("h")).as("hs"))
    val b = spark.read.parquet(dupDir)
      .select(col("offset"), col("partition"), sha2(col("payload"), 256).as("h"))
      .groupBy("offset", "partition").agg(sort_array(collect_list("h")).as("hs"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "resolved log must equal the original byte-for-byte")
    // idempotent: re-check-in writes nothing new
    val again = ClaimCheck.checkIn(spark, dupDir, s"$root/claimed2", s"$root/blobs", 700)
    assert(again.blobs == st.blobs)
  }

  test("revisiting a content address with different bytes fails loudly") {
    import spark.implicits._
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-claim-collide"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val rows = Seq((Array.fill[Byte](65)(3), "s", 1, "M", 0, 0L, 0L))
      .toDF("payload", "schemaId", "schemaVersion", "messageType",
        "partition", "offset", "epoch")
    rows.write.partitionBy("epoch").mode("overwrite").parquet(s"$root/log")
    val st = ClaimCheck.checkIn(spark, s"$root/log", s"$root/claimed",
      s"$root/blobs", threshold = 64)
    assert(st.blobs == 1)
    // simulate an (xxhash64, length) collision — or a corrupted blob — by
    // swapping the stored bytes under the same content address
    val blob = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/blobs"))
      .iterator().asScala.find(_.toString.endsWith(".bin")).get
    java.nio.file.Files.write(blob, Array.fill[Byte](65)(9))
    val err = intercept[org.apache.spark.SparkException] {
      ClaimCheck.checkIn(spark, s"$root/log", s"$root/claimed2",
        s"$root/blobs", threshold = 64)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(err).exists(m => m != null && m.contains("content-address collision")),
      s"collision must refuse, not alias: ${err.getMessage}")
  }

  test("threshold is strict: payload of exactly N bytes stays inline") {
    import spark.implicits._
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-claim-thresh"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val rows = Seq(
      (Array.fill[Byte](10)(1), "s", 1, "M", 0, 0L, 0L),
      (Array.fill[Byte](64)(2), "s", 1, "M", 0, 1L, 0L),
      (Array.fill[Byte](65)(3), "s", 1, "M", 0, 2L, 0L))
      .toDF("payload", "schemaId", "schemaVersion", "messageType",
        "partition", "offset", "epoch")
    rows.write.partitionBy("epoch").mode("overwrite").parquet(s"$root/log")
    val st = ClaimCheck.checkIn(spark, s"$root/log", s"$root/claimed",
      s"$root/blobs", threshold = 64)
    assert(st.claimed == 1 && st.blobs == 1, s"only the 65-byte payload moves: $st")
    val inline = spark.read.parquet(s"$root/claimed")
      .filter(col("claim").isNull).count()
    assert(inline == 2)
  }
}
