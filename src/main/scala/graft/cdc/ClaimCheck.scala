package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** CLAIM-CHECK PATTERN for oversized change events (the Kafka/Debezium
  * recipe for payloads the transport won't carry inline): [[checkIn]]
  * splits a log — payloads above the threshold move to a CONTENT-ADDRESSED
  * blob store (`<xxhash64>-<length>.bin`, write-once: staged then
  * atomically renamed, so a concurrent or replayed check-in of the same
  * payload is a no-op; the store additionally BYTE-VERIFIES whenever an
  * address is revisited, so an (xxhash64, length) collision between two
  * distinct payloads fails loudly instead of silently aliasing one payload
  * to the other's events) and the log row keeps only the claim token;
  * [[resolver]] re-inlines them on the consumer side as a JOIN against the
  * blob store read through Spark's binaryFile source — a distributed
  * (and, for the usual few oversized rows, broadcast) hash join, never
  * per-row file opens on the hot path.
  *
  * Why this shape at 100 TB: transports cap message size (Kafka default
  * 1 MiB) and a log whose row-group size is dictated by a few mega-payloads
  * scans terribly for everyone else. Splitting keeps the log's inline rows
  * small and uniform (bounded row groups, fast envelope-only scans) while
  * dedup at the blob layer stores each oversized payload ONCE however many
  * times it is re-delivered. Resolution plugs into
  * [[Replay.replayLog]]'s `eventTransform` hook, so it fuses into each
  * epoch's decode plan instead of materializing a resolved log copy. */
object ClaimCheck {

  final case class CheckInStats(events: Long, claimed: Long, blobs: Long)

  private def blobName(claim: String): String = s"$claim.bin"

  /** The claim token: `<xxhash64 payload>-<payload length>` (both hex).
    * Hash alone is a 64-bit birthday bound — ~50% collision odds by ~5e9
    * blobs, exactly the scale this module advertises; the length qualifier
    * plus the write-path byte verification below turn a collision from
    * silent payload substitution into a loud error. */
  private def claimExpr: org.apache.spark.sql.Column =
    format_string("%016x-%08x", xxhash64(col("payload")), length(col("payload")))

  /** Split `logDir` into `outLogDir` (claimed rows carry `claim` = the
    * payload's content address and a NULL payload) + `blobDir` (one
    * content-addressed file per distinct oversized payload). Layout (epoch
    * partitioning, row-group size) is preserved. Revisiting an existing
    * address verifies the stored bytes equal the new payload's — a
    * mismatch (content-address collision, or a corrupted blob) throws
    * rather than aliasing two payloads to one claim. */
  def checkIn(spark: SparkSession, logDir: String, outLogDir: String,
      blobDir: String, threshold: Int): CheckInStats = {
    require(threshold > 0, "threshold must be positive")
    val log = spark.read.parquet(logDir)
    val withClaim = log.withColumn("claim",
      when(length(col("payload")) > threshold, claimExpr))
    Files.createDirectories(Paths.get(blobDir))
    val blobs = withClaim.filter(col("claim").isNotNull)
      .select(col("claim"), col("payload")).dropDuplicates("claim")
    blobs.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      it.foreach { r =>
        val claim = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        val target = Paths.get(blobDir, blobName(claim))
        def verify(): Unit =
          if (!java.util.Arrays.equals(Files.readAllBytes(target), bytes))
            throw new IllegalStateException(
              s"content-address collision at $target: a distinct payload " +
                "already owns this (xxhash64, length) — refusing to alias")
        if (Files.exists(target)) verify()
        else {
          val tmp = Files.createTempFile(Paths.get(blobDir), ".stage-", ".tmp")
          Files.write(tmp, bytes)
          try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
          catch { case _: java.nio.file.FileAlreadyExistsException =>
            Files.deleteIfExists(tmp)
            verify() // concurrent writer won: must hold the same bytes
          }
        }
      }
    }
    withClaim.withColumn("payload",
        when(col("claim").isNotNull, lit(null).cast("binary"))
          .otherwise(col("payload")))
      .write.option("parquet.block.size", 16 * 1024 * 1024)
      .partitionBy("epoch").mode("overwrite").parquet(outLogDir)
    // stats off the (smaller) written log — one scan, not two of the source
    val counted = spark.read.parquet(outLogDir)
      .agg(count(lit(1)).as("n"), count(col("claim")).as("c")).head()
    CheckInStats(counted.getLong(0), counted.getLong(1),
      Files.list(Paths.get(blobDir)).iterator().asScala
        .count(_.getFileName.toString.endsWith(".bin")))
  }

  private val BlobRe = """([0-9a-f]{16}-[0-9a-f]{8})\.bin$""".r

  /** The blob store as a (claim, payload) frame — Spark's binaryFile
    * source, claim parsed back from the content address. */
  def blobFrame(spark: SparkSession, blobDir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(blobDir)
      .select(col("path"), col("content"))
      .withColumn("claim", udf((p: String) => BlobRe.findFirstMatchIn(p)
        .map(_.group(1))
        .getOrElse(sys.error(s"not a blob path: $p"))).apply(col("path")))
      .select(col("claim"), col("content"))

  /** The consumer-side re-inline step for [[Replay.replayLog]]'s
    * `eventTransform`: claimed rows join their payload back from the blob
    * store (inner join — a dangling claim is a hard error surfaced as a
    * row-count drop the replay verifier catches), unclaimed rows pass
    * through untouched. */
  def resolver(spark: SparkSession, blobDir: String): DataFrame => DataFrame = {
    raw =>
      if (!raw.columns.contains("claim")) raw
      else {
        val blobs = broadcast(blobFrame(spark, blobDir))
        val claimed = raw.filter(col("claim").isNotNull)
          .drop("payload")
          .join(blobs, "claim")
          .withColumnRenamed("content", "payload")
        raw.filter(col("claim").isNull)
          .unionByName(claimed.select(raw.columns.map(col).toIndexedSeq: _*))
          .drop("claim")
      }
  }
}
