package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders, SparkSession, DataFrame}
import Tables.ld

/** Multimodal-column plumbing: media payloads are opaque BINARY columns with
  * typed metadata. The Spark-side machinery — schema, typed mapPartitions in
  * executor-sized batches, partitioning — is real and tested; the actual
  * media decode is a STUB (this container has no image/audio libraries):
  * `stubDecode` below derives deterministic fake dimensions from the bytes,
  * standing in for a JNI/FFI decoder. Swap `stubDecode` for a real decoder
  * to productionize.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      channels: Long,
      n_frames: Long)

  /** STUB media decoder (???-equivalent): deterministic metadata from byte
    * length only — a real decoder would parse the container header here. */
  def stubDecode(docId: Long, blob: Array[Byte]): MediaMeta = {
    val n = blob.length.toLong
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      width = 64L + n % 512L,
      height = 64L + (n / 7L) % 512L,
      channels = 3L,
      n_frames = 1L + n % 24L)
  }

  /** Batch "decode" over the binary column: one partition = one batch, the
    * shape a Pandas-UDF/mapInPandas pipeline has in PySpark. */
  def decodeMedia(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) => stubDecode(id, blob) })(Encoders.product[MediaMeta])
      .toDF()
  }

  val queries: Seq[OpQuery] = Seq(
    OpQuery("q23_media_meta",
      (s, d) => {
        val docs = ld(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("blob"))
        decodeMedia(docs).orderBy("doc_id")
      },
      // the oracle mirrors the stub's arithmetic on octet_length(utf-8 bytes)
      Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        CAST(64 + octet_length(encode(text)) % 512 AS BIGINT) AS width,
        CAST(64 + (octet_length(encode(text)) // 7) % 512 AS BIGINT) AS height,
        CAST(3 AS BIGINT) AS channels,
        CAST(1 + octet_length(encode(text)) % 24 AS BIGINT) AS n_frames
        FROM documents ORDER BY doc_id""")),

    OpQuery("q28_frame_sample",
      // frame sampling over the opaque media payload: the container is
      // split into its n_frames (q23's stub framing), one ROW PER FRAME
      // with byte extent + a content fingerprint — the explode/flatten
      // plumbing a video pipeline needs (at scale: narrow explode, no
      // shuffle; frames of one media row stay in its partition). The
      // "decode" is the same honest stub (even byte split standing in for
      // container parsing); the fingerprint hashes the frame's hex form so
      // the arithmetic is string-identical in both engines.
      (s, d) => {
        graft.functions.Hash60.register(s)
        ld(s, d, "documents")
          .select(col("doc_id").cast("long").as("doc_id"),
            hex(col("text").cast("binary")).as("hx"),
            octet_length(col("text")).cast("long").as("n"))
          .withColumn("k", lit(1L) + col("n") % 24L)
          .select(col("doc_id"), col("hx"), col("n"), col("k"),
            explode(expr("sequence(0L, k - 1L)")).as("frame_idx"))
          .select(col("doc_id"), col("frame_idx"),
            expr("(frame_idx * n) div k").as("frame_offset"),
            expr("((frame_idx + 1) * n) div k - (frame_idx * n) div k").as("frame_len"),
            expr("hash60(substring(hx, CAST((frame_idx * n) div k AS INT) * 2 + 1, CAST(((frame_idx + 1) * n) div k - (frame_idx * n) div k AS INT) * 2))").as("frame_hash"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""SELECT doc_id, frame_idx, frame_offset, frame_len,
          CAST('0x' || substr(md5(substring(hx, CAST(frame_offset AS INT) * 2 + 1, CAST(frame_len AS INT) * 2)), 1, 15) AS BIGINT) AS frame_hash
        FROM (
          SELECT doc_id, hx, frame_idx,
            (frame_idx * n) // k AS frame_offset,
            ((frame_idx + 1) * n) // k - (frame_idx * n) // k AS frame_len
          FROM (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, hex(encode(text)) AS hx,
              CAST(octet_length(encode(text)) AS BIGINT) AS n,
              CAST(1 + octet_length(encode(text)) % 24 AS BIGINT) AS k,
              unnest(range(0, 1 + octet_length(encode(text)) % 24)) AS frame_idx
            FROM documents) f) g
        ORDER BY doc_id, frame_idx"""))
  )
}
