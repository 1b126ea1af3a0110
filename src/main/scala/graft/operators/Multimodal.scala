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

  final case class MediaFeatures(
      doc_id: Long, out_w: Long, out_h: Long, byte_mean_x1000: Long,
      h0: Long, h1: Long, h2: Long, h3: Long, h4: Long, h5: Long, h6: Long, h7: Long)

  /** Resize + feature-extract plumbing in ONE typed pass over the blob
    * (the mapInPandas batch shape): resize is the aspect-preserving
    * downscale arithmetic on the stub-decoded dimensions (longest side
    * capped at `target`, never upscaled — a real resampler slots into the
    * same pass); features are an 8-bin byte histogram + integer-scaled mean
    * byte value, standing in for channel statistics. Integer math only, so
    * the DuckDB oracle reproduces every value exactly. */
  def resizeAndFeatures(df: DataFrame, target: Long = 224L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val meta = stubDecode(id, blob)
        val m = math.max(meta.width, meta.height)
        val (ow, oh) =
          if (m <= target) (meta.width, meta.height)
          else (meta.width * target / m, meta.height * target / m)
        val hist = new Array[Long](8)
        var sum = 0L
        var i = 0
        while (i < blob.length) {
          val b = blob(i) & 0xff
          hist(b >> 5) += 1
          sum += b
          i += 1
        }
        val mean = if (blob.length == 0) 0L else sum * 1000L / blob.length
        MediaFeatures(id, ow, oh, mean,
          hist(0), hist(1), hist(2), hist(3), hist(4), hist(5), hist(6), hist(7))
      })(Encoders.product[MediaFeatures])
      .toDF()
  }

  val queries: Seq[OpQuery] = Seq(

    OpQuery("q37_media_resize_features",
      (s, d) => {
        val docs = ld(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("blob"))
        resizeAndFeatures(docs).orderBy("doc_id")
      },
      // the oracle replays the stub dims, the downscale arithmetic, and the
      // byte histogram/mean through hex-decoded byte lists — integer math,
      // value-identical
      Some("""WITH b AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id, hex(encode(text)) AS hx,
            CAST(octet_length(encode(text)) AS BIGINT) AS n
          FROM documents),
        dims AS (
          SELECT *, 64 + n % 512 AS w, 64 + (n // 7) % 512 AS h,
            greatest(64 + n % 512, 64 + (n // 7) % 512) AS m
          FROM b),
        u AS (
          SELECT *, list_transform(range(0, n),
            i -> CAST('0x' || substr(hx, CAST(i AS INT) * 2 + 1, 2) AS BIGINT)) AS bytes
          FROM dims)
        SELECT doc_id,
          CAST(CASE WHEN m <= 224 THEN w ELSE w * 224 // m END AS BIGINT) AS out_w,
          CAST(CASE WHEN m <= 224 THEN h ELSE h * 224 // m END AS BIGINT) AS out_h,
          CAST(CASE WHEN n = 0 THEN 0 ELSE list_sum(bytes) * 1000 // n END AS BIGINT) AS byte_mean_x1000,
          CAST(len(list_filter(bytes, x -> x // 32 = 0)) AS BIGINT) AS h0,
          CAST(len(list_filter(bytes, x -> x // 32 = 1)) AS BIGINT) AS h1,
          CAST(len(list_filter(bytes, x -> x // 32 = 2)) AS BIGINT) AS h2,
          CAST(len(list_filter(bytes, x -> x // 32 = 3)) AS BIGINT) AS h3,
          CAST(len(list_filter(bytes, x -> x // 32 = 4)) AS BIGINT) AS h4,
          CAST(len(list_filter(bytes, x -> x // 32 = 5)) AS BIGINT) AS h5,
          CAST(len(list_filter(bytes, x -> x // 32 = 6)) AS BIGINT) AS h6,
          CAST(len(list_filter(bytes, x -> x // 32 = 7)) AS BIGINT) AS h7
        FROM u ORDER BY doc_id""")),
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
