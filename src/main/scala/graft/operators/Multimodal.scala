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
        FROM documents ORDER BY doc_id"""))
  )
}
