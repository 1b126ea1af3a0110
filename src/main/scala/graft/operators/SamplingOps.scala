package graft.operators

import org.apache.spark.sql.functions._
import Tables.ld

/** Corpus sampling for training-data pipelines — DETERMINISTIC, hash-based
  * (never `rand()`): a document's membership depends only on its id, so a
  * re-run, a resumed job, or a different cluster produces the identical
  * sample (and an UPSTREAM change can't silently reshuffle it). The
  * per-stratum rate is the standard language-rebalancing move: downsample
  * the dominant language, keep the tail.
  *
  * Scale shape: a single narrow filter over the scan — no shuffle, no
  * sort; the per-row cost is one md5 (the shared hash60, codegen'd). At
  * 100 TB this is the cheapest possible pass, and the stratum rates can be
  * tuned without re-reading anything but the id + lang columns. */
object SamplingOps {

  // per-mille keep-rates by language: en is dominant in the corpus (~45%),
  // so it is downsampled hardest
  private val rates = Seq("en" -> 100, "zh" -> 400, "es" -> 400, "de" -> 400)
  private val defaultRate = 600

  private[operators] val rateSql =
    "CASE " + rates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ") +
      s" ELSE $defaultRate END"

  val queries: Seq[OpQuery] = Seq(
    OpQuery("q31_stratified_sample",
      (s, d) => {
        graft.functions.Hash60.register(s)
        ld(s, d, "documents")
          .withColumn("h", expr("pmod(hash60(concat('sample:', CAST(doc_id AS STRING))), 1000)"))
          .withColumn("keep_rate", expr(rateSql))
          .filter(col("h") < col("keep_rate"))
          .select(col("doc_id"), col("lang"), col("h"), col("keep_rate"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang, h, keep_rate FROM (
        SELECT doc_id, lang,
          CAST('0x' || substr(md5('sample:' || doc_id), 1, 15) AS BIGINT) % 1000 AS h,
          $rateSql AS keep_rate
        FROM documents) t
        WHERE h < keep_rate ORDER BY doc_id"""))
  )
}
