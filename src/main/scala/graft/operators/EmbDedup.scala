package graft.operators

import org.apache.spark.sql.functions._
import Tables.ld

/** INCREMENTAL / STREAMING embedding near-dup mining — the embedding-
  * modality twin of the MinHash path ([[DedupOps.SigStore]]): embeddings
  * arrive in batches, each batch is appended to a persisted LABEL-
  * partitioned store, and the verified near-dup pairs TOUCHING the batch
  * (new-old and new-new, exact cosine ≥ 0.35 within label blocks) are
  * emitted exactly once across batches — the union over batches equals the
  * full q20 batch pairing, pair for pair, cosine bit for bit.
  *
  * Scale shape: a batch reads ONLY the `lkey=K` directories its own labels
  * hash into (structural path pruning, the SigStore pattern — bounded by
  * the layout, never by corpus size), so per-batch cost is
  * O(batch × touched-label rows) exact-cosine work. For labels hot enough
  * that even that is too much, the store persists each vector's band keys
  * (computed ONCE at append, [[SimilarityOps.BandDefaults]]) so the mining
  * can opt into the tuned banded prefilter without re-signaturing the
  * corpus — banded output is a strict subset carrying identical cosines
  * (measured recall/fraction in BENCH ann_recall / the AnnEval sweep). */
object EmbDedup {

  /** How many label hash partitions the store uses. */
  val labelPartitions = 64

  private def lkeyCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(c), lit(labelPartitions.toLong)).cast("int")

  /** The persisted embedding store:
    *   <dir>/rows/batch=N/lkey=K/  (label, vec_id, embedding, bands) —
    *                               hash-partitioned on label; `bands` are
    *                               the vector's [[SimilarityOps.BandDefaults]]
    *                               band keys, precomputed at append.
    * Batch-dir idempotency, liveness, pruning, and crash-safe offline
    * compaction are the shared [[BatchStore]] machinery. */
  final case class EmbStore(dir: String) {
    def rowsDir: String = s"$dir/rows"

    /** Append one batch (idempotent per batchId): embeddings stored with
      * their band keys so later batches never re-signature them. */
    def append(s: org.apache.spark.sql.SparkSession,
        embs: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
      SimilarityOps.withBandKeys(s, embs)
        .withColumn("lkey", lkeyCol(col("label")))
        .repartition(col("lkey")) // one file per lkey, parallel write (§6)
        .write.partitionBy("lkey").mode("overwrite")
        .parquet(s"$rowsDir/batch=$batchId")

    /** The `lkey=K` directories holding `touched` label keys (audit). */
    def prunedPaths(touched: Set[Int]): Seq[String] =
      BatchStore.prunedPaths(rowsDir, "lkey", touched)

    def allPaths: Seq[String] =
      prunedPaths((0 until labelPartitions).toSet)

    /** Accumulated rows from ONLY the touched label partitions. */
    def rowsTouching(s: org.apache.spark.sql.SparkSession,
        touched: Set[Int]): org.apache.spark.sql.DataFrame = {
      val paths = prunedPaths(touched)
      if (paths.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("embedding",
              org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
            org.apache.spark.sql.types.StructField("bands",
              org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))))
      else s.read.option("basePath", rowsDir).parquet(paths: _*)
        .select("label", "vec_id", "embedding", "bands")
    }

    /** Offline batch-dir consolidation (stream stopped) — crash-safe via
      * the shared stage/mark/move/delete swap ([[BatchStore.compact]]). */
    def compactBatches(s: org.apache.spark.sql.SparkSession, intoBatchId: Long,
        crashPoint: String => Unit = _ => ()): Int =
      BatchStore.compact(dir, Seq(
        rowsDir -> ((stage: String) => {
          val live = BatchStore.liveBatchDirs(rowsDir)
          s.read.option("basePath", rowsDir).parquet(live.map(_.toString): _*)
            .select("label", "vec_id", "embedding", "bands")
            .withColumn("lkey", lkeyCol(col("label")))
            .repartition(col("lkey"))
            .write.partitionBy("lkey").mode("overwrite").parquet(stage)
        })),
        intoBatchId, crashPoint)
  }

  /** The label keys a batch touches — driver-side, bounded by
    * [[labelPartitions]] (never by batch or corpus size). */
  def touchedLabelKeys(s: org.apache.spark.sql.SparkSession,
      newEmbs: org.apache.spark.sql.DataFrame): Set[Int] =
    newEmbs.select(lkeyCol(col("label")).as("lkey"))
      .distinct().collect().map(_.getInt(0)).toSet

  /** Verified near-dup pairs TOUCHING the batch, over the store. Contract:
    * `newEmbs` (label, vec_id, embedding) is already appended. Exactly-once
    * across batches: a pair is emitted in the batch of its LATER-arriving
    * member (both-in-batch pairs collapse under the canonicalized
    * distinct; cosine is symmetric bit for bit — element-wise products and
    * the norm product commute exactly in IEEE arithmetic — so the distinct
    * is safe on (a, b, cos)).
    *
    * `bandPrefilter` opts the batch-vs-accumulated pairing into the tuned
    * banded prefilter using the STORED band keys (no re-signaturing):
    * candidates = pairs agreeing on ≥ minCollide of the precomputed bands,
    * then the exact cosine verifies — a strict subset of the exact result
    * with identical cosines (the q20 hot-tier trade, measured in BENCH). */
  def incrementalNeardupPairsStored(s: org.apache.spark.sql.SparkSession,
      store: EmbStore, newEmbs: org.apache.spark.sql.DataFrame,
      bandPrefilter: Boolean = false,
      minCollide: Int = SimilarityOps.BandDefaults._3): org.apache.spark.sql.DataFrame = {
    val touched = touchedLabelKeys(s, newEmbs)
    val acc = store.rowsTouching(s, touched)
    val newSide = SimilarityOps.withBandKeys(s,
      newEmbs.select(col("label"), col("vec_id"), col("embedding")))
    val paired =
      if (!bandPrefilter)
        newSide.as("l").join(acc.as("r"),
            col("l.label") === col("r.label") && col("l.vec_id") =!= col("r.vec_id"))
          .select(
            least(col("l.vec_id"), col("r.vec_id")).as("a"),
            greatest(col("l.vec_id"), col("r.vec_id")).as("b"),
            col("l.embedding").as("va"), col("r.embedding").as("vb"))
      else {
        // band keys are positional: candidates agree on >= minCollide of
        // the STORED bands (computed once at append — no re-signaturing)
        val lb = newSide.select(col("label"), col("vec_id").as("lvec"),
          posexplode(col("bands")).as(Seq("band", "bkey")))
        val rb = acc.select(col("label"), col("vec_id").as("rvec"),
          posexplode(col("bands")).as(Seq("band", "bkey")))
        val cand = lb.join(rb, Seq("label", "band", "bkey"))
          .filter(col("lvec") =!= col("rvec"))
          .groupBy("label", "lvec", "rvec").agg(count(lit(1)).as("__nc"))
          .filter(col("__nc") >= minCollide)
          .select("label", "lvec", "rvec")
        cand
          .join(newSide.select(col("label"), col("vec_id").as("lvec"),
            col("embedding").as("l_emb")), Seq("label", "lvec"))
          .join(acc.select(col("label"), col("vec_id").as("rvec"),
            col("embedding").as("r_emb")), Seq("label", "rvec"))
          .select(
            least(col("lvec"), col("rvec")).as("a"),
            greatest(col("lvec"), col("rvec")).as("b"),
            col("l_emb").as("va"), col("r_emb").as("vb"))
      }
    paired
      .withColumn("cos", expr(SimilarityOps.sparkCosSql))
      .filter(col("cos") >= 0.35)
      .select("a", "b", "cos").distinct()
  }
}
