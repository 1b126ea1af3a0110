package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.ld

/** INVERTED TEXT INDEX — keyword search served off a token-partitioned
  * postings store instead of a corpus scan. Build tokenizes each document
  * once (the same `[a-z0-9]+` rule every text gate shares with the DuckDB
  * oracle), folds term frequencies with a partial-agg shuffle, and writes
  * postings hash-partitioned by token into the [[BatchStore]] layout
  * (`postings/batch=N/tbucket=K/`). A multi-term AND query then derives its
  * buckets HOST-SIDE from the query terms (xxhash64 ≡ Spark's, so the same
  * term always lands in the same directory) and reads ONLY those
  * directories: cost is O(the query terms' posting lists), independent of
  * corpus size — the property that makes keyword search serveable over a
  * 100 TB document set where any scan-shaped plan is off the table.
  *
  * Incremental: each ingest batch appends its own `batch=N` subtree
  * (idempotent overwrite per batch id — safe under foreachBatch replay);
  * readers union live batches; `compactBatches` bounds small-file and
  * directory accumulation offline with the crash-safe staged-swap protocol
  * shared with SigStore / EmbStore / IvfIndex.
  */
object TextIndex {

  /** Per-index metadata, persisted so readers and later appends agree on
    * the bucket count (changing it would re-home every term). */
  final case class Index(dir: String, buckets: Int) {
    def postingsDir: String = s"$dir/postings"

    private def bucketCol: Column =
      pmod(xxhash64(col("token")), lit(buckets)).cast("int")

    /** Host-side bucket of one query term — must agree with [[bucketCol]];
      * graft.functions.XxHash64Host is property-tested against Spark's
      * xxhash64 expression. */
    def bucketOf(term: String): Int =
      java.lang.Math.floorMod(
        graft.functions.XxHash64Host.hashString(term, graft.functions.XxHash64Host.SparkSeed),
        buckets.toLong).toInt

    /** Append one document batch's postings (idempotent per batchId: the
      * batch dir is an overwrite, never a double append). */
    def append(docs: DataFrame, batchId: Long): Unit =
      postings(docs).withColumn("tbucket", bucketCol)
        .write.partitionBy("tbucket").mode("overwrite")
        .parquet(s"$postingsDir/batch=$batchId")

    /** The `tbucket=K` directories (across live batches) a term set reads —
      * exposed so tests can audit structural pruning. */
    def prunedPaths(terms: Seq[String]): Seq[String] =
      BatchStore.prunedPaths(postingsDir, "tbucket", terms.map(bucketOf).toSet)

    /** Every `tbucket=K` directory currently live (audit helper). */
    def allPaths: Seq[String] =
      BatchStore.prunedPaths(postingsDir, "tbucket", (0 until buckets).toSet)

    /** Documents containing ALL `terms`, scored by total term frequency.
      * Reads only the terms' bucket directories (host-side listing), then
      * one small aggregation keyed by doc_id over the matching postings.
      * Returns (doc_id, score). */
    def searchAll(spark: SparkSession, terms: Seq[String]): DataFrame = {
      val ts = terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
      require(ts.nonEmpty, "searchAll needs at least one term")
      val paths = prunedPaths(ts)
      if (paths.isEmpty)
        return spark.range(0).select(col("id").as("doc_id"), col("id").as("score"))
      spark.read.option("basePath", postingsDir).parquet(paths: _*)
        .filter(col("token").isin(ts: _*))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nt"), sum("tf").as("score"))
        // tf rows are unique per (doc_id, token), so nt == distinct terms
        .filter(col("nt") === ts.size)
        .select(col("doc_id"), col("score"))
    }

    /** Offline maintenance: consolidate live `batch=N` dirs into one
      * (same tbucket partitioning — pruning semantics unchanged) via the
      * shared crash-safe staged-swap. */
    def compactBatches(spark: SparkSession, intoBatchId: Long,
        crashPoint: String => Unit = _ => ()): Int = {
      val live = BatchStore.liveBatchDirs(postingsDir)
      def all: DataFrame =
        spark.read.option("basePath", postingsDir).parquet(live.map(_.toString): _*)
          .select("doc_id", "token", "tf", "tbucket")
      BatchStore.compact(dir, Seq(postingsDir -> { stage: String =>
        all.write.partitionBy("tbucket").parquet(stage)
      }), intoBatchId, crashPoint)
    }
  }

  /** (doc_id, token, tf) — tokenize once, fold term frequency with a
    * partial-agg shuffle. The shared tokenizer rule keeps Spark and the
    * DuckDB oracle identical (TextOps.wordsSpark / wordsDuck). */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(expr(TextOps.wordsSpark)).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))

  def create(dir: String, buckets: Int = 32): Index = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val meta = d.resolve("index.json")
    require(!Files.exists(meta), s"index already exists at $dir")
    Files.write(meta, s"""{"buckets":$buckets}""".getBytes("UTF-8"))
    Index(dir, buckets)
  }

  def loadIndex(dir: String): Index = {
    val meta = Paths.get(dir, "index.json")
    require(Files.exists(meta), s"no index at $dir")
    val s = new String(Files.readAllBytes(meta), "UTF-8")
    val b = """"buckets"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"corrupt index meta: $s"))
    Index(dir, b)
  }

  private val q125Terms = Seq("dup", "merge", "window")

  val queries: Seq[OpQuery] = Seq(
    OpQuery("q125_inverted_index",
      // KEYWORD SEARCH OFF THE INDEX under the hard gate: the postings
      // store is built INCREMENTALLY (two document waves, separate
      // batches), compacted through the crash-safe swap, and the AND query
      // answers from only the query terms' bucket directories — the gate
      // hard-asserts the structural pruning (paths read << paths live) and
      // that pre- and post-compaction answers are identical. The oracle
      // recomputes the same search by brute force over the raw documents
      // table, so a posting lost anywhere (tokenize, append, compact,
      // prune) breaks equality.
      (s, d) => {
        val root = s"${System.getProperty("java.io.tmpdir")}/graft-q125"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
        val docs = ld(s, d, "documents")
        val idx = create(root, buckets = 32)
        idx.append(docs.filter(col("doc_id") % 4 =!= 0), batchId = 1L)
        idx.append(docs.filter(col("doc_id") % 4 === 0), batchId = 2L)
        val before = idx.searchAll(s, q125Terms)
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
        require(before.nonEmpty, "gate is vacuous: no documents match the query")
        val pruned = idx.prunedPaths(q125Terms).size
        val all = idx.allPaths.size
        require(pruned < all,
          s"no structural pruning: read $pruned of $all bucket dirs")
        CdcQueries.putMetric("q125", "dirs_read", pruned.toDouble)
        CdcQueries.putMetric("q125", "dirs_live", all.toDouble)
        require(idx.compactBatches(s, intoBatchId = 1000L) == 2,
          "compaction must collapse both live batches")
        val after = idx.searchAll(s, q125Terms)
        require(after.collect().map(r => (r.getLong(0), r.getLong(1)))
          .sortBy(_._1).toSeq == before,
          "post-compaction search must equal pre-compaction")
        after.orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score FROM (
          SELECT doc_id, token, count(*) AS tf FROM (
            SELECT doc_id, unnest(${TextOps.wordsDuck}) AS token FROM documents) t
          WHERE token IN (${q125Terms.map(t => s"'$t'").mkString(", ")})
          GROUP BY 1, 2) tf
        GROUP BY doc_id HAVING count(DISTINCT token) = ${q125Terms.size}
        ORDER BY doc_id"""))
  )
}
