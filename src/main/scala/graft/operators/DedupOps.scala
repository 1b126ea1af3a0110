package graft.operators

import org.apache.spark.sql.functions._
import Tables.ld

/** Deduplication operators for a training-data pipeline: exact (hash
  * groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
  * SimHash, n-gram Jaccard. All deterministic: hash functions are
  * md5-derived 60-bit ints reproduced verbatim in the DuckDB oracle.
  *
  * Performance shape:
  *  - each shingle/word is md5-hashed ONCE (`hs`), the K minhash functions
  *    are cheap affine transforms over those ints;
  *  - LSH candidates come from band-bucket hash joins (never a cross join),
  *    mega-buckets are capped (window count ≤ 50) before pairing;
  *  - Jaccard is computed on hashed-shingle int sets, not strings.
  */
object DedupOps {

  import TextOps.wordsDuck

  // 60-bit hash from md5 hex — identical in Spark and DuckDB
  // Spark side uses graft.functions.Hash60 (same function the codegen'd
  // hash60 SQL expression wraps); numerically identical to the DuckDB
  // md5-hex form below
  private def hDuck(e: String) = s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  // K=8 universal-hash params over p = 2^31-1 (products stay < 2^62)
  private val P = 2147483647L
  private val hashParams = Seq(
    (1103515245L, 12345L), (1229782938L, 94906265L), (1664525L, 1013904223L),
    (22695477L, 1L), (134775813L, 2531011L), (214013L, 2531011L),
    (69069L, 12345L), (1566083941L, 362436069L))

  private val shinglesDuck =
    "list_transform(range(len(ws) - 2), i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])"

  // hashed shingles, one md5 per shingle
  private val hsDuck = s"list_transform(shingles, s -> ${hDuck("s")} % $P)"

  private def minhashDuck(k: Int): String = {
    val (a, b) = hashParams(k)
    s"list_aggregate(list_transform(hs, h -> ($a * h + $b) % $P), 'min')"
  }

  private val sigDuckBase =
    s"""(SELECT doc_id, hs, ${(0 until 8).map(k => s"${minhashDuck(k)} AS mh$k").mkString(", ")}
       | FROM (SELECT doc_id, $hsDuck AS hs
       |   FROM (SELECT doc_id, $shinglesDuck AS shingles
       |     FROM (SELECT doc_id, $wordsDuck AS ws FROM documents) w) s0
       |   WHERE len(shingles) > 0) s1)""".stripMargin.replace("\n", " ")

  /** LSH-verified near-duplicate pairs (a < b, Jaccard ≥ 0.2) — the shared
    * stage behind q18 (pair listing) and q32 (canonical assignment).
    * ONE tokenize+MinHash pass: the signature stage feeds four plan
    * references (band self-join l/r + set join a/b), so it is reduced to
    * its tiny projection (id + 8 minhashes + hashed-shingle set — orders of
    * magnitude smaller than the corpus) and localCheckpoint'd. Downstream
    * reads stored blocks; the corpus is decoded exactly once. */
  def lshVerifiedPairs(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val sig = sigSpark(s, d)
      .select(col("doc_id") +: array_distinct(col("hs")).as("hset") +:
        (0 until 8).map(k => col(s"mh$k")): _*)
      .localCheckpoint()
    verifyPairs(candidatePairs(cappedBands(sig)), sig)
  }

  /** The reduced SIGNATURE TABLE shape (doc_id, hset, mh0..mh7) for an
    * arbitrary docs frame — this is what a pipeline PERSISTS at ingest so
    * later batches never re-signature the corpus. */
  def signatures(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sigOf(s, docs)
      .select(col("doc_id") +: array_distinct(col("hs")).as("hset") +:
        (0 until 8).map(k => col(s"mh$k")): _*)

  /** (doc_id, band, sig2) exploded band keys, no cap applied. */
  private def bands(sig: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sig.select(col("doc_id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), concat_ws(":", col(s"mh${2 * b}"), col(s"mh${2 * b + 1}")).as("sig"))): _*)).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.sig"))

  /** Band buckets within the mega-bucket cap (≤ 50 docs): a partial/final
    * count-aggregate over just the (band, sig) keys — NOT a window over the
    * full banded rows, which would shuffle every (doc_id, band, sig) of the
    * accumulated corpus on each incremental batch. */
  private def okBuckets(b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    b.groupBy("band", "sig").agg(count(lit(1)).as("bn")).filter(col("bn") <= 50)
      .select("band", "sig")

  private def cappedBands(sig: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val b = bands(sig)
    b.join(okBuckets(b), Seq("band", "sig"))
  }

  private def candidatePairs(capped: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    capped.as("l").join(capped.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()

  private def verifyPairs(pairs: org.apache.spark.sql.DataFrame,
      sig: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sets = sig.select(col("doc_id"), col("hset"))
    pairs
      .join(sets.select(col("doc_id").as("a"), col("hset").as("ha")), Seq("a"))
      .join(sets.select(col("doc_id").as("b"), col("hset").as("hb")), Seq("b"))
      .select(col("a"), col("b"),
        (size(array_intersect(col("ha"), col("hb"))).cast("double") /
          size(array_union(col("ha"), col("hb"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
  }

  /** INCREMENTAL near-dup mining over a PERSISTED signature table (the
    * `signatures` shape, accumulated at ingest): `newIds` is the current
    * batch's doc ids. Emits exactly the verified pairs TOUCHING the batch
    * (new-old and new-new), canonicalized a < b — provably equal to
    * re-running the full batch pairing restricted to the new docs
    * (IncrementalDedupSpec), without re-signaturing or re-pairing the
    * existing corpus.
    *
    * This variant scans the WHOLE table it is given (hash-join/aggregate
    * shaped, no corpus-wide window — but O(corpus) per batch). The 100 TB
    * path is [[SigStore]] + [[incrementalVerifiedPairsStored]]: the
    * persisted band index is hash-partitioned on the band key, and a batch
    * reads only the partitions its own band keys touch — per-batch cost
    * O(batch + touched buckets), not O(corpus). */
  def incrementalVerifiedPairs(s: org.apache.spark.sql.SparkSession,
      sigTable: org.apache.spark.sql.DataFrame,
      newIds: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val all = bands(sigTable)
    val ok = okBuckets(all)
    val allOk = all.join(ok, Seq("band", "sig"))
    val newSide = allOk.join(newIds.select(col("doc_id")), Seq("doc_id"))
    verifyPairs(newOldPairs(newSide, allOk), sigTable)
  }

  private def newOldPairs(newSide: org.apache.spark.sql.DataFrame,
      allOk: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    newSide.as("l").join(allOk.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.doc_id") =!= col("r.doc_id"))
      .select(least(col("l.doc_id"), col("r.doc_id")).as("a"),
        greatest(col("l.doc_id"), col("r.doc_id")).as("b"))
      .distinct()

  /** How many band-key hash partitions the persisted band index uses. A
    * batch touches at most `4 × batch_docs` (band, sig) keys, so with the
    * corpus spread over `bandPartitions` directories a small batch prunes
    * to a small fraction of the stored index regardless of corpus size. */
  val bandPartitions = 64

  private def bandKeyCol: org.apache.spark.sql.Column =
    pmod(xxhash64(col("band"), col("sig")), lit(bandPartitions.toLong)).cast("int")

  /** Doc-key hash partitions for the verify (rows) side of the store. */
  val docPartitions = 64

  private def docKeyCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(c), lit(docPartitions.toLong)).cast("int")

  /** The PERSISTED signature store — the at-scale layout the incremental /
    * streaming dedup reads:
    *
    *   <dir>/rows/batch=N/dkey=K/   full signature rows (doc_id, hset,
    *                                mh0..mh7), hash-partitioned on doc_id —
    *                                the Jaccard-verify side
    *   <dir>/bands/batch=N/bkey=K/  the exploded band index (doc_id, band,
    *                                sig), hash-partitioned on the band key
    *
    * Each batch writes its own `batch=N` subdir (idempotent under
    * foreachBatch replay — an overwrite, never a double append). Pruning is
    * STRUCTURAL on both sides: the reader lists only the `bkey=K` / `dkey=K`
    * directories a batch touches (host-side, O(batches × touched keys)
    * driver fs listing), so the per-batch scan is O(batch + touched
    * buckets) and independent of planner partition-filter behavior. */
  final case class SigStore(dir: String) {
    import scala.jdk.CollectionConverters._

    def rowsDir: String = s"$dir/rows"
    def bandsDir: String = s"$dir/bands"

    /** Append one batch's `signatures`-shaped frame (idempotent per batchId).
      * The two sides (rows/dkey, bands/bkey) are independent dynamic-
      * partition writes whose wall is committer/small-file dominated at
      * micro-batch sizes, so they run CONCURRENTLY (guide §2.6 overlap of
      * independent jobs — distinct target dirs, so no committer staging
      * collision). */
    def append(sigs: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val rowsF = Future {
        sigs.withColumn("dkey", docKeyCol(col("doc_id")))
          .repartition(col("dkey")) // one file per dkey, parallel write (§6)
          .write.partitionBy("dkey").mode("overwrite")
          .parquet(s"$rowsDir/batch=$batchId")
      }
      // settle the background write before returning OR throwing — an
      // orphaned in-flight job racing a replayed overwrite of the same
      // batch dir is the shared-_temporary committer collision
      try bands(sigs).withColumn("bkey", bandKeyCol)
        .repartition(col("bkey"))
        .write.partitionBy("bkey").mode("overwrite")
        .parquet(s"$bandsDir/batch=$batchId")
      finally Await.ready(rowsF, Duration.Inf)
      Await.result(rowsF, Duration.Inf) // propagate a rows-side failure too
    }

    /** Full signature rows (verify side), unpruned (but live-batch-only —
      * batch-dir liveness, pruning, and the crash-safe compaction swap are
      * the shared [[BatchStore]] machinery). */
    def rows(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
      val live = BatchStore.liveBatchDirs(rowsDir)
      if (live.isEmpty) s.read.parquet(rowsDir).drop("batch", "dkey")
      else s.read.option("basePath", rowsDir).parquet(live.map(_.toString): _*)
        .drop("batch", "dkey")
    }

    /** Full band rows, live-batch-only (the compaction's bands input). */
    private def allBands(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
      val live = BatchStore.liveBatchDirs(bandsDir)
      val df = if (live.isEmpty) s.read.parquet(bandsDir)
        else s.read.option("basePath", bandsDir).parquet(live.map(_.toString): _*)
      df.select("doc_id", "band", "sig")
    }

    /** Signature rows from ONLY the doc-key partitions in `touched` —
      * the verify join's pruned input (empty set → empty frame). */
    def rowsTouching(s: org.apache.spark.sql.SparkSession,
        touched: Set[Int]): org.apache.spark.sql.DataFrame = {
      val paths = prunedDocPaths(touched)
      if (paths.isEmpty) rows(s).limit(0)
      else s.read.option("basePath", rowsDir).parquet(paths: _*).drop("batch", "dkey")
    }

    /** The `bkey=K` directories (across all batches) holding `touched`
      * band keys — exposed so tests can audit exactly what a batch reads. */
    def prunedBandPaths(touched: Set[Int]): Seq[String] =
      BatchStore.prunedPaths(bandsDir, "bkey", touched)

    /** The `dkey=K` directories holding `touched` doc keys (verify side). */
    def prunedDocPaths(touched: Set[Int]): Seq[String] =
      BatchStore.prunedPaths(rowsDir, "dkey", touched)

    /** All `bkey=K` directories currently in the store (audit helper). */
    def allBandPaths: Seq[String] =
      prunedBandPaths((0 until bandPartitions).toSet)

    /** All `dkey=K` directories currently in the store (audit helper). */
    def allDocPaths: Seq[String] =
      prunedDocPaths((0 until docPartitions).toSet)

    /** OFFLINE maintenance (stream stopped — the store analogue of
      * IceLite compaction): merge every accumulated `batch=N` subdir into
      * one consolidated batch, so the driver-side directory listing and
      * the per-partition small-file count stay bounded as batches
      * accumulate. Rewrites rows and bands into `batch=<intoBatchId>`
      * (same dkey/bkey partitioning — pruning semantics unchanged), then
      * removes the superseded batch dirs. Returns the number of batch
      * dirs collapsed.
      *
      * CRASH-SAFE swap protocol (the IceLite stage-then-atomic-rename
      * idea): the consolidated copies are staged under `.compact-<id>/`
      * carrying a `_CONSOLIDATED` marker, atomically MOVED into place
      * FIRST, and only then are the superseded `batch=` dirs deleted — a
      * crash at any point leaves the store serving the exact full data
      * set, because readers resolve each side's LIVE batch dirs
      * independently (a consolidated dir supersedes exactly the ids its
      * marker lists — so batches a resumed stream appends after the
      * compaction stay live; see [[BatchStore.liveBatchDirs]]) and a
      * re-run of compactBatches (with a higher id) sweeps any stranded
      * superseded dirs. `intoBatchId` must exceed every live batch id. `crashPoint` is a test
      * seam — called with "staged" / "moved-rows" / "moved-bands" so a
      * spec can kill the compaction inside each window. */
    def compactBatches(s: org.apache.spark.sql.SparkSession, intoBatchId: Long,
        crashPoint: String => Unit = _ => ()): Int =
      BatchStore.compact(dir, Seq(
        rowsDir -> ((stage: String) =>
          rows(s).withColumn("dkey", docKeyCol(col("doc_id")))
            .repartition(col("dkey"))
            .write.partitionBy("dkey").mode("overwrite").parquet(stage)),
        bandsDir -> ((stage: String) =>
          allBands(s).withColumn("bkey", bandKeyCol)
            .repartition(col("bkey"))
            .write.partitionBy("bkey").mode("overwrite").parquet(stage))),
        intoBatchId, crashPoint)

    /** Band rows from ONLY the touched partitions. */
    def bandsTouching(s: org.apache.spark.sql.SparkSession,
        touched: Set[Int]): org.apache.spark.sql.DataFrame = {
      val paths = prunedBandPaths(touched)
      if (paths.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("sig", org.apache.spark.sql.types.StringType))))
      else s.read.option("basePath", bandsDir).parquet(paths: _*)
        .select("doc_id", "band", "sig")
    }
  }

  /** The band-key partitions a batch's signatures touch — driver-side,
    * bounded by [[bandPartitions]] (never by batch or corpus size). */
  def incrementalTouchedKeys(s: org.apache.spark.sql.SparkSession,
      newSigs: org.apache.spark.sql.DataFrame): Set[Int] =
    bands(newSigs).select(bandKeyCol.as("bkey"))
      .distinct().collect().map(_.getInt(0)).toSet

  /** [[incrementalVerifiedPairs]] over a [[SigStore]], reading ONLY the
    * partitions the batch touches on BOTH sides. Contract: `newSigs` (the
    * batch's `signatures` frame) is already appended to the store.
    *
    *  - Candidate pairing reads only the band partitions the batch's own
    *    band keys hash into; mega-bucket counts over that pruned read are
    *    exact for every touched (band, sig) key (a hash partition holds ALL
    *    rows of each key it holds).
    *  - The Jaccard verify reads only the doc-key partitions holding the
    *    candidate pairs' doc ids: the tiny pair set is localCheckpoint'd
    *    (it feeds two joins anyway) and its distinct doc keys — bounded by
    *    [[docPartitions]] — are collected driver-side.
    * Both key sets are bounded by the partition-layout constants, never by
    * batch or corpus size. */
  def incrementalVerifiedPairsStored(s: org.apache.spark.sql.SparkSession,
      store: SigStore,
      newSigs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val touched = incrementalTouchedKeys(s, newSigs)
    val all = store.bandsTouching(s, touched)
    val ok = okBuckets(all)
    val allOk = all.join(ok, Seq("band", "sig"))
    val newSide = allOk.join(newSigs.select(col("doc_id")), Seq("doc_id"))
    val pairs = newOldPairs(newSide, allOk).localCheckpoint()
    val docKeys = pairs
      .select(explode(array(col("a"), col("b"))).as("id"))
      .select(docKeyCol(col("id")).as("dk")).distinct()
      .collect().map(_.getInt(0)).toSet
    verifyPairs(pairs, store.rowsTouching(s, docKeys))
  }

  /** The DuckDB CTE chain producing `vpairs` (a, b, jaccard) — shared by
    * q18's and q32's oracles so both gates derive pairs identically. */
  private[operators] val pairsDuckCtes: String =
    s"""sig AS ${sigDuckBase.trim},
       |banded AS (
       |  SELECT doc_id, unnest([0,1,2,3]) AS band,
       |    unnest([mh0 || ':' || mh1, mh2 || ':' || mh3, mh4 || ':' || mh5, mh6 || ':' || mh7]) AS sig2
       |  FROM sig),
       |capped AS (
       |  SELECT * FROM (SELECT doc_id, band, sig2,
       |    count(*) OVER (PARTITION BY band, sig2) AS bn FROM banded) c WHERE bn <= 50),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM capped l JOIN capped r
       |    ON l.band = r.band AND l.sig2 = r.sig2 AND l.doc_id < r.doc_id),
       |sets AS (SELECT doc_id, list_distinct(hs) AS hset FROM sig),
       |vpairs AS (
       |  SELECT a, b, jaccard FROM (
       |    SELECT a, b,
       |      CAST(len(list_filter(sa.hset, x -> list_contains(sb.hset, x))) AS DOUBLE) /
       |      CAST(len(list_distinct(sa.hset || sb.hset)) AS DOUBLE) AS jaccard
       |    FROM pairs JOIN sets sa ON pairs.a = sa.doc_id JOIN sets sb ON pairs.b = sb.doc_id) j
       |  WHERE jaccard >= 0.2)""".stripMargin.replace("\n", " ")

  /** one row of the MinHash signature table. */
  final case class SigRow(doc_id: Long, hs: Seq[Long],
      mh0: Long, mh1: Long, mh2: Long, mh3: Long,
      mh4: Long, mh5: Long, mh6: Long, mh7: Long)

  /** one row of the SimHash table (q19). */
  final case class SimRow(doc_id: Long, simhash: Long, bucket: Long)

  /** Single-pass signatures via typed mapPartitions: one tokenize + one md5
    * per shingle + all 8 affine minhashes in the same loop. (The
    * expression-chain formulation recomputed the whole chain per minhash
    * column — CollapseProject inlining with no codegen CSE for HOFs.)
    * Values are identical to the DuckDB oracle formulation. */
  private def sigSpark(s: org.apache.spark.sql.SparkSession, d: String) =
    sigOf(s, ld(s, d, "documents"))

  private def sigOf(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame) = {
    import s.implicits._
    val params = hashParams.toArray
    val p = P
    docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions { it =>
        val re = java.util.regex.Pattern.compile("[a-z0-9]+")
        it.flatMap { case (id, text) =>
          val m = re.matcher(text.toLowerCase(java.util.Locale.ROOT))
          val ws = scala.collection.mutable.ArrayBuffer.empty[String]
          while (m.find()) ws += m.group()
          if (ws.length < 3) None
          else {
            val hs = new Array[Long](ws.length - 2)
            val mh = Array.fill(8)(Long.MaxValue)
            var i = 0
            while (i < hs.length) {
              val h = graft.functions.Hash60.hash(
                org.apache.spark.unsafe.types.UTF8String.fromString(
                  ws(i) + " " + ws(i + 1) + " " + ws(i + 2))) % p
              hs(i) = h
              var k = 0
              while (k < 8) {
                val v = (params(k)._1 * h + params(k)._2) % p
                if (v < mh(k)) mh(k) = v
                k += 1
              }
              i += 1
            }
            Some(SigRow(id, hs.toSeq, mh(0), mh(1), mh(2), mh(3), mh(4), mh(5), mh(6), mh(7)))
          }
        }
      }.toDF()
  }

  /** Connected components over an undirected edge list (a, b) by iterative
    * min-label propagation: label(x) ← min(label(x), min over neighbors) —
    * the standard distributed CC (GraphFrames' default), converging in
    * O(component diameter) rounds. Near-dup components are shallow chains
    * (diameter ≤ a few hops), so the cap is generous; hitting it throws
    * LOUDLY rather than returning a half-merged labeling. Each round is one
    * small equi-join + min-agg over the PAIR set (≪ corpus at any scale);
    * labels are localCheckpoint'd per round so the plan doesn't grow.
    * For adversarial long-chain graphs use [[connectedComponentsFast]] —
    * pointer doubling, O(log diameter) rounds, one extra tiny join per
    * round (kept separate because shallow near-dup graphs converge in a
    * couple of rounds either way and this variant does less work each). */
  def connectedComponents(edges: org.apache.spark.sql.DataFrame,
      maxIters: Int = 30): org.apache.spark.sql.DataFrame = {
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct().localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      val viaNeighbor = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      val next = labels.unionByName(viaNeighbor)
        .groupBy("id").agg(min(col("label")).as("label"))
        .localCheckpoint()
      changed = next.as("n").join(labels.as("o"), Seq("id"))
        .filter(col("n.label") =!= col("o.label")).count()
      labels = next
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIters rounds")
    labels
  }

  /** POINTER-DOUBLING connected components — the adversarial-long-chain
    * path [[connectedComponents]]'s docstring promises: each round does the
    * same min-label propagation over the pair set AND a label JUMP
    * (label ← label(label)), which halves the remaining distance to the
    * component minimum — O(log diameter) rounds instead of O(diameter).
    * The jump is one extra small equi-join over the labels frame (labels
    * are always node ids, so the self-join always hits). Per-round cost
    * stays two tiny equi-joins + a min-agg over the PAIR set — ≪ corpus at
    * any scale; labels localCheckpoint per round so the plan stays flat.
    * Property-tested ≡ [[connectedComponents]] on random graphs, and
    * converges on a 4096-node path inside ~log₂ rounds where min-label
    * alone would need 4096. */
  def connectedComponentsFast(edges: org.apache.spark.sql.DataFrame,
      maxIters: Int = 40): org.apache.spark.sql.DataFrame = {
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct().localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      val viaNeighbor = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      // checkpoint before the self-join: the jump joins the frame with
      // itself, and distinct attribute ids need a materialized base
      val minned = labels.unionByName(viaNeighbor)
        .groupBy("id").agg(min(col("label")).as("label"))
        .localCheckpoint()
      // pointer jump: follow the label's own label one step
      val next = minned.as("x").join(minned.as("y"), col("x.label") === col("y.id"))
        .select(col("x.id").as("id"), col("y.label").as("label"))
      changed = next.as("n").join(labels.as("o"), Seq("id"))
        .filter(col("n.label") =!= col("o.label")).count()
      labels = next
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponentsFast: not converged after $maxIters rounds")
    labels
  }

  /** one row of the 60-bit SimHash table (q121). */
  final case class Sim60Row(doc_id: Long, sim60: Long)

  /** 60-bit SimHash over the word multiset — the wide variant of q19's
    * 16-bit fingerprint, sized so Hamming distance separates near-dups from
    * background (measured on this corpus: true near-dup pairs at dist 0–5,
    * random pairs at 9+ with 1st percentile = 9). Same single typed pass as
    * q19: one tokenize + one hash60 per word, all 60 bit-votes accumulated
    * in the loop; tie votes (sum 0) leave the bit clear, the rule the
    * DuckDB oracle reproduces. */
  def simhash60(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    docs.select("doc_id", "text").as[(Long, String)].mapPartitions { it =>
      val re = java.util.regex.Pattern.compile("[a-z0-9]+")
      it.flatMap { case (id, text) =>
        val m = re.matcher(text.toLowerCase(java.util.Locale.ROOT))
        val votes = new Array[Int](60)
        var n = 0
        while (m.find()) {
          val h = graft.functions.Hash60.hash(
            org.apache.spark.unsafe.types.UTF8String.fromString(m.group()))
          var b = 0
          while (b < 60) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
          n += 1
        }
        if (n == 0) None
        else {
          var sim = 0L
          var b = 0
          while (b < 60) { if (votes(b) > 0) sim |= 1L << b; b += 1 }
          Some(Sim60Row(id, sim))
        }
      }
    }.toDF()
  }

  /** SimHash near-duplicate PAIRS at scale via pigeonhole blocking (the
    * Manku/Jain/Sarma WWW'07 web-crawl dedup shape): split the 60-bit
    * fingerprint into `60/blockBits` contiguous blocks — any pair within
    * Hamming distance `maxHamming < blocks` must agree exactly on at least
    * one block (pigeonhole), so an equi-join on (block-index, block-value)
    * finds EVERY qualifying pair, and an exact bit_count verify drops the
    * false candidates. Cost shape for 100 TB: one row per document ×
    * `blocks` tiny (id, block) rows equi-joined on a 2^blockBits-value key
    * per block index — never all-pairs; candidate-list skew is bounded by
    * true duplicate clusters, not corpus size. The signature table is a
    * narrow projection (16 bytes/doc), localCheckpoint'd because it feeds
    * four plan references (both join sides + both verify lookups). */
  def simhashHammingPairs(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      maxHamming: Int = 5, blockBits: Int = 10): org.apache.spark.sql.DataFrame = {
    require(60 % blockBits == 0, s"blockBits=$blockBits must divide 60")
    val blocks = 60 / blockBits
    require(maxHamming < blocks,
      s"pigeonhole completeness needs maxHamming ($maxHamming) < blocks ($blocks)")
    val mask = (1L << blockBits) - 1
    val sigs = simhash60(s, docs).localCheckpoint()
    val exploded = sigs.select(col("doc_id"), explode(array(
        (0 until blocks).map(i => struct(lit(i).as("bi"),
          expr(s"(sim60 >> ${i * blockBits}) & $mask").as("bv"))): _*)).as("blk"))
      .select(col("doc_id"), col("blk.bi").as("bi"), col("blk.bv").as("bv"))
    val cands = exploded.as("l").join(exploded.as("r"),
        col("l.bi") === col("r.bi") && col("l.bv") === col("r.bv") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct()
    cands
      .join(sigs.select(col("doc_id").as("a"), col("sim60").as("sa")), Seq("a"))
      .join(sigs.select(col("doc_id").as("b"), col("sim60").as("sb")), Seq("b"))
      .withColumn("dist", expr("bit_count(sa ^ sb)"))
      .filter(col("dist") <= maxHamming)
      .select("a", "b", "dist")
  }

  val queries: Seq[OpQuery] = Seq(

    OpQuery("q35_dedup_components",
      // the TRANSITIVE dedup decision: a document's group is the connected
      // component of the LSH-verified near-dup graph it belongs to,
      // canonicalized to the component's smallest doc_id (q32 is the
      // one-hop keep-first variant; chains A~B~C where A,C never pair
      // directly collapse only here). Oracle: recursive-CTE reachability
      // closure over the same verified pairs.
      (s, d) => {
        val comp = connectedComponents(lshVerifiedPairs(s, d).select("a", "b"))
        ld(s, d, "documents").select("doc_id")
          .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("label"), col("doc_id")).as("component"),
            col("label").isNotNull.as("is_dup"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $pairsDuckCtes,
        edges AS (SELECT a AS src, b AS dst FROM vpairs
                  UNION SELECT b, a FROM vpairs),
        reach(id, r) AS (
          SELECT src, src FROM edges
          UNION
          SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
        comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id)
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
               (c.component IS NOT NULL) AS is_dup
        FROM documents d LEFT JOIN comp c USING (doc_id) ORDER BY d.doc_id""")),

    OpQuery("q12_exact_dedup",
      (s, d) => {
        ld(s, d, "documents")
          .groupBy(sha2(col("text").cast("binary"), 256).as("content_hash"))
          .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
          .orderBy("canonical_id")
      },
      Some("""SELECT sha256(text) AS content_hash, min(doc_id) AS canonical_id,
        count(*) AS n_copies FROM documents GROUP BY sha256(text)
        ORDER BY canonical_id""")),

    OpQuery("q17_minhash_sig",
      (s, d) => sigSpark(s, d)
        .select((col("doc_id") +: (0 until 8).map(k => col(s"mh$k"))): _*)
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, ${(0 until 8).map(k => s"mh$k").mkString(", ")}
        FROM $sigDuckBase sig ORDER BY doc_id""")),

    OpQuery("q18_lsh_candidate_pairs",
      // 4 bands × 2 rows → candidates share a band; mega-buckets (>50 docs)
      // dropped; Jaccard verified on hashed-shingle int sets, threshold 0.2
      (s, d) => lshVerifiedPairs(s, d).orderBy("a", "b"),
      Some(s"""WITH $pairsDuckCtes
        SELECT a, b, jaccard FROM vpairs ORDER BY a, b""")),

    OpQuery("q40_dedup_stream",
      // STREAMING under the hard gate: the documents corpus arrives in 4
      // waves through DedupStream (Structured Streaming file source →
      // foreachBatch incremental mining over the band-partitioned
      // SigStore; one long-lived query drains the waves, with one
      // mid-stream stop + checkpoint resume for the recovery evidence);
      // the union of per-batch emissions must equal the BATCH pairing —
      // the same vpairs oracle q18 is gated on. (No band bucket in this
      // corpus nears the 50-doc cap, so the documented cap-crossing
      // divergence cannot trigger; verified max bucket = 3 at sf0.01.)
      (s, d) => {
        val root = s"${System.getProperty("java.io.tmpdir")}/graft-q40"
        graft.streaming.DedupStream
          .mineCorpusInChunks(s, ld(s, d, "documents"), root, chunks = 4)
          .orderBy("a", "b")
      },
      Some(s"""WITH $pairsDuckCtes
        SELECT a, b, jaccard FROM vpairs ORDER BY a, b""")),

    OpQuery("q32_dedup_canonical",
      // the dedup DECISION the pipeline acts on: every document maps to a
      // canonical id — the smallest directly-linked near-duplicate partner
      // from the LSH-verified pairs (keep-first policy), or itself. One-hop
      // by design (a distributed connected-components pass is the
      // transitive extension; one-hop is what keep-first dedup over
      // pair output does in one round).
      (s, d) => {
        val m = lshVerifiedPairs(s, d).groupBy(col("b").as("doc_id"))
          .agg(min(col("a")).as("canon"))
        ld(s, d, "documents").select("doc_id")
          .join(m, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("canon"), col("doc_id")).as("canonical"),
            col("canon").isNotNull.as("is_dup"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $pairsDuckCtes,
        m AS (SELECT b AS doc_id, min(a) AS canon FROM vpairs GROUP BY b)
        SELECT d.doc_id, coalesce(m.canon, d.doc_id) AS canonical,
               (m.canon IS NOT NULL) AS is_dup
        FROM documents d LEFT JOIN m USING (doc_id) ORDER BY d.doc_id""")),

    OpQuery("q19_simhash",
      // 16-bit SimHash over the word multiset: one md5 per word, bit b set
      // iff the sum of ±1 votes (bit b of each word hash) is positive.
      // Single typed pass (the q17 sigSpark pattern): one tokenize + one
      // hash per word, all 16 bit-votes accumulated in the same loop — no
      // cache barrier, no 16× HOF recompute. Tokenizer and hash are the
      // shared wordsSpark / hash60 definitions, so values are identical to
      // the DuckDB oracle formulation below.
      (s, d) => {
        import s.implicits._
        ld(s, d, "documents").select("doc_id", "text").as[(Long, String)]
          .mapPartitions { it =>
            val re = java.util.regex.Pattern.compile("[a-z0-9]+")
            it.flatMap { case (id, text) =>
              val m = re.matcher(text.toLowerCase(java.util.Locale.ROOT))
              val votes = new Array[Int](16)
              var n = 0
              while (m.find()) {
                val h = graft.functions.Hash60.hash(
                  org.apache.spark.unsafe.types.UTF8String.fromString(m.group()))
                var b = 0
                while (b < 16) {
                  if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
                  b += 1
                }
                n += 1
              }
              if (n == 0) None
              else {
                var sim = 0L
                var b = 0
                while (b < 16) { if (votes(b) > 0) sim |= 1L << b; b += 1 }
                Some(SimRow(id, sim, sim / 256))
              }
            }
          }.toDF().orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, simhash, simhash // 256 AS bucket FROM (
        SELECT doc_id, CAST(${(0 until 16).map(b =>
          s"(CASE WHEN list_sum(list_transform(hw, h -> CASE WHEN (h >> $b) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END) * ${1 << b}").mkString(" + ")} AS BIGINT) AS simhash
        FROM (SELECT doc_id, list_transform(ws, w -> ${hDuck("w")}) AS hw
          FROM (SELECT doc_id, $wordsDuck AS ws FROM documents) t WHERE len(ws) > 0) h) q
        ORDER BY doc_id""")),

    OpQuery("q121_simhash_hamming_pairs",
      // near-dup PAIR MINING on the 60-bit SimHash: pigeonhole-blocked
      // equi-join (6 blocks × 10 bits guarantees completeness for Hamming
      // ≤ 5) + exact bit_count verify. The oracle is the brute-force
      // all-pairs filter over the same 60-bit fingerprints — tractable at
      // oracle scale, which is exactly what the blocking avoids at real
      // scale; equality proves the blocked join found every pair.
      (s, d) => simhashHammingPairs(s, ld(s, d, "documents")).orderBy("a", "b"),
      Some {
        val sim60Terms = (0 until 60).map(b =>
          s"(CASE WHEN list_sum(list_transform(hw, h -> CASE WHEN (h >> $b) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END) * ${1L << b}")
          .mkString(" + ")
        s"""WITH sim AS (
          SELECT doc_id, CAST($sim60Terms AS BIGINT) AS sim60
          FROM (SELECT doc_id, list_transform(ws, w -> ${hDuck("w")}) AS hw
            FROM (SELECT doc_id, $wordsDuck AS ws FROM documents) t WHERE len(ws) > 0) h)
        SELECT a.doc_id AS a, b.doc_id AS b,
               CAST(bit_count(xor(a.sim60, b.sim60)) AS INTEGER) AS dist
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sim60, b.sim60)) <= 5
        ORDER BY a, b"""
      })
  )
}
