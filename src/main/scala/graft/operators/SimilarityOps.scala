package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables.ld

/** Similarity search over the embeddings table (Array[Float], 64-dim):
  * brute-force cosine top-k baseline and an LSH-bucketed variant (random
  * hyperplanes) as the scale path, plus cosine near-duplicate pairs.
  *
  * Determinism: float elements are cast to double FIRST, then dot/norm are
  * sequential left folds over the list — bit-identical in Spark
  * (`aggregate`) and DuckDB (`list_reduce`).
  */
object SimilarityOps {

  // Spark: double-cast, sequential fold
  private[operators] val sparkCos =
    """aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)
      | / (sqrt(aggregate(va, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
      |    * sqrt(aggregate(vb, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))""".stripMargin.replace("\n", " ")

  private[operators] val duckCos =
    """list_reduce(list_transform(list_zip(va, vb), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a, b) -> a + b)
      | / (sqrt(list_reduce(list_transform(va, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (a, b) -> a + b))
      |    * sqrt(list_reduce(list_transform(vb, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (a, b) -> a + b)))""".stripMargin.replace("\n", " ")

  // LSH hyperplanes: sign pattern r(p, d) = ±1 derived from md5(p:d) parity.
  // The Spark side tabulates the matrix once (signMatrix/projSig below); the
  // oracle derives the same signs per element — identical deterministic
  // pseudo-randomness, identical fold order.
  private def signDuck(p: Int) =
    s"""list_reduce(list_transform(list_zip(embedding, range(0, 64)), q ->
       | CAST(q[1] AS DOUBLE) * (CAST('0x' || substr(md5('$p:' || q[2]), 1, 15) AS BIGINT) % 2 * 2 - 1)),
       | (a, b) -> a + b)""".stripMargin.replace("\n", " ")

  /** The ±1 hyperplane matrix r(p, i) = hash60("p:i") % 2 * 2 - 1 —
    * tabulated ONCE on the driver; identical to the md5-derived signs the
    * DuckDB oracle uses (and to the per-element HOF form, since the fold
    * below visits elements in the same order with the same double math). */
  private def signMatrix(planes: Int): Array[Array[Double]] =
    Array.tabulate(planes, 64) { (p, i) =>
      (graft.functions.Hash60.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"$p:$i")) % 2 * 2 - 1).toDouble
    }

  /** Projection signature: bit p set iff the sequential left fold of
    * emb·signs(p) is > 0 — bit-identical to the HOF `aggregate` form. */
  private def projSig(signs: Array[Array[Double]], emb: Seq[Float]): Long = {
    var sig = 0L
    var p = 0
    while (p < signs.length) {
      var acc = 0.0
      var i = 0
      val row = signs(p)
      while (i < 64) { acc += emb(i).toDouble * row(i); i += 1 }
      if (acc > 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  /** Embeddings with their 8-bit LSH bucket in ONE typed pass over the
    * corpus with the precomputed sign matrix. The previous HOF expression
    * form was evaluated TWICE per row (once in the join's isnotnull Filter,
    * once in the Project) and re-derived every ±1 sign with a per-element
    * hash60(concat(...)) — 2×8×64 hashes per vector; here the matrix is
    * tabulated once and each vector is projected once. */
  private def bucketed8(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val signs = signMatrix(8)
    ld(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions(it => it.map { case (id, emb) => (id, emb, projSig(signs, emb)) })
      .toDF("vec_id", "embedding", "bucket")
  }

  /** q20 impl: near-duplicate pairs by cosine ≥ 0.35 within label blocks,
    * memory-bounded at any block size. Two tiers:
    *  - labels with ≤ `blockCap` vectors: typed flatMapGroups pairs the
    *    block in one tight loop, EXACT (the common case — both testdata SFs
    *    top out at a few hundred vectors per label);
    *  - hotter labels: an LSH BAND PREFILTER (hyperplane signature banded
    *    per [[BandDefaults]] — 96 bands × 8 bits, ≥2 collisions, TUNED for
    *    this corpus's cos 0.35–0.55 natural-pair regime; measured recall
    *    0.6+ at ≲15% candidate fraction, see BENCH ann_recall and the
    *    AnnEval sweep) narrows the label-keyed self-join to band-colliding
    *    pairs, then the exact cosine verifies — banded output is always a
    *    SUBSET of the exact tier's, carrying bit-identical cosines.
    *    `bandPrefilter` defaults FALSE so the function is exact by default
    *    (the spill-aware SMJ hot tier streams, doesn't OOM, O(n²)
    *    comparisons) and matches its exact oracle at any corpus size;
    *    enable banding explicitly at the 100 TB scale point.
    * All tiers do the identical double math (sequential left fold, same
    * element order as the DuckDB oracle's list_reduce) so any pair they
    * emit is bit-identical whichever tier found it. */
  def neardupPairs(s: org.apache.spark.sql.SparkSession, d: String,
      blockCap: Int = 4096, bandPrefilter: Boolean = false,
      bands: Int = BandDefaults._1, bits: Int = BandDefaults._2,
      minCollide: Int = BandDefaults._3): org.apache.spark.sql.DataFrame =
    neardupPairsOf(s, ld(s, d, "embeddings").select(col("label"), col("vec_id"), col("embedding")),
      blockCap, bandPrefilter, bands, bits, minCollide)

  /** Per-band keys of a (bands × bits)-plane hyperplane signature: plane
    * p's sign bit lands in band p/bits, bit p%bits. One tight loop, same
    * double fold order as [[projSig]]. */
  private def bandKeys(signs: Array[Array[Double]], emb: Seq[Float],
      bands: Int, bits: Int): Array[Long] = {
    val out = new Array[Long](bands)
    val planes = bands * bits
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var i = 0
      val row = signs(p)
      while (i < 64) { acc += emb(i).toDouble * row(i); i += 1 }
      if (acc > 0) out(p / bits) |= 1L << (p % bits)
      p += 1
    }
    out
  }

  /** The shared deterministic cosine SQL (Spark `aggregate` fold over
    * columns `va`/`vb`) — exposed for the embedding-store miners. */
  private[operators] def sparkCosSql: String = sparkCos

  /** The DuckDB twin of [[sparkCosSql]] (list_reduce fold over `va`/`vb`) —
    * exposed so other modules' oracles share the one cosine definition. */
  private[operators] def duckCosSql: String = duckCos

  /** Embeddings frame + a `bands` column: the vector's [[BandDefaults]]
    * band keys, ONE typed pass — what [[graft.operators.EmbDedup.EmbStore]]
    * persists at append so later batches never re-signature the corpus. */
  def withBandKeys(s: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val (bands, bits, _) = BandDefaults
    val signs = signMatrix(bands * bits)
    // same serial-scan guard as bandedCandidates: the 768-plane projection
    // pass must not run on one partition just because the input is one file
    val e0 = e.select(col("label"), col("vec_id"), col("embedding"))
    val ein =
      if (e0.rdd.getNumPartitions < s.sparkContext.defaultParallelism)
        e0.repartition(s.sparkContext.defaultParallelism)
      else e0
    ein
      .as[(Int, Long, Seq[Float])]
      .mapPartitions(it => it.map { case (lbl, id, emb) =>
        (lbl, id, emb, bandKeys(signs, emb, bands, bits).toSeq)
      }).toDF("label", "vec_id", "embedding", "bands")
  }

  /** The banded tier's TUNED default configuration — matched to the
    * similarity regime this corpus actually exhibits (natural near-dup
    * pairs at cos 0.35–0.55 over a within-label background ~N(0, 0.126);
    * measured via graft.AnnEval's band sweep).
    *
    * Why r-of-B banding (require ≥ `minCollide` band collisions) instead
    * of classic OR-banding: at a LOW similarity threshold the per-bit
    * agreement gap between a true pair (p≈0.61 at cos 0.35) and background
    * (p=0.5) is thin — OR-banding configs that reach recall ≥ 0.6 here all
    * pull ≥ 20% of the background in. Counting collisions sharpens the
    * S-curve (a binomial tail test uses more of the signature's
    * information), cutting the background fraction ~2-3× at equal recall.
    * The collision count is a partial/final aggregate over the band
    * equi-join — still never a cross join.
    *
    * Honest scale math: at target cos ≈ 0.35, ρ = ln p(0.35)/ln p(0) ≈ 0.70,
    * so ANY hyperplane-LSH config meeting recall 0.6 costs Θ(pairs ×
    * B·2^-bits) expected join rows (~0.4/pair here) — the tier buys ~8×
    * verification-flop reduction plus DISTRIBUTED, spillable bucket tasks,
    * not a sub-linear miracle; it grows decisive as the threshold rises
    * (ρ = 0.35 at cos 0.7, where the old 8×8 default came from). */
  val BandDefaults: (Int, Int, Int) = (96, 8, 2) // (bands, bits, minCollide)

  /** Banded candidate pairs within a label: pairs whose (bands × bits)-bit
    * hyperplane signatures agree on ≥ `minCollide` bands. One typed
    * signature pass, an equi-join on (label, band, bandKey), then a
    * collision-count aggregate (distinct when minCollide ≤ 1). */
  def bandedCandidates(s: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame,
      bands: Int = BandDefaults._1, bits: Int = BandDefaults._2,
      minCollide: Int = BandDefaults._3): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val signs = signMatrix(bands * bits)
    val nb = bands; val b2 = bits
    // the signature pass is compute-heavy (bands × bits plane projections
    // per vector); a single-file input scans as ONE partition and would run
    // it serially — spread it when the scan parallelism is below the
    // cluster's (no-op at scale, where the input already has ≥ cores
    // partitions; per-row math, so results are placement-independent)
    val e0 = e.select(col("label"), col("vec_id"), col("embedding"))
    val ein =
      if (e0.rdd.getNumPartitions < s.sparkContext.defaultParallelism)
        e0.repartition(s.sparkContext.defaultParallelism)
      else e0
    val sigs = ein
      .as[(Int, Long, Seq[Float])]
      .mapPartitions(it => it.flatMap { case (lbl, id, emb) =>
        val keys = bandKeys(signs, emb, nb, b2)
        (0 until nb).iterator.map(b => (lbl, id, b, keys(b)))
      }).toDF("label", "vec_id", "band", "bkey")
    val joined = sigs.select(col("label"), col("vec_id").as("a"), col("band"), col("bkey"))
      .join(sigs.select(col("label"), col("vec_id").as("b"), col("band"), col("bkey")),
        Seq("label", "band", "bkey"))
      .filter(col("a") < col("b"))
    if (minCollide <= 1) joined.select("label", "a", "b").distinct()
    else joined.groupBy("label", "a", "b").agg(count(lit(1)).as("__nc"))
      .filter(col("__nc") >= minCollide).select("label", "a", "b")
  }

  def neardupPairsOf(s: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame,
      blockCap: Int = 4096, bandPrefilter: Boolean = false,
      bands: Int = BandDefaults._1, bits: Int = BandDefaults._2,
      minCollide: Int = BandDefaults._3): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val counts = e.groupBy("label").agg(count(lit(1)).as("__n")) // tiny: one row per label
    val tagged = e.join(broadcast(counts), Seq("label"))
    val small = tagged.filter(col("__n") <= blockCap)
      .select(col("label"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Seq[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val vs = it.map { case (_, id, emb) => (id, emb.toArray) }.toArray.sortBy(_._1)
        val norms = vs.map { case (_, a) =>
          var n = 0.0; var i = 0
          while (i < a.length) { n += a(i).toDouble * a(i).toDouble; i += 1 }
          math.sqrt(n)
        }
        for {
          i <- vs.indices.iterator
          j <- (i + 1) until vs.length
          dot = {
            val x = vs(i)._2; val y = vs(j)._2
            var acc = 0.0; var k = 0
            while (k < x.length) { acc += x(k).toDouble * y(k).toDouble; k += 1 }
            acc
          }
          cos = dot / (norms(i) * norms(j))
          if cos >= 0.35
        } yield (vs(i)._1, vs(j)._1, cos)
      }
      .toDF("a", "b", "cos")
    val big = tagged.filter(col("__n") > blockCap)
    val bigPairs =
      if (bandPrefilter) {
        // hot tier: banded candidates, then exact cosine on the shortlist —
        // the candidate fraction and recall of the configured banding are
        // measured in Bench's ann_recall block / the AnnEval sweep
        val cand = bandedCandidates(s, big.select("label", "vec_id", "embedding"),
          bands, bits, minCollide)
        // NOT isnan: a zero-norm embedding gives cos = 0/0 = NaN, which
        // Spark's comparison semantics treat as LARGER than any number —
        // the SQL tier would emit the pair while the typed small tier's
        // Java `NaN >= tau` drops it, making results depend on block size
        cand
          .join(big.select(col("label"), col("vec_id").as("a"), col("embedding").as("va")), Seq("label", "a"))
          .join(big.select(col("label"), col("vec_id").as("b"), col("embedding").as("vb")), Seq("label", "b"))
          .select(col("a"), col("b"), expr(sparkCos).as("cos"))
          .filter(col("cos") >= 0.35 && !isnan(col("cos")))
      } else {
        // exact hot tier: label-keyed SMJ self-join; the buffered side
        // spills (no unbounded group materialization), O(n²) comparisons
        big.select(col("label"), col("vec_id").as("a"), col("embedding").as("va"))
          .join(big.select(col("label"), col("vec_id").as("b"), col("embedding").as("vb")), Seq("label"))
          .filter(col("a") < col("b"))
          .select(col("a"), col("b"), expr(sparkCos).as("cos"))
          .filter(col("cos") >= 0.35 && !isnan(col("cos")))
      }
    small.unionByName(bigPairs).orderBy("a", "b")
  }

  /** q27 impl — 64-bit-signature Hamming prefilter + exact cosine re-rank,
    * the measured-better ANN scale path on weak-signal embeddings (recall@10
    * 0.56 at a 10% re-rank fraction vs 0.10 for bucket probing).
    *
    * Execution shape for 10^9 vectors: query signatures BROADCAST, one typed
    * pass over the corpus keeps a bounded per-(partition, query) heap of the
    * best (hamming, cand) pairs — no query×corpus row explosion, no wide
    * shuffle. Per-partition heap memory is O(queries × M), so the query set
    * is processed in CHUNKS of `chunkSize`: memory stays O(chunkSize × M)
    * per partition at any query count, at the cost of one corpus pass per
    * chunk (Q=100, chunk=64 → 2 passes). Exactness of the prefilter: the
    * global top-M by the total order (hd, cand) is the union of
    * per-partition top-Ms, so the shortlist is identical to the windowed
    * formulation the DuckDB oracle uses. */
  def sigRerankTopK(s: org.apache.spark.sql.SparkSession, d: String,
      numQueries: Int, M: Int = 200, k: Int = 10,
      chunkSize: Int = 64): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val signs = signMatrix(64)
    val e = ld(s, d, "embeddings")
    val typed = e.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
    val qsigs = typed.filter(_._1 < numQueries).collect()
      .map { case (id, emb) => (id, projSig(signs, emb)) }
    require(qsigs.nonEmpty, // same guard as the sq8/pq siblings — an empty
      // query set would hit reduce on an empty iterator below
      s"no corpus vectors with vec_id < $numQueries — nothing to query")
    val ord = Ordering.Tuple2[Int, Long]
    val short = qsigs.grouped(chunkSize).map { qchunk =>
      val bq = s.sparkContext.broadcast(qchunk)
      typed.mapPartitions { it =>
        val qs = bq.value
        // max-heaps by (hd, cand): head = current worst of the best M
        val heaps = qs.map { case (qid, _) =>
          qid -> new scala.collection.mutable.PriorityQueue[(Int, Long)]()(ord) }.toMap
        it.foreach { case (cand, emb) =>
          val sig = projSig(signs, emb)
          qs.foreach { case (qid, qsig) =>
            if (cand != qid) {
              val hd = java.lang.Long.bitCount(sig ^ qsig)
              val h = heaps(qid)
              if (h.size < M) h.enqueue((hd, cand))
              else if (ord.lt((hd, cand), h.head)) { h.dequeue(); h.enqueue((hd, cand)) }
            }
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (hd, cand) => (qid, cand, hd) } }
      }.toDF("qid", "cand", "hd")
    }.reduce(_.unionByName(_))
    // global exact top-M over the tiny per-partition union
    val wh = Window.partitionBy("qid").orderBy(col("hd").asc, col("cand").asc)
    val shortlist = short.withColumn("hr", row_number().over(wh)).filter(col("hr") <= M)
    // re-rank: broadcast the shortlist back against the corpus for the
    // candidate vectors; query vectors are numQueries rows (also broadcast)
    val qv = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("va"))
    val wc = Window.partitionBy("qid").orderBy(desc("cos"), col("cand"))
    e.select(col("vec_id").as("cand"), col("embedding").as("vb"))
      .join(broadcast(shortlist.select("qid", "cand")), Seq("cand"))
      .join(broadcast(qv), Seq("qid"))
      .withColumn("cos", expr(sparkCos))
      .withColumn("rank", row_number().over(wc).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cand", "cos")
      .orderBy("qid", "rank")
  }

  /** q36 impl — IVF ANN with a TRAINED coarse quantizer and a cell-
    * partitioned store: k-means centroids (driver-side Lloyd over a seeded
    * sample) partition the corpus into cells; each query probes its
    * `nprobe` best cells; exact cosine top-k within the probed candidates.
    * Unlike hyperplane LSH (q22/q26), cells ADAPT to the data distribution
    * — the standard IVF trade.
    *
    * Execution shape at 10^9 vectors: centroids broadcast, ONE typed
    * assignment pass over the corpus (K dot products/row, same double fold
    * order as the oracle), the corpus written partitioned by cell
    * ([[buildIvfIndex]], a one-off maintenance pass), and probing reads
    * ONLY the probed cells' files ([[IvfIndex.candidates]] — structural
    * path pruning, audited in IvfIndexSpec). */
  /** THE single nearest-cells implementation shared by the executor-side
    * cell assignment (take = 1) and the driver-side query probes — one
    * argmax/tie-break definition, so the two sides (and the oracle's
    * `ORDER BY ccos DESC, cid`) can never diverge. Requires `cents` sorted
    * ascending by cid; ties break to the smallest cid (strict `>` keeps
    * the first maximum). Tight loops, no per-row sort allocation. */
  private[operators] object IvfCells extends Serializable {
    def nearestCells(cents: Array[(Long, Array[Double], Double)],
        emb: Seq[Float], take: Int): Seq[Long] = {
      var n = 0.0; var i = 0
      while (i < emb.length) { n += emb(i).toDouble * emb(i).toDouble; i += 1 }
      val nv = math.sqrt(n)
      val cos = new Array[Double](cents.length)
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)._2
        var dot = 0.0; var j = 0
        while (j < cv.length) { dot += emb(j).toDouble * cv(j); j += 1 }
        // zero-norm guard: define cos = 0 when either norm is 0 — 0/0 = NaN
        // would never win the `>` comparison below, leaving best = -1 and
        // crashing the whole assignment pass on ONE all-zero vector
        val den = nv * cents(c)._3
        cos(c) = if (den == 0.0) 0.0 else dot / den
        c += 1
      }
      val taken = new Array[Boolean](cents.length)
      (0 until math.min(take, cents.length)).map { _ =>
        var best = -1; var bestCos = Double.NegativeInfinity
        var k = 0
        while (k < cos.length) {
          if (!taken(k) && cos(k) > bestCos) { best = k; bestCos = cos(k) }
          k += 1
        }
        taken(best) = true
        cents(best)._1
      }
    }
  }

  private def withNorm(id: Long, v: Array[Double]): (Long, Array[Double], Double) = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    (id, v, math.sqrt(n))
  }

  /** TRAINED coarse quantizer: driver-side spherical k-means (Lloyd) over a
    * deterministic stride sample of the corpus (every `n/sampleCap`-th
    * vec_id), init = k evenly-spaced sample points, assignment by the SAME
    * max-cosine/first-max rule as [[IvfCells.nearestCells]], update = plain
    * mean (centroid scale cancels in cosine). Empty cells keep their old
    * centroid. Fully deterministic double math — the trained centroids are
    * DUMPED to parquet by [[buildIvfIndex]] so the DuckDB oracle re-derives
    * assignment/probe/top-k from the identical numbers (the q00 dump
    * pattern: training is opaque to the oracle, everything after it is
    * re-verified). O(sampleCap × k × dim × iters) driver flops — ~40M at
    * the defaults, microseconds of driver time, no Spark job per iter. */
  def trainCentroids(s: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame,
      k: Int = 64, iters: Int = 5, sampleCap: Int = 2048): Array[(Long, Array[Double], Double)] = {
    import s.implicits._
    val typed = e.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
    val n = typed.count()
    val stride = math.max(1L, n / sampleCap)
    val sample = typed.filter(t => t._1 % stride == 0).collect().sortBy(_._1)
      .map { case (_, emb) => emb.iterator.map(_.toDouble).toArray }
    require(sample.nonEmpty, "empty corpus")
    val kk = math.min(k, sample.length)
    var cents: Array[(Long, Array[Double], Double)] =
      Array.tabulate(kk)(i => withNorm(i.toLong,
        sample((i.toLong * sample.length / kk).toInt).clone()))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](sample.head.length))
      val counts = new Array[Long](kk)
      sample.foreach { v =>
        val fl = new Array[Float](v.length)
        var i = 0; while (i < v.length) { fl(i) = v(i).toFloat; i += 1 }
        // NB: assignment on the float-rounded vector — the exact projection
        // the corpus pass sees — so training matches serving geometry
        val c = IvfCells.nearestCells(cents, fl.toSeq, 1).head.toInt
        var j = 0; while (j < v.length) { sums(c)(j) += v(j); j += 1 }
        counts(c) += 1
      }
      cents = Array.tabulate(kk) { c =>
        if (counts(c) == 0) cents(c)
        else {
          val m = new Array[Double](sums(c).length)
          var j = 0; while (j < m.length) { m(j) = sums(c)(j) / counts(c); j += 1 }
          withNorm(c.toLong, m)
        }
      }
      it += 1
    }
    cents
  }

  /** One typed assignment pass: every corpus vector labeled with its
    * nearest cell — shared by the index build (write) and the unindexed
    * query path (spec cross-check), so they cannot diverge. */
  def assignCells(s: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame,
      cents: Array[(Long, Array[Double], Double)]): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    e.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val local = bc.value
        it.map { case (id, emb) => (id, emb, IvfCells.nearestCells(local, emb, 1).head) }
      }.toDF("cand", "vb", "cell")
  }

  /** The persisted IVF index:
    *   <dir>/cents/                  trained centroids (cid, cv:
    *                                 array<double>) — also the oracle's input
    *   <dir>/data/batch=N/cell=K/    the corpus partitioned by assigned cell,
    *                                 one subtree per ingest batch
    * Probing reads ONLY the probed cells' directories across the LIVE
    * batches (structural path pruning, the SigStore pattern) — candidate
    * retrieval cost is O(probed cells' files), not a filter over the whole
    * corpus. The index is INCREMENTALLY APPENDABLE ([[appendBatch]]: new
    * vectors are assigned to the FIXED trained centroids — real IVF ingest;
    * re-train via a fresh build when drift warrants a rebucket), and batch
    * accumulation is bounded offline by [[compactBatches]] — liveness,
    * idempotent per-batch overwrite, and the crash-safe swap are the shared
    * [[BatchStore]] machinery. */
  final case class IvfIndex(dir: String) {
    import java.nio.file.{Files, Paths}
    def centsDir: String = s"$dir/cents"
    def dataDir: String = s"$dir/data"
    def delsDir: String = s"$dir/dels"

    /** DELETE vectors from the index (the q140 contract, vector side):
      * tombstones land now as their own batch and mask immediately on
      * every probe; the physical drop happens at [[compactBatches]].
      * GENERATIONAL: a tombstone masks only rows from EARLIER batches, so
      * re-ingesting a vector id after its delete (update = delete@M +
      * re-append@M′>M) serves the new version. */
    def delete(ids: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
      ids.select(col("cand").cast("long"))
        .write.mode("overwrite").parquet(s"$delsDir/batch=$batchId")

    /** Live tombstones with their generation (cand, del_max); None when
      * deletes are unused (probes then skip the anti-join entirely). */
    def deletedVecs(s: org.apache.spark.sql.SparkSession): Option[org.apache.spark.sql.DataFrame] = {
      val live = BatchStore.liveBatchDirs(delsDir)
      if (live.isEmpty) None
      else Some(s.read.option("basePath", delsDir)
        .parquet(live.map(_.toString): _*)
        .groupBy("cand")
        .agg(max(col("batch").cast("long")).as("del_max")))
    }

    /** Mask tombstoned rows; `df` must come off a basePath read so it
      * carries the `batch` partition column the generation rule uses. */
    private def minusDeleted(s: org.apache.spark.sql.SparkSession,
        df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      deletedVecs(s) match {
        case Some(dels) =>
          df.join(dels,
            df("cand") === dels("cand") &&
              df("batch").cast("long") < dels("del_max"),
            "left_anti")
        case None => df
      }

    def centroids(s: org.apache.spark.sql.SparkSession): Array[(Long, Array[Double], Double)] = {
      import s.implicits._
      s.read.parquet(centsDir).select("cid", "cv").as[(Long, Seq[Double])]
        .collect().sortBy(_._1).map { case (cid, cv) => withNorm(cid, cv.toArray) }
    }

    /** The `cell=K` directories (across live batches) probing would read
      * (files-read audit). */
    def prunedPaths(cells: Set[Long]): Seq[String] =
      BatchStore.liveBatchDirs(dataDir)
        .flatMap(b => cells.toSeq.sorted.iterator.map(c => b.resolve(s"cell=$c"))
          .filter(Files.isDirectory(_)))
        .map(_.toString).sorted

    def allPaths: Seq[String] = {
      import scala.jdk.CollectionConverters._
      BatchStore.liveBatchDirs(dataDir)
        .flatMap(b => Files.list(b).iterator().asScala
          .filter(_.getFileName.toString.startsWith("cell=")))
        .map(_.toString).toVector.sorted
    }

    /** Candidates from ONLY the probed cells (live batches), tombstones
      * masked. */
    def candidates(s: org.apache.spark.sql.SparkSession,
        cells: Set[Long]): org.apache.spark.sql.DataFrame = {
      val paths = prunedPaths(cells)
      minusDeleted(s, s.read.option("basePath", dataDir).parquet(paths: _*))
        .select(col("cand"), col("vb"), col("cell"))
    }

    /** Every live (cand, vb, cell) row (tombstones masked) —
      * maintenance/diagnostics input. */
    def data(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
      minusDeleted(s, s.read.option("basePath", dataDir)
        .parquet(BatchStore.liveBatchDirs(dataDir).map(_.toString): _*))
        .select(col("cand"), col("vb"), col("cell"))

    /** Append one ingest batch: assign its vectors to the index's FIXED
      * trained centroids and write them under `data/batch=<id>/cell=K`
      * (idempotent per batchId — a foreachBatch replay overwrites). The
      * serving path immediately probes the new vectors; no retrain, no
      * rewrite of earlier batches. */
    def appendBatch(s: org.apache.spark.sql.SparkSession,
        e: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
      assignCells(s, e, centroids(s))
        .select(col("cand"), col("vb"), col("cell"))
        .repartition(col("cell")) // one file per cell, parallel write (§6)
        .write.partitionBy("cell").mode("overwrite")
        .parquet(s"$dataDir/batch=$batchId")

    /** OFFLINE maintenance: consolidate accumulated `batch=N` subtrees into
      * one (same cell partitioning — pruning semantics unchanged) under the
      * shared crash-safe stage/mark/move/delete swap ([[BatchStore.compact]]).
      * Tombstoned vectors drop PHYSICALLY here (data(s) is already masked)
      * and the consumed tombstone batches consolidate to empty. */
    def compactBatches(s: org.apache.spark.sql.SparkSession, intoBatchId: Long,
        crashPoint: String => Unit = _ => ()): Int = {
      val hasDels = BatchStore.listBatchDirs(delsDir).nonEmpty
      val sides = Seq(
        dataDir -> ((stage: String) =>
          data(s).repartition(col("cell"))
            .write.partitionBy("cell").mode("overwrite").parquet(stage))) ++
        (if (hasDels) Seq(delsDir -> ((stage: String) =>
          s.read.option("basePath", delsDir)
            .parquet(BatchStore.liveBatchDirs(delsDir).map(_.toString): _*)
            .select(col("cand")).limit(0).write.parquet(stage))) else Seq.empty)
      // pending tombstones are work even against a single data batch
      BatchStore.compact(dir, sides, intoBatchId, crashPoint, force = hasDels)
    }
  }

  /** One-off maintenance pass (the rebucket analogue): train the quantizer,
    * assign every vector, write the corpus partitioned by cell + the
    * centroids parquet. */
  def buildIvfIndex(s: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame, dir: String,
      cells: Int = 64, iters: Int = 5): IvfIndex =
    buildIvfIndexWith(s, e, dir, trainCentroids(s, e, cells, iters))

  /** The build step alone, with already-trained centroids — split out so
    * the q36 gate can attribute train / build / probe wall separately. */
  def buildIvfIndexWith(s: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame, dir: String,
      cents: Array[(Long, Array[Double], Double)]): IvfIndex = {
    import s.implicits._
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val idx = IvfIndex(dir)
    cents.toSeq.map { case (cid, cv, _) => (cid, cv.toSeq) }
      .toDF("cid", "cv").coalesce(1).write.mode("overwrite").parquet(idx.centsDir)
    assignCells(s, e, cents)
      .select(col("cand"), col("vb"), col("cell"))
      .repartition(col("cell")) // one file per cell, parallel write (§6)
      .write.partitionBy("cell").mode("overwrite").parquet(s"${idx.dataDir}/batch=0")
    idx
  }

  /** IVF query over a built index: probes each query's `nprobe` best cells
    * and reads ONLY those cells' files. `queryVecs` is a tiny
    * (vec_id, embedding) frame — collected and broadcast. */
  def ivfTopKIndexed(s: org.apache.spark.sql.SparkSession, idx: IvfIndex,
      queryVecs: org.apache.spark.sql.DataFrame,
      k: Int = 10, nprobe: Int = 16): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val cents = idx.centroids(s)
    val qrows = queryVecs.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val probeList = qrows.toSeq.flatMap { case (qid, emb) =>
      IvfCells.nearestCells(cents, emb, nprobe).map(cid => (qid, emb, cid))
    }
    val probes = broadcast(probeList.toDF("qid", "va", "probe"))
    val cands = idx.candidates(s, probeList.map(_._3).toSet)
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("cand"))
    probes.join(cands, probes("probe") === cands("cell") && col("qid") =!= col("cand"))
      .withColumn("cos", expr(sparkCos))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cand", "cos")
      .orderBy("qid", "rank")
  }

  /** Unindexed twin of [[ivfTopKIndexed]] (same centroids, no partitioned
    * store) — the spec cross-checks indexed ≡ unindexed so pruning can
    * never change results. */
  def ivfTopKUnindexed(s: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame,
      cents: Array[(Long, Array[Double], Double)],
      queryVecs: org.apache.spark.sql.DataFrame,
      k: Int = 10, nprobe: Int = 16): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val cells = assignCells(s, e, cents)
    val qrows = queryVecs.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val probes = broadcast(qrows.toSeq.flatMap { case (qid, emb) =>
      IvfCells.nearestCells(cents, emb, nprobe).map(cid => (qid, emb, cid))
    }.toDF("qid", "va", "probe"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("cand"))
    probes.join(cells, probes("probe") === cells("cell") && col("qid") =!= col("cand"))
      .withColumn("cos", expr(sparkCos))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cand", "cos")
      .orderBy("qid", "rank")
  }

  /** The q36 PROBE plan without the gate's materializing localCheckpoint —
    * the reviewable plan artifact (graft.Explain). Reuses the index the
    * q36 query fn just built when present; builds it otherwise. */
  def q36ProbePlan(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-q36"
    val e = ld(s, d, "embeddings")
    val idx =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(s"$root/data"))) IvfIndex(root)
      else buildIvfIndex(s, e, root, cells = 128, iters = 5)
    ivfTopKIndexed(s, idx, e.filter(col("vec_id") < 5), k = 10, nprobe = 32)
  }

  /** Candidate fraction of the band prefilter: banded candidate pairs over
    * all within-label pairs — the bench evidence next to the q20 banded
    * recall number. */
  def bandedCandidateFraction(s: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame,
      bands: Int = BandDefaults._1, bits: Int = BandDefaults._2,
      minCollide: Int = BandDefaults._3): Double = {
    import s.implicits._
    val cand = bandedCandidates(s, e.select(col("label"), col("vec_id"), col("embedding")),
      bands, bits, minCollide).count()
    val totalPairs = e.groupBy("label").agg(count(lit(1)).as("n"))
      .select(sum(col("n") * (col("n") - 1) / 2)).as[Double].head()
    if (totalPairs == 0) 0.0 else cand / totalPairs
  }

  /** Mean per-query candidate fraction for an index + queries — the bench
    * evidence next to the recall number. */
  def ivfCandidateFraction(s: org.apache.spark.sql.SparkSession, idx: IvfIndex,
      queryVecs: org.apache.spark.sql.DataFrame, nprobe: Int = 16): Double = {
    import s.implicits._
    val cents = idx.centroids(s)
    val sizes = idx.data(s).groupBy("cell").count()
      .as[(Long, Long)].collect().toMap
    val total = sizes.values.sum.toDouble
    val qrows = queryVecs.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val fracs = qrows.map { case (_, emb) =>
      IvfCells.nearestCells(cents, emb, nprobe).map(c => sizes.getOrElse(c, 0L)).sum / total
    }
    fracs.sum / math.max(1, fracs.length)
  }

  /** q21 impl — exact cosine top-k by brute force (intentionally O(Q×N));
    * the recall baseline the approximate paths are measured against. */
  def bruteForceTopK(s: org.apache.spark.sql.SparkSession, d: String,
      numQueries: Int, k: Int = 10): org.apache.spark.sql.DataFrame = {
    val e = ld(s, d, "embeddings")
    val q = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("va"))
    val c = e.select(col("vec_id").as("cand"), col("embedding").as("vb"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("cand"))
    broadcast(q).join(c, col("qid") =!= col("cand"))
      .withColumn("cos", expr(sparkCos))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cand", "cos")
      .orderBy("qid", "rank")
  }

  /** The exact within-label near-dup oracle — shared by q20 (batch) and
    * q51 (streaming union-of-batches), the q18/q40 pattern. */
  private val neardupOracleSql: String =
    s"""SELECT a, b, cos FROM (
        SELECT l.vec_id AS a, r.vec_id AS b,
          $duckCos AS cos
        FROM (SELECT label, vec_id, embedding AS va FROM embeddings) l
        JOIN (SELECT label, vec_id, embedding AS vb FROM embeddings) r USING (label)
        WHERE l.vec_id < r.vec_id) t
        WHERE cos >= 0.35 ORDER BY a, b"""

  /** Per-dimension (min, max) envelope over the corpus — one typed pass
    * with per-partition envelopes (2 × dims doubles each) reduced on the
    * driver; collect size is O(partitions × dims), never O(rows). */
  private def dimEnvelope(typed: org.apache.spark.sql.Dataset[(Long, Seq[Float])],
      dims: Int): (Array[Double], Array[Double]) = {
    import typed.sparkSession.implicits._
    val parts = typed.mapPartitions { it =>
      val mn = Array.fill(dims)(Double.PositiveInfinity)
      val mx = Array.fill(dims)(Double.NegativeInfinity)
      var any = false
      it.foreach { case (_, emb) =>
        any = true
        var i = 0
        while (i < dims) {
          val v = emb(i).toDouble
          if (v < mn(i)) mn(i) = v
          if (v > mx(i)) mx(i) = v
          i += 1
        }
      }
      if (any) Iterator((mn, mx)) else Iterator.empty
    }.collect()
    require(parts.nonEmpty, "dimEnvelope: empty corpus")
    val mn = Array.fill(dims)(Double.PositiveInfinity)
    val mx = Array.fill(dims)(Double.NegativeInfinity)
    parts.foreach { case (a, b) =>
      var i = 0
      while (i < dims) {
        if (a(i) < mn(i)) mn(i) = a(i)
        if (b(i) > mx(i)) mx(i) = b(i)
        i += 1
      }
    }
    (mn, mx)
  }

  /** SQ8 quantization: q_i = clamp(floor((v_i − mn_i) / scale_i), 0, 255)
    * with scale_i = (mx_i − mn_i)/256 — double subtract/divide/floor, each
    * exactly rounded, so the DuckDB oracle reproduces every code from the
    * dumped (mn, mx) bit-for-bit. A constant dimension quantizes to 0. */
  private def quantize(emb: Seq[Float], mn: Array[Double],
      scale: Array[Double]): Array[Int] = {
    val out = new Array[Int](mn.length)
    var i = 0
    while (i < mn.length) {
      out(i) = if (scale(i) == 0.0) 0
      else math.min(255, math.max(0,
        math.floor((emb(i).toDouble - mn(i)) / scale(i)).toInt))
      i += 1
    }
    out
  }

  /** SYMMETRIC global-scale signed int8 codes for the SQ8 DOT prefilter:
    * q_i = round(x_i / gs · 127) ∈ [-127, 127] with ONE scale gs =
    * max |envelope bound| over every dimension. Offset-free, so the
    * integer dot Σ qa·qb is PROPORTIONAL to the raw dot (and, on a
    * unit-norm corpus, to cosine) up to quantization noise — the per-dim
    * offset grid ([[quantize]], kept for PQ whose L2 cancels offsets)
    * drops query-dependent affine terms from a dot and mis-ranks badly
    * once the shortlist is a small corpus fraction. floor(v/gs·127 + 0.5)
    * is the exact op sequence the DuckDB oracle replays. */
  private def quantizeSym(emb: Seq[Float], gs: Double): Array[Int] = {
    val out = new Array[Int](emb.length)
    var i = 0
    while (i < emb.length) {
      out(i) = if (gs == 0.0) 0
      else math.min(127, math.max(-127,
        math.floor(emb(i).toDouble / gs * 127.0 + 0.5).toInt))
      i += 1
    }
    out
  }

  /** q161 impl — SCALAR (INT8) QUANTIZATION prefilter + exact cosine
    * re-rank: the ANN MEMORY path. 64 float dims (256 B) become 64 int8
    * codes (64 B) — at 10^9 vectors that's the difference between a corpus
    * that fits executor memory and one that doesn't — and the prefilter
    * score is a pure INTEGER dot product over the codes (exact arithmetic,
    * so the shortlist is byte-deterministic; no float-order caveats).
    *
    * Execution shape mirrors [[sigRerankTopK]] (the one that survives 10^9
    * vectors): quantized queries BROADCAST, one typed pass over the corpus
    * keeps a bounded per-(partition, query) heap of the best (score, cand)
    * pairs — per-partition memory O(queries × M), no query×corpus
    * explosion — then the exact cosine re-ranks the tiny shortlist. The
    * per-dimension (mn, mx) envelope is dumped to `dumpDir` so the oracle
    * re-derives every quantization code, the integer scores, and both
    * rank stages in SQL. */
  def sq8RerankTopK(s: org.apache.spark.sql.SparkSession, d: String,
      numQueries: Int, M: Int = 200, k: Int = 10,
      dims: Int = 64): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val dumpDir = s"${System.getProperty("java.io.tmpdir")}/graft-q161"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dumpDir))
    val e = ld(s, d, "embeddings")
    val typed = e.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
    val (mn, mx) = dimEnvelope(typed, dims)
    // oracle input: the envelope (1-based dims, DuckDB list indexing);
    // the SYMMETRIC global scale gs = max |bound| is derived from it on
    // both sides, so the dump stays the single contract
    (0 until dims).map(i => (i + 1, mn(i), mx(i))).toDF("dim", "mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(s"$dumpDir/dims")
    val gs = (0 until dims).map(i => math.max(math.abs(mn(i)), math.abs(mx(i)))).max
    val qcodes = typed.filter(_._1 < numQueries).collect()
      .map { case (id, emb) => (id, quantizeSym(emb, gs)) }
    require(qcodes.nonEmpty, "no query vectors")
    val bq = s.sparkContext.broadcast(qcodes)
    // heap key: (-score, cand) — same total order the oracle's
    // ORDER BY score DESC, cand gives
    val ord = Ordering.Tuple2[Long, Long]
    val short = typed.mapPartitions { it =>
      val qs = bq.value
      val heaps = qs.map { case (qid, _) =>
        qid -> new scala.collection.mutable.PriorityQueue[(Long, Long)]()(ord) }.toMap
      it.foreach { case (cand, emb) =>
        val code = quantizeSym(emb, gs)
        qs.foreach { case (qid, qc) =>
          if (cand != qid) {
            var sc = 0L
            var i = 0
            while (i < qc.length) { sc += qc(i).toLong * code(i); i += 1 }
            val key = (-sc, cand)
            val h = heaps(qid)
            if (h.size < M) h.enqueue(key)
            else if (ord.lt(key, h.head)) { h.dequeue(); h.enqueue(key) }
          }
        }
      }
      heaps.iterator.flatMap { case (qid, h) =>
        h.iterator.map { case (ns, cand) => (qid, cand, ns) } }
    }.toDF("qid", "cand", "ns")
    val wh = Window.partitionBy("qid").orderBy(col("ns").asc, col("cand").asc)
    val shortlist = short.withColumn("hr", row_number().over(wh)).filter(col("hr") <= M)
    val qv = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("va"))
    val wc = Window.partitionBy("qid").orderBy(desc("cos"), col("cand"))
    e.select(col("vec_id").as("cand"), col("embedding").as("vb"))
      .join(broadcast(shortlist.select("qid", "cand")), Seq("cand"))
      .join(broadcast(qv), Seq("qid"))
      .withColumn("cos", expr(sparkCos))
      .withColumn("rank", row_number().over(wc).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cand", "cos")
      .orderBy("qid", "rank")
  }

  /** Per-subspace Lloyd over a quantized sample (driver-side, bounded by
    * the sample). Centroids round to the int grid at the end — the DUMPED
    * integers are the oracle's contract, training itself stays opaque. */
  private def pqTrain(sample: Array[Array[Int]], m: Int, ksub: Int,
      sub: Int): Array[Array[Array[Int]]] = Array.tabulate(m) { j =>
    // k-means++-lite seeding: spread initial centroids over the sample
    var c = Array.tabulate(ksub)(i =>
      sample((i.toLong * sample.length / ksub).toInt)
        .slice(j * sub, (j + 1) * sub).map(_.toDouble))
    var iter = 0
    while (iter < 15) {
      val sums = Array.fill(ksub, sub)(0.0)
      val counts = Array.fill(ksub)(0L)
      sample.foreach { q =>
        var best = 0; var bd = Double.MaxValue
        var ci = 0
        while (ci < ksub) {
          var dd = 0.0; var i = 0
          while (i < sub) {
            val df = q(j * sub + i) - c(ci)(i); dd += df * df; i += 1
          }
          if (dd < bd) { bd = dd; best = ci }
          ci += 1
        }
        counts(best) += 1
        var i = 0
        while (i < sub) { sums(best)(i) += q(j * sub + i); i += 1 }
      }
      c = Array.tabulate(ksub)(ci =>
        if (counts(ci) == 0) c(ci)
        else Array.tabulate(sub)(i => sums(ci)(i) / counts(ci)))
      iter += 1
    }
    c.map(_.map(v => math.min(255, math.max(0, math.round(v).toInt))))
  }

  /** Integer-L2 argmin per subspace; strict < → lowest cid wins ties
    * (matches the oracle's ORDER BY d2, cid). */
  private def pqAssign(q: Array[Int], cents: Array[Array[Array[Int]]],
      m: Int, ksub: Int, sub: Int): Array[Int] = Array.tabulate(m) { j =>
    var best = 0; var bd = Long.MaxValue
    var ci = 0
    while (ci < ksub) {
      var dd = 0L; var i = 0
      while (i < sub) {
        val df = (q(j * sub + i) - cents(j)(ci)(i)).toLong; dd += df * df; i += 1
      }
      if (dd < bd) { bd = dd; best = ci }
      ci += 1
    }
    best
  }

  /** Per-query integer LUT: lut(j)(cid) = L2²(query's sub-j codes, centroid). */
  private def pqLut(q: Array[Int], cents: Array[Array[Array[Int]]],
      m: Int, ksub: Int, sub: Int): Array[Array[Long]] =
    Array.tabulate(m, ksub) { (j, ci) =>
      var dd = 0L; var i = 0
      while (i < sub) {
        val df = (q(j * sub + i) - cents(j)(ci)(i)).toLong; dd += df * df; i += 1
      }
      dd
    }

  /** Oracle input: integer centroids melted to (sub, cid, global dim, cval). */
  private def dumpPqCents(s: org.apache.spark.sql.SparkSession,
      cents: Array[Array[Array[Int]]], dir: String,
      m: Int, ksub: Int, sub: Int): Unit = {
    import s.implicits._
    val rows = for {
      j <- 0 until m; ci <- 0 until ksub; i <- 0 until sub
    } yield (j, ci, j * sub + i + 1, cents(j)(ci)(i))
    rows.toDF("sub", "cid", "dim", "cval")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** The PQ code-derivation CTEs shared by the q174/q175 oracles: from the
    * dumped envelope + integer centroids under `<tmpdir>/<root>/`, re-derive
    * every int8 code (qz), every integer subspace distance (d2), and every
    * assignment (codes) in SQL. */
  private def pqCodesCtes(root: String): String = {
    val tmp = System.getProperty("java.io.tmpdir")
    s"""dims AS (SELECT dim, mn, mx
              FROM parquet_scan('$tmp/$root/dims/*.parquet')),
          pqc AS (SELECT sub, cid, dim, cval
              FROM parquet_scan('$tmp/$root/pqcents/*.parquet')),
          ex AS (SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS v
                 FROM embeddings, LATERAL generate_series(1, 64) t(i)),
          qz AS (SELECT e.vec_id, e.dim,
                  CASE WHEN d.mx = d.mn THEN 0
                       ELSE least(255, greatest(0,
                         CAST(floor((e.v - d.mn) / ((d.mx - d.mn) / 256.0)) AS INT)))
                  END AS q
                 FROM ex e JOIN dims d USING (dim)),
          d2 AS (SELECT z.vec_id, c.sub, c.cid,
                   CAST(sum(CAST(z.q - c.cval AS BIGINT) * (z.q - c.cval)) AS BIGINT) AS d2
                 FROM qz z JOIN pqc c USING (dim)
                 GROUP BY 1, 2, 3),
          codes AS (SELECT vec_id, sub, cid FROM (
                 SELECT vec_id, sub, cid, row_number() OVER (
                   PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
                 FROM d2) WHERE rn = 1)"""
  }

  /** q174 impl — PRODUCT QUANTIZATION (PQ-ADC) prefilter + exact cosine
    * re-rank: the ANN EXTREME-memory path. Where SQ8 (q161) stores 64
    * int8 codes (64 B/vector), PQ stores ONE centroid id per 8-dim
    * subspace — 8 codes of 16 choices = 8 nibbles (4 B/vector at a packed
    * layout; a 10^9-vector corpus drops from 256 GB of floats to 4 GB of
    * codes). Everything downstream of training is INTEGER arithmetic over
    * the q161 int8 grid: subspace assignment is an integer-L2 argmin
    * against integer centroids, and the ADC score is a sum of 8
    * precomputed integer LUT entries per candidate — byte-deterministic,
    * so the oracle re-derives every code, every assignment, every ADC
    * distance, and both rank stages in SQL from the dumped envelope +
    * integer centroids (training stays opaque to DuckDB, the q36
    * dump-then-refold pattern). Execution shape is the bounded-heap
    * single pass of [[sigRerankTopK]]/[[sq8RerankTopK]]: queries' LUTs
    * broadcast (m × ksub longs each), one typed pass over the corpus,
    * per-(partition, query) heaps of M, exact cosine re-rank of the
    * shortlist. */
  def pqRerankTopK(s: org.apache.spark.sql.SparkSession, d: String,
      numQueries: Int, M: Int = 200, k: Int = 10,
      dims: Int = 64, m: Int = 8, ksub: Int = 16): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    require(dims % m == 0, s"dims $dims must split into $m subspaces")
    val sub = dims / m
    val dumpDir = s"${System.getProperty("java.io.tmpdir")}/graft-q174"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dumpDir))
    val e = ld(s, d, "embeddings")
    val typed = e.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
    val (mn, mx) = dimEnvelope(typed, dims)
    val scale = Array.tabulate(dims)(i => (mx(i) - mn(i)) / 256.0)
    (0 until dims).map(i => (i + 1, mn(i), mx(i))).toDF("dim", "mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(s"$dumpDir/dims")

    // TRAIN per-subspace Lloyd on a bounded stride sample of quantized
    // vectors (driver-side flops bounded by the sample, never the corpus).
    // Centroids round to the int grid at the end: the DUMPED integers are
    // the oracle's input, so training itself stays engine-opaque.
    val sampleN = 1024
    val total = typed.count()
    val stride = math.max(1L, total / sampleN)
    val sample = typed.filter(_._1 % stride == 0).collect()
      .map { case (_, emb) => quantize(emb, mn, scale) }
    require(sample.length >= ksub, s"sample ${sample.length} < ksub $ksub")
    val cents = pqTrain(sample, m, ksub, sub)
    dumpPqCents(s, cents, s"$dumpDir/pqcents", m, ksub, sub)

    // per-query integer LUT: lut(j)(cid) = L2²(query's sub-j codes, centroid)
    val qrows = typed.filter(_._1 < numQueries).collect()
      .map { case (id, emb) => (id, quantize(emb, mn, scale)) }
    require(qrows.nonEmpty, "no query vectors")
    val luts = qrows.map { case (qid, q) => (qid, pqLut(q, cents, m, ksub, sub)) }
    val bl = s.sparkContext.broadcast(luts)
    val bc = s.sparkContext.broadcast(cents)
    val bmn = s.sparkContext.broadcast(mn)
    val bscale = s.sparkContext.broadcast(scale)
    val ord = Ordering.Tuple2[Long, Long] // (adc, cand): evict the LARGEST
    val short = typed.mapPartitions { it =>
      val qs = bl.value
      val cs = bc.value
      val heaps = qs.map { case (qid, _) =>
        qid -> new scala.collection.mutable.PriorityQueue[(Long, Long)]()(ord) }.toMap
      it.foreach { case (cand, emb) =>
        val code = pqAssign(quantize(emb, bmn.value, bscale.value), cs, m, ksub, sub)
        qs.foreach { case (qid, lut) =>
          if (cand != qid) {
            var adc = 0L; var j = 0
            while (j < m) { adc += lut(j)(code(j)); j += 1 }
            val key = (adc, cand)
            val h = heaps(qid)
            if (h.size < M) h.enqueue(key)
            else if (ord.lt(key, h.head)) { h.dequeue(); h.enqueue(key) }
          }
        }
      }
      heaps.iterator.flatMap { case (qid, h) =>
        h.iterator.map { case (adc, cand) => (qid, cand, adc) } }
    }.toDF("qid", "cand", "adc")
    val wh = Window.partitionBy("qid").orderBy(col("adc").asc, col("cand").asc)
    val shortlist = short.withColumn("hr", row_number().over(wh)).filter(col("hr") <= M)
    val qv = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("va"))
    val wc = Window.partitionBy("qid").orderBy(desc("cos"), col("cand"))
    e.select(col("vec_id").as("cand"), col("embedding").as("vb"))
      .join(broadcast(shortlist.select("qid", "cand")), Seq("cand"))
      .join(broadcast(qv), Seq("qid"))
      .withColumn("cos", expr(sparkCos))
      .withColumn("rank", row_number().over(wc).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cand", "cos")
      .orderBy("qid", "rank")
  }

  /** q175 impl — IVF-PQ: the two prunings composed (the classical
    * billion-scale architecture). The IVF coarse quantizer bounds WHICH
    * vectors each query scores (nprobe of `cells` trained cells, the q36
    * cosine geometry so the oracle's assignment matches bit for bit); PQ
    * bounds WHAT each scoring costs (8 integer LUT adds against
    * 4 B/vector of codes, the q174 integer grid). One typed corpus pass:
    * assign the vector's cell, and only for queries probing that cell
    * compute its PQ code once and ADC-score it into the bounded heap —
    * per-partition memory O(queries × M), candidate work
    * O(probed fraction × m). */
  def ivfPqTopK(s: org.apache.spark.sql.SparkSession, d: String,
      numQueries: Int, cells: Int = 64, nprobe: Int = 16,
      M: Int = 200, k: Int = 10,
      dims: Int = 64, m: Int = 8, ksub: Int = 16): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    require(dims % m == 0, s"dims $dims must split into $m subspaces")
    val sub = dims / m
    val dumpDir = s"${System.getProperty("java.io.tmpdir")}/graft-q175"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dumpDir))
    val e = ld(s, d, "embeddings")
    val typed = e.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
    // coarse quantizer (q36 geometry), dumped for the oracle
    val icents = trainCentroids(s, e, k = cells, iters = 5)
    icents.toSeq.map { case (cid, cv, _) => (cid, cv.toSeq) }
      .toDF("cid", "cv").coalesce(1).write.mode("overwrite")
      .parquet(s"$dumpDir/cents")
    // PQ codebooks over the int8 grid, dumped for the oracle
    val (mn, mx) = dimEnvelope(typed, dims)
    val scale = Array.tabulate(dims)(i => (mx(i) - mn(i)) / 256.0)
    (0 until dims).map(i => (i + 1, mn(i), mx(i))).toDF("dim", "mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(s"$dumpDir/dims")
    val total = typed.count()
    val stride = math.max(1L, total / 1024)
    val pqSample = typed.filter(_._1 % stride == 0).collect()
      .map { case (_, emb) => quantize(emb, mn, scale) }
    require(pqSample.length >= ksub, s"sample ${pqSample.length} < ksub $ksub")
    val pcents = pqTrain(pqSample, m, ksub, sub)
    dumpPqCents(s, pcents, s"$dumpDir/pqcents", m, ksub, sub)
    // per query: probe set (IVF) + integer LUT (PQ)
    val qrows = typed.filter(_._1 < numQueries).collect()
    require(qrows.nonEmpty, "no query vectors")
    val qstate = qrows.map { case (qid, emb) =>
      (qid, IvfCells.nearestCells(icents, emb, nprobe).toSet,
        pqLut(quantize(emb, mn, scale), pcents, m, ksub, sub))
    }
    val bq = s.sparkContext.broadcast(qstate)
    val bi = s.sparkContext.broadcast(icents)
    val bp = s.sparkContext.broadcast(pcents)
    val bmn = s.sparkContext.broadcast(mn)
    val bscale = s.sparkContext.broadcast(scale)
    val ord = Ordering.Tuple2[Long, Long]
    val short = typed.mapPartitions { it =>
      val qs = bq.value
      val heaps = qs.map { case (qid, _, _) =>
        qid -> new scala.collection.mutable.PriorityQueue[(Long, Long)]()(ord) }.toMap
      it.foreach { case (cand, emb) =>
        val cell = IvfCells.nearestCells(bi.value, emb, 1).head
        var code: Array[Int] = null // computed once, only if some query probes the cell
        qs.foreach { case (qid, probeSet, lut) =>
          if (cand != qid && probeSet(cell)) {
            if (code == null)
              code = pqAssign(quantize(emb, bmn.value, bscale.value),
                bp.value, m, ksub, sub)
            var adc = 0L; var j = 0
            while (j < m) { adc += lut(j)(code(j)); j += 1 }
            val key = (adc, cand)
            val h = heaps(qid)
            if (h.size < M) h.enqueue(key)
            else if (ord.lt(key, h.head)) { h.dequeue(); h.enqueue(key) }
          }
        }
      }
      heaps.iterator.flatMap { case (qid, h) =>
        h.iterator.map { case (adc, cand) => (qid, cand, adc) } }
    }.toDF("qid", "cand", "adc")
    val wh = Window.partitionBy("qid").orderBy(col("adc").asc, col("cand").asc)
    val shortlist = short.withColumn("hr", row_number().over(wh)).filter(col("hr") <= M)
    val qv = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("va"))
    val wc = Window.partitionBy("qid").orderBy(desc("cos"), col("cand"))
    e.select(col("vec_id").as("cand"), col("embedding").as("vb"))
      .join(broadcast(shortlist.select("qid", "cand")), Seq("cand"))
      .join(broadcast(qv), Seq("qid"))
      .withColumn("cos", expr(sparkCos))
      .withColumn("rank", row_number().over(wc).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "cand", "cos")
      .orderBy("qid", "rank")
  }

  val queries: Seq[OpQuery] = Seq(

    OpQuery("q20_embedding_neardup",
      (s, d) => neardupPairs(s, d),
      Some(neardupOracleSql)),

    OpQuery("q51_embed_neardup_stream",
      // STREAMING embedding near-dup under the hard gate: the embeddings
      // corpus arrives in 4 waves through EmbDedupStream (file source →
      // foreachBatch incremental mining over the label-partitioned
      // EmbStore; one long-lived query, one mid-stream checkpoint resume);
      // the union of per-batch emissions must equal the BATCH pairing —
      // the same exact oracle q20 is gated on, cosine bit for bit.
      (s, d) => {
        val root = s"${System.getProperty("java.io.tmpdir")}/graft-q51"
        graft.streaming.EmbDedupStream.mineCorpusInChunks(s,
          ld(s, d, "embeddings").select(col("label"), col("vec_id"), col("embedding")),
          root, chunks = 4).orderBy("a", "b")
      },
      Some(neardupOracleSql)),

    OpQuery("q21_ann_bruteforce_topk",
      // brute-force cosine top-10 for 5 query vectors — the exact baseline
      // an IVF/LSH variant is measured against
      (s, d) => bruteForceTopK(s, d, numQueries = 5),
      Some(s"""SELECT qid, rank, cand, cos FROM (
        SELECT qid, cand, cos,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand) AS rank
        FROM (SELECT q.vec_id AS qid, c.vec_id AS cand, $duckCos AS cos
          FROM (SELECT vec_id, embedding AS va FROM embeddings WHERE vec_id < 5) q
          JOIN (SELECT vec_id, embedding AS vb FROM embeddings) c ON q.vec_id <> c.vec_id) t) r
        WHERE rank <= 10 ORDER BY qid, rank""")),

    OpQuery("q22_ann_lsh_buckets",
      // 8 random-hyperplane signs → 8-bit bucket (one typed projection pass);
      // ANN then probes only same-bucket candidates (bucket join, no cross join)
      (s, d) => {
        bucketed8(s, d).groupBy("bucket")
          .agg(count(lit(1)).as("n_vecs"), min("vec_id").as("min_vec"), max("vec_id").as("max_vec"))
          .orderBy("bucket")
      },
      Some(s"""SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec, max(vec_id) AS max_vec
        FROM (SELECT vec_id, CAST(${(0 until 8).map(p =>
          s"(CASE WHEN ${signDuck(p)} > 0 THEN 1 ELSE 0 END) * ${1 << p}").mkString(" + ")} AS BIGINT) AS bucket
        FROM embeddings) t GROUP BY bucket ORDER BY bucket"""))
  ,

    OpQuery("q26_ann_lsh_probe_topk",
      // bucket-probe ANN, kept as the CONTRAST path (q27 is the measured
      // scale path on this corpus — weak-signal embeddings make bucket LSH
      // ≈ random sampling, recall@10 0.10): each query probes its own LSH
      // bucket plus the 8 buckets at Hamming distance 1 (multiprobe), top-10
      // by cosine WITHIN the probed candidates only. Cost per query is
      // O(candidates in 9/256 of the space), not O(N) — the bucket join is
      // an equi-join on `bucket`, never a cross join; the bucket itself is
      // ONE typed projection pass (not the doubly-evaluated HOF chain).
      // Recall vs the exact q21 baseline is measured in Bench (ann_recall).
      (s, d) => {
        import s.implicits._
        // corpus side: ONE typed projection pass
        val cand = bucketed8(s, d)
          .select(col("vec_id").as("cand"), col("embedding").as("vb"), col("bucket"))
        // query side: 5 vectors — collect, bucket on the driver with the
        // same matrix, expand the 9 multiprobe targets, broadcast
        val signs = signMatrix(8)
        val qrows = ld(s, d, "embeddings").select(col("vec_id"), col("embedding"))
          .filter(col("vec_id") < 5).as[(Long, Seq[Float])].collect()
        val probes = broadcast(qrows.toSeq.flatMap { case (qid, emb) =>
          val b = projSig(signs, emb)
          (b +: (0 until 8).map(p => b ^ (1L << p))).map(pr => (qid, emb, pr))
        }.toDF("qid", "va", "probe"))
        val w = Window.partitionBy("qid").orderBy(desc("cos"), col("cand"))
        probes.join(cand, probes("probe") === cand("bucket") && col("qid") =!= col("cand"))
          .withColumn("cos", expr(sparkCos))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 10)
          .select("qid", "rank", "cand", "cos")
          .orderBy("qid", "rank")
      },
      Some(s"""WITH b AS (SELECT vec_id, embedding, CAST(${(0 until 8).map(p =>
          s"(CASE WHEN ${signDuck(p)} > 0 THEN 1 ELSE 0 END) * ${1 << p}").mkString(" + ")} AS BIGINT) AS bucket
          FROM embeddings),
        p AS (SELECT vec_id AS qid, embedding AS va,
          unnest([bucket, ${(0 until 8).map(k => s"xor(bucket, ${1L << k})").mkString(", ")}]) AS probe
          FROM b WHERE vec_id < 5),
        c AS (SELECT vec_id AS cand, embedding AS vb, bucket FROM b)
        SELECT qid, rank, cand, cos FROM (
          SELECT qid, cand, cos,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand) AS rank
          FROM (SELECT qid, cand, $duckCos AS cos
            FROM p JOIN c ON p.probe = c.bucket AND p.qid <> c.cand) t) r
        WHERE rank <= 10 ORDER BY qid, rank"""))
  ,

    OpQuery("q27_ann_sig_rerank_topk",
      // the MEASURED-better ANN scale path for weak-signal embeddings (this
      // corpus' true top-10 neighbors sit at cos ≈ 0.3–0.4, so bucket LSH ≈
      // random sampling — q26 recall 0.10 at 5% candidates): a 64-bit
      // random-hyperplane signature per vector, candidates = top-200 by
      // Hamming distance (an 8-byte popcount ~50× cheaper than a float
      // dot), exact cosine re-rank on the shortlist. Measured recall@10 =
      // 0.56 at a 10% re-rank fraction vs 0.20 at 17% for bucket-probing.
      //
      // Execution shape is the one that survives 10^9 vectors: query
      // signatures BROADCAST, ONE typed pass over the corpus keeps a
      // bounded per-(partition, query) heap of the best (hamming, cand)
      // pairs — no query×corpus row explosion, no wide shuffle; only
      // partitions×queries×M tiny tuples leave the scan. Exactness: the
      // global top-M by the total order (hd, cand) is the union of
      // per-partition top-Ms, so results are identical to the windowed
      // formulation the DuckDB oracle uses.
      (s, d) => sigRerankTopK(s, d, numQueries = 5),
      Some(s"""WITH s AS (SELECT vec_id, embedding, CAST(${(0 until 64).map { p =>
          val w = if (p < 63) (1L << p).toString else Long.MinValue.toString
          s"(CASE WHEN ${signDuck(p)} > 0 THEN CAST(1 AS BIGINT) ELSE 0 END) * CAST($w AS BIGINT)"
        }.mkString(" + ")} AS BIGINT) AS sig FROM embeddings),
        q AS (SELECT vec_id AS qid, embedding AS va, sig AS qs FROM s WHERE vec_id < 5),
        short AS (SELECT qid, cand, va, vb FROM (
          SELECT qid, c.vec_id AS cand, va, c.embedding AS vb,
            row_number() OVER (PARTITION BY qid ORDER BY bit_count(xor(qs, c.sig)) ASC, c.vec_id) AS hr
          FROM q JOIN s c ON qid <> c.vec_id) h WHERE hr <= 200)
        SELECT qid, rank, cand, cos FROM (
          SELECT qid, cand, cos,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand) AS rank
          FROM (SELECT qid, cand, $duckCos AS cos FROM short) t) r
        WHERE rank <= 10 ORDER BY qid, rank"""))
  ,

    OpQuery("q36_ann_ivf_topk",
      // IVF ANN end-to-end under the gate: TRAIN a 128-cell k-means
      // quantizer (driver-side Lloyd, seeded sample), BUILD the
      // cell-partitioned index (one assignment pass + partitioned write),
      // then QUERY via the pruned reader (nprobe=32 cells per query, exact
      // cosine top-10 within probed candidates). 128 cells / nprobe=32 is
      // the measured sweet spot of the cells × nprobe sweep (AnnEval):
      // recall@10 0.78 at 25% candidates, vs 0.64 for the former
      // 64-cell/nprobe=16 point at the same fraction — finer cells buy
      // recall at equal candidate cost. The oracle reads the DUMPED
      // centroids parquet (training is opaque to it — the q00 dump
      // pattern) and independently re-derives assignment, probes, and
      // top-k in SQL. Recall + candidate fraction vs the exact q21
      // baseline are measured in Bench (ann_recall).
      (s, d) => {
        // train / build / probe are attributed separately (PhaseClock →
        // lifecycle_phases in the bench JSON): train+build are the
        // amortized-once maintenance cost; probe is the serving-path
        // number a regression matters for.
        val clock = new CdcQueries.PhaseClock("q36")
        val root = s"${System.getProperty("java.io.tmpdir")}/graft-q36"
        val e = ld(s, d, "embeddings")
        val cents = clock("train") { trainCentroids(s, e, k = 128, iters = 5) }
        val idx = clock("build") { buildIvfIndexWith(s, e, root, cents) }
        clock("probe") {
          ivfTopKIndexed(s, idx, e.filter(col("vec_id") < 5), k = 10, nprobe = 32)
            .localCheckpoint()
        }
      },
      Some(ivfOracleSql("graft-q36"))),

    OpQuery("q55_ann_ivf_append",
      // INCREMENTAL IVF ingest under the gate: train the quantizer on the
      // FIRST wave only (2/3 of the corpus), build the index from it, then
      // APPEND the second wave — assigned to the same fixed centroids, the
      // real-pipeline ingest path (no retrain, no rewrite of earlier
      // batches) — and probe the full corpus through the pruned two-batch
      // reader. The oracle re-derives assignment/probe/top-k over the FULL
      // corpus from the dumped (wave-1-trained) centroids: it matches
      // exactly because appendBatch assigns with those same centroids.
      (s, d) => {
        val clock = new CdcQueries.PhaseClock("q55")
        val root = s"${System.getProperty("java.io.tmpdir")}/graft-q55"
        val e = ld(s, d, "embeddings")
        val wave1 = e.filter(col("vec_id") % 3 =!= 0)
        val wave2 = e.filter(col("vec_id") % 3 === 0)
        val cents = clock("train") { trainCentroids(s, wave1, k = 128, iters = 5) }
        val idx = clock("build") { buildIvfIndexWith(s, wave1, root, cents) }
        clock("append") { idx.appendBatch(s, wave2, batchId = 1L) }
        clock("probe") {
          ivfTopKIndexed(s, idx, e.filter(col("vec_id") < 5), k = 10, nprobe = 32)
            .localCheckpoint()
        }
      },
      Some(ivfOracleSql("graft-q55"))),

    OpQuery("q167_ann_ivf_delete",
      // VECTOR-INDEX DELETES under the hard gate (the q140 contract on the
      // vector side — index lifecycle parity across modalities): every
      // 11th vector is deleted from the built IVF index. Tombstones mask
      // immediately on the probe path (hard-asserted: the pre-delete
      // top-k contained deleted ids, the post-delete top-k contains
      // none), the physical drop happens at compaction (tombstone store
      // consolidates to empty), and the post-compaction probe must be
      // IDENTICAL row for row. The oracle re-derives assignment / probes
      // / top-k from the dumped centroids with the deletion predicate
      // applied — a tombstone leak, a masked re-rank slip, or a
      // compaction that dropped the wrong rows all hash-diverge.
      (s, d) => {
        val clock = new CdcQueries.PhaseClock("q167")
        val root = s"${System.getProperty("java.io.tmpdir")}/graft-q167"
        val e = ld(s, d, "embeddings")
        val cents = clock("train") { trainCentroids(s, e, k = 128, iters = 5) }
        val idx = clock("build") { buildIvfIndexWith(s, e, root, cents) }
        val qs = e.filter(col("vec_id") < 5)
        val pre = clock("probe_pre") {
          ivfTopKIndexed(s, idx, qs, k = 10, nprobe = 32).localCheckpoint()
        }
        require(pre.filter(pmod(col("cand"), lit(11)) === 0).limit(1).count() > 0,
          "gate is vacuous unless the undeleted top-k contained doomed ids")
        clock("delete") {
          idx.delete(e.filter(pmod(col("vec_id"), lit(11)) === 0)
            .select(col("vec_id").as("cand")), batchId = 1L)
        }
        val masked = clock("probe_masked") {
          ivfTopKIndexed(s, idx, qs, k = 10, nprobe = 32).localCheckpoint()
        }
        require(masked.filter(pmod(col("cand"), lit(11)) === 0).count() == 0,
          "tombstones must mask immediately")
        clock("compact") { idx.compactBatches(s, intoBatchId = 5L) }
        require(idx.deletedVecs(s).forall(_.count() == 0),
          "compaction must consume every tombstone")
        val after = clock("probe_after_compact") {
          ivfTopKIndexed(s, idx, qs, k = 10, nprobe = 32).localCheckpoint()
        }
        val a = masked.collect().map(_.toSeq).toSet
        require(after.collect().map(_.toSeq).toSet == a,
          "physical drop must not change the serving results")
        masked.orderBy("qid", "rank")
      },
      Some(ivfOracleSql("graft-q167", candFilter = "vec_id % 11 <> 0"))),

    OpQuery("q161_ann_sq8_topk",
      // SCALAR (INT8) QUANTIZATION ANN under the hard gate — the memory
      // path: 64 float dims (256 B) become 64 SIGNED int8 codes
      // (64 B/vector; a 10^9-vector corpus drops from 256 GB to 64 GB of
      // codes), quantized SYMMETRICALLY with one global scale so the pure
      // INTEGER dot over the codes is PROPORTIONAL to the raw dot — and,
      // on this unit-norm corpus, to cosine. (The per-dim offset grid PQ
      // uses would drop query-dependent affine terms from a dot and
      // mis-rank once the shortlist is a small corpus fraction; L2-based
      // PQ is immune because differences cancel offsets.) Exact cosine
      // re-ranks the top-200 shortlist (10% at sf0.1). The oracle reads
      // the dumped envelope, derives the same global scale, and re-derives
      // EVERY code (floor/clamp double math), the integer scores, and both
      // rank stages in SQL — a drifted scale, a wrong clamp, a heap bug in
      // the bounded prefilter pass, or a re-rank tie-break slip all
      // hash-diverge. Recall vs the exact q21 baseline rides Bench
      // ann_recall.
      (s, d) => sq8RerankTopK(s, d, numQueries = 5),
      Some(sq8OracleSql)),

    OpQuery("q174_ann_pq_topk",
      // PRODUCT QUANTIZATION (PQ-ADC) ANN under the hard gate — the
      // extreme-memory tier of the vector family (q21 exact → q27 sig →
      // q36 IVF → q161 SQ8 → this): 64 float dims collapse to 8 subspace
      // centroid ids (16 choices each — 4 bits/subspace; a 10^9-vector
      // corpus is 4 GB of codes). All serving-path arithmetic is INTEGER
      // over the q161 int8 grid: assignment is an integer-L2 argmin
      // (ties → lowest cid), the prefilter score sums 8 integer LUT
      // entries, so the shortlist is byte-deterministic. The oracle reads
      // the dumped envelope + INTEGER centroids and re-derives every
      // quantization code, every subspace assignment, every ADC distance,
      // and both rank stages in SQL — a drifted centroid, a tie-break
      // slip, or a heap bug all hash-diverge. Training (per-subspace
      // Lloyd on a bounded stride sample) stays opaque to the oracle: the
      // dumped centroids ARE the contract, the q36 dump-then-refold
      // pattern. Recall vs the exact q21 baseline rides Bench ann_recall.
      (s, d) => pqRerankTopK(s, d, numQueries = 5),
      Some {
        s"""WITH ${pqCodesCtes("graft-q174")},
          -- ADC: query q's LUT row for candidate x's code, summed over subs
          adc AS (SELECT d.vec_id AS qid, x.vec_id AS cand,
                   CAST(sum(d.d2) AS BIGINT) AS adc
                 FROM codes x JOIN d2 d ON d.sub = x.sub AND d.cid = x.cid
                 WHERE d.vec_id < 5 AND x.vec_id <> d.vec_id
                 GROUP BY 1, 2),
          short AS (SELECT qid, cand FROM (
                 SELECT qid, cand, row_number() OVER (PARTITION BY qid
                   ORDER BY adc, cand) AS rn FROM adc) WHERE rn <= 200)
          SELECT qid, rank, cand, cos FROM (
            SELECT qid, cand, cos, CAST(row_number() OVER (PARTITION BY qid
              ORDER BY cos DESC, cand) AS BIGINT) AS rank
            FROM (SELECT s.qid, s.cand, $duckCos AS cos
                  FROM (SELECT sh.qid, sh.cand, q.embedding AS va, c.embedding AS vb
                        FROM short sh
                        JOIN embeddings q ON q.vec_id = sh.qid
                        JOIN embeddings c ON c.vec_id = sh.cand) s) t) r
          WHERE rank <= 10 ORDER BY qid, rank"""
      }),

    OpQuery("q175_ann_ivfpq_topk",
      // IVF-PQ under the hard gate — the two prunings COMPOSED, the
      // classical billion-scale serving architecture (an inverted-file
      // coarse quantizer bounds WHICH vectors are scored, product
      // quantization bounds WHAT each scoring costs): queries probe their
      // nprobe=16 best of 64 trained cells, and only the probed cells'
      // vectors are ADC-scored via the integer LUTs — per query the work
      // is (candidate fraction) × (8 integer adds), against 4 B/vector of
      // codes. Both quantizers' training stays opaque to the oracle; the
      // dumped IVF centroids + PQ envelope/centroids are the contract, and
      // the oracle re-derives cell assignment, probe sets, candidate
      // membership, every PQ code, every ADC distance, and both rank
      // stages in SQL. Recall rides Bench ann_recall (q175_ivfpq).
      (s, d) => ivfPqTopK(s, d, numQueries = 5),
      Some {
        val tmp = System.getProperty("java.io.tmpdir")
        s"""WITH icents AS (
            SELECT cid, cv FROM parquet_scan('$tmp/graft-q175/cents/*.parquet')),
          asg AS (
            SELECT vec_id, cid,
              row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
            FROM (SELECT e.vec_id, c.cid, $duckCos AS ccos
              FROM (SELECT vec_id, embedding AS va FROM embeddings) e
              CROSS JOIN (SELECT cid, cv AS vb FROM icents) c) t),
          cells AS (SELECT vec_id AS cand, cid AS cell FROM asg WHERE rn = 1),
          probes AS (SELECT vec_id AS qid, cid AS probe
            FROM asg WHERE vec_id < 5 AND rn <= 16),
          ${pqCodesCtes("graft-q175")},
          cand AS (SELECT p.qid, cl.cand FROM probes p
                   JOIN cells cl ON cl.cell = p.probe WHERE cl.cand <> p.qid),
          adc AS (SELECT c.qid, c.cand, CAST(sum(d.d2) AS BIGINT) AS adc
                 FROM cand c JOIN codes x ON x.vec_id = c.cand
                 JOIN d2 d ON d.vec_id = c.qid AND d.sub = x.sub AND d.cid = x.cid
                 GROUP BY 1, 2),
          short AS (SELECT qid, cand FROM (
                 SELECT qid, cand, row_number() OVER (PARTITION BY qid
                   ORDER BY adc, cand) AS rn FROM adc) WHERE rn <= 200)
          SELECT qid, rank, cand, cos FROM (
            SELECT qid, cand, cos, CAST(row_number() OVER (PARTITION BY qid
              ORDER BY cos DESC, cand) AS BIGINT) AS rank
            FROM (SELECT s.qid, s.cand, $duckCos AS cos
                  FROM (SELECT sh.qid, sh.cand, q.embedding AS va, c.embedding AS vb
                        FROM short sh
                        JOIN embeddings q ON q.vec_id = sh.qid
                        JOIN embeddings c ON c.vec_id = sh.cand) s) t) r
          WHERE rank <= 10 ORDER BY qid, rank"""
      }),

    OpQuery("q196_quantizer_drift",
      // QUANTIZER DRIFT MONITOR — the "when must the IVF/SemDeDup k-means
      // retrain" answer (the vector-side sibling of the q155/q158 table
      // drift gates): assign an incoming wave to the FIXED trained
      // centroids and compare each cell's observed share against the
      // training corpus's. The fixture shifts the topic mix hard (the new
      // wave keeps only even labels — half the topics vanish), so
      // odd-dominated cells crater and even-dominated cells double. The
      // per-cell statistic is INTEGER-exact cross-multiplication:
      // dev = |n_new·N_base − n_base·N_new| (no float shares), flagged
      // when the relative deviation exceeds 25% (4·dev > n_base·N_new;
      // an empty training cell flags on any new mass). Cost: one
      // assignment pass over the wave + a 16-row join — the monitor is
      // free next to the ingest it guards.
      (s, d) => {
        val clock = new CdcQueries.PhaseClock("q196")
        val root = s"${System.getProperty("java.io.tmpdir")}/graft-q196"
        val e = ld(s, d, "embeddings")
        val cents = clock("train") { trainCentroids(s, e, k = 16, iters = 5) }
        val idx = clock("build") { buildIvfIndexWith(s, e, root, cents) }
        val out = clock("monitor") {
          val base = idx.data(s).groupBy(col("cell").cast("long").as("cell"))
            .agg(count(lit(1)).as("n_base"))
          val wave = assignCells(s, e.filter(pmod(col("label"), lit(2)) === 0), cents)
            .groupBy(col("cell").cast("long").as("cell"))
            .agg(count(lit(1)).as("n_new"))
          val nBase = e.count()
          val nNew = e.filter(pmod(col("label"), lit(2)) === 0).count()
          require(nNew > 0 && nNew < nBase, "fixture must shift the mix")
          val cells = s.read.parquet(idx.centsDir).select(col("cid").as("cell"))
          cells.join(base, Seq("cell"), "left").join(wave, Seq("cell"), "left")
            .na.fill(0L, Seq("n_base", "n_new"))
            .withColumn("dev",
              abs(col("n_new") * nBase - col("n_base") * nNew))
            .withColumn("drifted",
              col("dev") * 4 > col("n_base") * nNew)
            .select("cell", "n_base", "n_new", "dev", "drifted")
            .localCheckpoint()
        }
        require(out.filter(col("drifted")).limit(1).count() > 0 &&
          out.filter(!col("drifted")).limit(1).count() > 0,
          "the shifted mix must drift some cells and spare others")
        out.orderBy("cell")
      },
      Some({
        val duckCos = duckCosSql
        s"""WITH cents AS (
            SELECT cid, cv FROM parquet_scan('${System.getProperty("java.io.tmpdir")}/graft-q196/cents/*.parquet')),
          asg AS (
            SELECT vec_id, label, cid,
              row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
            FROM (SELECT e.vec_id, e.label, c.cid, $duckCos AS ccos
              FROM (SELECT vec_id, label, embedding AS va FROM embeddings) e
              CROSS JOIN (SELECT cid, cv, cv AS vb FROM cents) c) t),
          cells AS (SELECT vec_id, label, cid AS cell FROM asg WHERE rn = 1),
          tot AS (SELECT count(*) AS nb,
              count(*) FILTER (WHERE label % 2 = 0) AS nn FROM cells),
          agg AS (SELECT c.cid AS cell,
              CAST(count(x.vec_id) AS BIGINT) AS n_base,
              CAST(count(x.vec_id) FILTER (WHERE x.label % 2 = 0) AS BIGINT) AS n_new
            FROM cents c LEFT JOIN cells x ON x.cell = c.cid GROUP BY 1)
          SELECT cell, n_base, n_new,
            CAST(abs(n_new * nb - n_base * nn) AS BIGINT) AS dev,
            abs(n_new * nb - n_base * nn) * 4 > n_base * nn AS drifted
          FROM agg, tot ORDER BY cell"""
      }))
  ,

    OpQuery("q207_knn_graph",
      // k-NN GRAPH CONSTRUCTION — the substrate for graph-based corpus
      // analysis (clustering, diversity, HNSW-style indexes): every
      // vector's top-3 cosine neighbors WITHIN ITS IVF CELL (the SemDeDup
      // blocking, q188: Σ|cell|² ≈ N²/K comparisons, each cell an
      // independent executor-sized task after one repartition-by-cell
      // shuffle — never the all-pairs join). 16 coarse cells keep each
      // cell large enough (~N/16 members) that 3-NN within the cell is
      // meaningful. The oracle re-derives assignment, every same-cell
      // pair, and the per-vector rank from the dumped centroids.
      (s, d) => {
        import s.implicits._
        val clock = new CdcQueries.PhaseClock("q207")
        val root = s"${System.getProperty("java.io.tmpdir")}/graft-q207"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
        val e = ld(s, d, "embeddings")
        val cents = clock("train") { trainCentroids(s, e, k = 16, iters = 5) }
        cents.toSeq.map { case (cid, cv, _) => (cid, cv.toSeq) }
          .toDF("cid", "cv").coalesce(1)
          .write.mode("overwrite").parquet(s"$root/cents")
        clock("graph") { knnWithinCells(s, e, cents, j = 3).localCheckpoint() }
      },
      Some(knnOracleSql("graft-q207") +
        " SELECT vec_id, rank, nbr, cos FROM knn ORDER BY vec_id, rank")),

    OpQuery("q208_semantic_clusters",
      // SEMANTIC CLUSTERS — the k-NN graph (q207's construction) made
      // undirected, then CONNECTED COMPONENTS (q35's operator) over it:
      // every vector labeled with its cluster's smallest vec_id. The
      // composition a corpus map needs: index → neighbor graph → groups,
      // each stage the same shared definition its standalone gate uses.
      // The oracle walks the SQL-re-derived edges with a recursive CTE —
      // a drifted neighbor rank, a dropped edge, or a wrong component
      // fold all hash-diverge.
      (s, d) => {
        import s.implicits._
        val clock = new CdcQueries.PhaseClock("q208")
        val root = s"${System.getProperty("java.io.tmpdir")}/graft-q208"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
        val e = ld(s, d, "embeddings")
        val cents = clock("train") { trainCentroids(s, e, k = 16, iters = 5) }
        cents.toSeq.map { case (cid, cv, _) => (cid, cv.toSeq) }
          .toDF("cid", "cv").coalesce(1)
          .write.mode("overwrite").parquet(s"$root/cents")
        val edges = clock("graph") {
          knnWithinCells(s, e, cents, j = 3)
            .select(col("vec_id").as("a"), col("nbr").as("b")).localCheckpoint()
        }
        clock("components") {
          val comp = DedupOps.connectedComponents(edges)
          e.select("vec_id")
            .join(comp.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
            .select(col("vec_id"),
              coalesce(col("label"), col("vec_id")).as("cluster"))
            .orderBy("vec_id")
        }
      },
      Some(knnOracleSql("graft-q208") +
        """, edges AS (SELECT vec_id AS src, nbr AS dst FROM knn
                       UNION SELECT nbr, vec_id FROM knn),
          reach(id, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
          comp AS (SELECT id AS vec_id, min(r) AS cluster FROM reach GROUP BY id)
          SELECT e2.vec_id, coalesce(c.cluster, e2.vec_id) AS cluster
          FROM embeddings e2 LEFT JOIN comp c USING (vec_id)
          ORDER BY e2.vec_id"""))
  )

  /** Top-`j` cosine neighbors of every vector WITHIN its assigned cell —
    * one repartition-by-cell shuffle, per-cell pairing, bounded rank.
    * Shared by q207 (the graph) and q208 (clusters over it). */
  def knnWithinCells(s: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame,
      cents: Array[(Long, Array[Double], Double)], j: Int): org.apache.spark.sql.DataFrame = {
    val asg = assignCells(s, e, cents)
    val left = asg.select(col("cand").as("vec_id"), col("vb").as("va"), col("cell"))
    val right = asg.select(col("cand").as("nbr"), col("vb"), col("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cos").desc, col("nbr"))
    left.join(right, Seq("cell"))
      .filter(col("vec_id") =!= col("nbr"))
      .withColumn("cos", expr(sparkCos))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= j)
      .select("vec_id", "rank", "nbr", "cos")
  }

  /** The shared q207/q208 oracle prefix: cell assignment from the dumped
    * centroids + within-cell top-3 ranks, ending after the `knn` CTE
    * (callers append their SELECT or further CTEs). */
  private def knnOracleSql(root: String): String =
    s"""WITH RECURSIVE cents AS (
          SELECT cid, cv FROM parquet_scan('${System.getProperty("java.io.tmpdir")}/$root/cents/*.parquet')),
        asg AS (
          SELECT vec_id, embedding, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
          FROM (SELECT e.vec_id, e.embedding, c.cid, $duckCos AS ccos
            FROM (SELECT vec_id, embedding, embedding AS va FROM embeddings) e
            CROSS JOIN (SELECT cid, cv, cv AS vb FROM cents) c) t),
        cells AS (SELECT vec_id, embedding, cid AS cell FROM asg WHERE rn = 1),
        knn AS (SELECT vec_id, rank, nbr, cos FROM (
          SELECT va_id AS vec_id, vb_id AS nbr, cos,
            row_number() OVER (PARTITION BY va_id ORDER BY cos DESC, vb_id) AS rank
          FROM (SELECT x.vec_id AS va_id, y.vec_id AS vb_id, $duckCos AS cos
                FROM (SELECT vec_id, embedding AS va, cell FROM cells) x
                JOIN (SELECT vec_id, embedding AS vb, cell FROM cells) y
                  ON x.cell = y.cell AND x.vec_id <> y.vec_id) p) r
          WHERE rank <= 3)"""

  private def sq8OracleSql: String = {
        val tmp = System.getProperty("java.io.tmpdir")
        s"""WITH dims AS (SELECT dim, mn, mx
              FROM parquet_scan('$tmp/graft-q161/dims/*.parquet')),
          gsc AS (SELECT max(greatest(abs(mn), abs(mx))) AS g FROM dims),
          ex AS (SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS v
                 FROM embeddings, LATERAL generate_series(1, 64) t(i)),
          qz AS (SELECT e.vec_id, e.dim,
                  CASE WHEN g = 0 THEN 0
                       ELSE least(127, greatest(-127,
                         CAST(floor(e.v / g * 127.0 + 0.5) AS INT)))
                  END AS q
                 FROM ex e, gsc),
          sc AS (SELECT a.vec_id AS qid, b.vec_id AS cand,
                   CAST(sum(a.q * b.q) AS BIGINT) AS score
                 FROM qz a JOIN qz b USING (dim)
                 WHERE a.vec_id < 5 AND b.vec_id <> a.vec_id
                 GROUP BY 1, 2),
          short AS (SELECT qid, cand FROM (
                 SELECT qid, cand, row_number() OVER (PARTITION BY qid
                   ORDER BY score DESC, cand) AS rn FROM sc) WHERE rn <= 200)
          SELECT qid, rank, cand, cos FROM (
            SELECT qid, cand, cos, CAST(row_number() OVER (PARTITION BY qid
              ORDER BY cos DESC, cand) AS BIGINT) AS rank
            FROM (SELECT s.qid, s.cand, $duckCos AS cos
                  FROM (SELECT sh.qid, sh.cand, q.embedding AS va, c.embedding AS vb
                        FROM short sh
                        JOIN embeddings q ON q.vec_id = sh.qid
                        JOIN embeddings c ON c.vec_id = sh.cand) s) t) r
          WHERE rank <= 10 ORDER BY qid, rank"""
  }

  /** The IVF oracle (shared q36/q55): re-derive assignment, probes, and
    * top-k in SQL from the centroids parquet the query fn dumped under
    * `<java.io.tmpdir>/<root>/cents` — training stays opaque to DuckDB
    * (the q00 dump-then-refold pattern). */
  private def ivfOracleSql(root: String, candFilter: String = "TRUE"): String =
    s"""WITH cents AS (
          SELECT cid, cv FROM parquet_scan('${System.getProperty("java.io.tmpdir")}/$root/cents/*.parquet')),
        asg AS (
          SELECT vec_id, embedding, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
          FROM (SELECT e.vec_id, e.embedding, c.cid, $duckCos AS ccos
            FROM (SELECT vec_id, embedding, embedding AS va FROM embeddings) e
            CROSS JOIN (SELECT cid, cv, cv AS vb FROM cents) c) t),
        cells AS (SELECT vec_id AS cand, embedding AS vb, cid AS cell
                  FROM asg WHERE rn = 1 AND ($candFilter)),
        probes AS (SELECT vec_id AS qid, embedding AS va, cid AS probe
          FROM asg WHERE vec_id < 5 AND rn <= 32)
        SELECT qid, rank, cand, cos FROM (
          SELECT qid, cand, cos,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand) AS rank
          FROM (SELECT qid, cand, $duckCos AS cos
            FROM probes JOIN cells ON probe = cell AND qid <> cand) t) r
        WHERE rank <= 10 ORDER BY qid, rank"""
}
