package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import Tables.ld

/** Product-analytics primitives: hierarchy rollups, ordered funnels and
  * cohort retention — the classic warehouse workloads an analytics engine
  * must express beside the curation/CDC layers. All three gates are
  * INTEGER-EXACT end to end (counts, row_number sequences, floor-div week
  * indices), so the DuckDB oracles hash-match with no float caveats.
  */
object AnalyticsOps {

  val queries: Seq[OpQuery] = Seq(

    OpQuery("q132_subtree_rollup",
      // HIERARCHICAL SUBTREE ROLLUP without iteration: the part hierarchy
      // is parent(n) = n div 10 (root 0). Instead of a recursive join,
      // every node EXPLODES its own bounded ancestor path (k = 0..7 floor
      // divisions — the tree depth bound, not the data size) and one
      // hash aggregation keyed by ancestor folds the subtree sums: a
      // fixed-fan-out generate + one shuffle, the shape that survives any
      // corpus size where depth stays logarithmic. The oracle walks the
      // SAME tree with a genuine WITH RECURSIVE CTE — two unrelated
      // formulations of transitive descendance must agree exactly.
      (s, d) => {
        val base = ld(s, d, "part")
          .select(col("p_partkey").as("node"), col("p_size").cast("long").as("v"))
        base
          .select(col("node"), col("v"), explode(sequence(lit(0), lit(7))).as("k"))
          .select(col("node"), col("v"),
            expr("node div cast(power(10, k) as bigint)").as("anc"))
          .distinct() // short paths hit the root early; count it once
          .groupBy(col("anc").as("node"))
          .agg(sum(col("v")).as("subtree_size"), count(lit(1)).as("n_desc"))
          .orderBy("node")
      },
      Some("""WITH RECURSIVE walk AS (
          SELECT p_partkey AS node, p_partkey AS anc, CAST(p_size AS BIGINT) AS v
          FROM part
          UNION ALL
          SELECT node, anc // 10, v FROM walk WHERE anc > 0)
        SELECT anc AS node, CAST(sum(v) AS BIGINT) AS subtree_size,
               CAST(count(*) AS BIGINT) AS n_desc
        FROM walk GROUP BY anc ORDER BY node""")),

    OpQuery("q133_funnel",
      // ORDERED FUNNEL signup → view → purchase per user: each step is the
      // EARLIEST qualifying event strictly after the previous step, on the
      // total (ts, event_id) order (row_number makes the order integer and
      // tie-free). Steps resolve via left joins so drop-off stays visible
      // as NULLs. One window pass + two aggregated left joins, all keyed
      // by user_id — a single shuffle family at scale.
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val seqd = ld(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("seq", row_number().over(w).cast("long"))
          .localCheckpoint() // consumed three times below
        val s1 = seqd.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("seq").as("step1"))
        val v = seqd.filter(col("event_type") === "view")
          .select(col("user_id").as("vu"), col("seq").as("vseq"))
        val s2 = s1.join(v, col("vu") === col("user_id") &&
            col("vseq") > col("step1"), "left")
          .groupBy("user_id", "step1").agg(min("vseq").as("step2"))
        val p = seqd.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("seq").as("pseq"))
        s2.join(p, col("pu") === col("user_id") &&
            col("pseq") > col("step2"), "left")
          .groupBy("user_id", "step1", "step2").agg(min("pseq").as("step3"))
          .orderBy("user_id")
      },
      Some("""WITH seqd AS (SELECT user_id, event_type,
            row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
          FROM events),
        s1 AS (SELECT user_id, CAST(min(seq) AS BIGINT) AS step1
               FROM seqd WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT s1.user_id, s1.step1, CAST(min(v.seq) AS BIGINT) AS step2
               FROM s1 LEFT JOIN seqd v ON v.user_id = s1.user_id
                 AND v.event_type = 'view' AND v.seq > s1.step1
               GROUP BY 1, 2)
        SELECT s2.user_id, s2.step1, s2.step2, CAST(min(p.seq) AS BIGINT) AS step3
        FROM s2 LEFT JOIN seqd p ON p.user_id = s2.user_id
          AND p.event_type = 'purchase' AND p.seq > s2.step2
        GROUP BY 1, 2, 3 ORDER BY s2.user_id""")),

    OpQuery("q134_cohort_retention",
      // COHORT RETENTION: cohort = a user's first active week, retention
      // cell = distinct users of cohort c active in week c+off. Week
      // indices are pure integer floor-divisions of event-time micros (no
      // calendar/timezone semantics to diverge on). The (user, week)
      // distinct is the only wide state; the matrix itself is tiny.
      (s, d) => {
        val uw = ld(s, d, "events")
          .select(col("user_id"),
            expr("unix_micros(cast(ts as timestamp)) div 86400000000 div 7").as("wk"))
          .distinct()
        val cohort = uw.groupBy("user_id").agg(min("wk").as("cohort_week"))
        uw.join(cohort, Seq("user_id"))
          .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
          .agg(count(lit(1)).as("n_users")) // uw is distinct per (user, wk)
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH uw AS (SELECT DISTINCT user_id,
            epoch_us(ts) // 86400000000 // 7 AS wk FROM events),
        cohort AS (SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY 1)
        SELECT c.cohort_week, u.wk - c.cohort_week AS week_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM uw u JOIN cohort c USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    OpQuery("q137_iqr_outliers",
      // RANK-EXACT OUTLIER FLAGGING: per event_type, p25/p75 by rank
      // selection (the q58 rule — the smallest value at sorted position
      // ≥ ceil(p·n), never interpolated), then the 1.5·IQR fences in
      // DECIMAL(18,6) arithmetic SCALED BY 2 so the 1.5 factor becomes the
      // integer 3: flag iff 2v < 2·p25 − 3·iqr or 2v > 2·p75 + 3·iqr.
      // Every comparison is exact decimal — no float fence can straddle an
      // engine-rounding difference. Two shuffles (rank window + fence
      // join), both keyed by event_type.
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
        val ev = ld(s, d, "events").filter(col("value").isNotNull)
          .select(col("event_id"), col("event_type"),
            col("value").cast(DecimalType(18, 6)).as("v"), col("value"))
        val ranked = ev
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        val fences = ranked.groupBy("event_type").agg(
          min(when(col("rn") >= ceil(lit(0.25) * col("n")), col("v"))).as("p25"),
          min(when(col("rn") >= ceil(lit(0.75) * col("n")), col("v"))).as("p75"))
        ev.join(fences, Seq("event_type"))
          .withColumn("iqr", col("p75") - col("p25"))
          .withColumn("is_outlier",
            (col("v") * 2 < col("p25") * 2 - col("iqr") * 3) ||
              (col("v") * 2 > col("p75") * 2 + col("iqr") * 3))
          .select(col("event_id"), col("event_type"), col("value"),
            col("p25").cast("double").as("p25"), col("p75").cast("double").as("p75"),
            col("is_outlier"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (SELECT event_id, event_type,
            CAST(value AS DECIMAL(18,6)) AS v, value
          FROM events WHERE value IS NOT NULL),
        ranked AS (SELECT *,
            row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n FROM ev),
        fences AS (SELECT event_type,
            min(CASE WHEN rn >= ceil(0.25 * n) THEN v END) AS p25,
            min(CASE WHEN rn >= ceil(0.75 * n) THEN v END) AS p75
          FROM ranked GROUP BY 1)
        SELECT ev.event_id, ev.event_type, ev.value,
          CAST(f.p25 AS DOUBLE) AS p25, CAST(f.p75 AS DOUBLE) AS p75,
          (ev.v * 2 < f.p25 * 2 - (f.p75 - f.p25) * 3) OR
          (ev.v * 2 > f.p75 * 2 + (f.p75 - f.p25) * 3) AS is_outlier
        FROM ev JOIN fences f USING (event_type)
        ORDER BY ev.event_id""")),

    OpQuery("q138_bigram_lm",
      // BIGRAM LANGUAGE-MODEL ESTIMATION over the corpus: adjacent-token
      // pair counts and the conditional probability p(w2|w1) — counts stay
      // BIGINT, the probability is ONE exactly-rounded division (the q97
      // float rule). Bigrams never cross documents. One tokenize pass,
      // two partial-aggregated shuffles.
      (s, d) => {
        val grams = ld(s, d, "documents")
          .select(col("doc_id"), posexplode(expr(TextOps.wordsSpark)).as(Seq("pos", "w")))
          .withColumn("w2", lead("w", 1).over(
            Window.partitionBy("doc_id").orderBy("pos")))
          .filter(col("w2").isNotNull)
        val big = grams.groupBy(col("w").as("w1"), col("w2"))
          .agg(count(lit(1)).as("cnt"))
        val tot = big.groupBy("w1").agg(sum("cnt").as("w1_tot"))
        big.join(tot, Seq("w1"))
          .filter(col("cnt") >= 5)
          .withColumn("p", col("cnt").cast("double") / col("w1_tot").cast("double"))
          .select("w1", "w2", "cnt", "w1_tot", "p")
          .orderBy("w1", "w2")
      },
      Some(s"""WITH toks AS (SELECT doc_id, ${TextOps.wordsDuck} AS ws FROM documents),
        grams AS (SELECT ws[i] AS w1, ws[i+1] AS w2
          FROM toks, LATERAL (SELECT unnest(generate_series(1,
            greatest(len(ws) - 1, 0))) AS i)),
        big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
          FROM grams GROUP BY 1, 2),
        tot AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS w1_tot FROM big GROUP BY 1)
        SELECT big.w1, big.w2, cnt, w1_tot,
          CAST(cnt AS DOUBLE) / CAST(w1_tot AS DOUBLE) AS p
        FROM big JOIN tot USING (w1) WHERE cnt >= 5
        ORDER BY big.w1, big.w2""")),

    // EXACT CORRELATION MATRIX (q183): pairwise Pearson correlation +
    // sample covariance over (l_quantity, l_extendedprice, l_discount)
    // per return flag, from MERGEABLE EXACT MOMENTS — the sufficient-
    // statistics pattern: every input is cast per row to DECIMAL(18,2)
    // (deterministic rounding, the q01 pattern), so the sums, squares and
    // cross-products are EXACT decimals whose value is independent of
    // partitioning and reduction order — one partial-agg (map-side
    // combine) shuffle computes all 3 pairs' 10 moments in a single pass,
    // the shape that holds at 10^10 rows. Spark's builtin corr() streams
    // doubles (order-dependent, engine-specific); this operator exists
    // for when moments must be stored, merged across days, and the
    // derived statistics must be bit-reproducible: the final corr/cov are
    // one fixed-order chain of IEEE double ops from the exact moments,
    // written as the SAME expression text in Spark and the oracle, so
    // the doubles hash-match. NULL rows are excluded up front (one
    // listwise filter keeps all three columns on the same n).
    OpQuery("q183_exact_corr",
      (s, d) => {
        val l = ld(s, d, "lineitem")
          .filter(col("l_returnflag").isNotNull && col("l_quantity").isNotNull &&
            col("l_extendedprice").isNotNull && col("l_discount").isNotNull)
          .select(col("l_returnflag"),
            col("l_quantity").cast(DecimalType(18, 2)).as("x1"),
            col("l_extendedprice").cast(DecimalType(18, 2)).as("x2"),
            col("l_discount").cast(DecimalType(18, 2)).as("x3"))
        l.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum("x1").as("s1"), sum("x2").as("s2"), sum("x3").as("s3"),
            sum(col("x1") * col("x1")).as("s11"),
            sum(col("x2") * col("x2")).as("s22"),
            sum(col("x3") * col("x3")).as("s33"),
            sum(col("x1") * col("x2")).as("s12"),
            sum(col("x1") * col("x3")).as("s13"),
            sum(col("x2") * col("x3")).as("s23"))
          .select(col("l_returnflag"), col("n"), expr(
            """stack(3,
              'qty_price', CAST(s1 AS DOUBLE), CAST(s2 AS DOUBLE), CAST(s12 AS DOUBLE), CAST(s11 AS DOUBLE), CAST(s22 AS DOUBLE),
              'qty_disc',  CAST(s1 AS DOUBLE), CAST(s3 AS DOUBLE), CAST(s13 AS DOUBLE), CAST(s11 AS DOUBLE), CAST(s33 AS DOUBLE),
              'price_disc',CAST(s2 AS DOUBLE), CAST(s3 AS DOUBLE), CAST(s23 AS DOUBLE), CAST(s22 AS DOUBLE), CAST(s33 AS DOUBLE))
              AS (pair, sx, sy, sxy, sxx, syy)"""))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("cov_sample",
            expr("(nd * sxy - sx * sy) / (nd * (nd - 1.0))"))
          .withColumn("corr", expr(
            "(nd * sxy - sx * sy) / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))"))
          .select("l_returnflag", "pair", "n", "cov_sample", "corr")
          .orderBy("l_returnflag", "pair")
      },
      Some("""WITH b AS (SELECT l_returnflag,
            CAST(l_quantity AS DECIMAL(18,2)) AS x1,
            CAST(l_extendedprice AS DECIMAL(18,2)) AS x2,
            CAST(l_discount AS DECIMAL(18,2)) AS x3
          FROM lineitem
          WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
            AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
        m AS (SELECT l_returnflag, count(*) AS n,
            sum(x1) AS s1, sum(x2) AS s2, sum(x3) AS s3,
            sum(x1*x1) AS s11, sum(x2*x2) AS s22, sum(x3*x3) AS s33,
            sum(x1*x2) AS s12, sum(x1*x3) AS s13, sum(x2*x3) AS s23
          FROM b GROUP BY l_returnflag),
        p AS (
          SELECT l_returnflag, n, 'qty_price' AS pair,
            CAST(s1 AS DOUBLE) AS sx, CAST(s2 AS DOUBLE) AS sy, CAST(s12 AS DOUBLE) AS sxy,
            CAST(s11 AS DOUBLE) AS sxx, CAST(s22 AS DOUBLE) AS syy FROM m
          UNION ALL
          SELECT l_returnflag, n, 'qty_disc',
            CAST(s1 AS DOUBLE), CAST(s3 AS DOUBLE), CAST(s13 AS DOUBLE),
            CAST(s11 AS DOUBLE), CAST(s33 AS DOUBLE) FROM m
          UNION ALL
          SELECT l_returnflag, n, 'price_disc',
            CAST(s2 AS DOUBLE), CAST(s3 AS DOUBLE), CAST(s23 AS DOUBLE),
            CAST(s22 AS DOUBLE), CAST(s33 AS DOUBLE) FROM m)
        SELECT l_returnflag, pair, n,
          (nd * sxy - sx * sy) / (nd * (nd - 1.0)) AS cov_sample,
          (nd * sxy - sx * sy) / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)) AS corr
        FROM (SELECT *, CAST(n AS DOUBLE) AS nd FROM p) t
        ORDER BY l_returnflag, pair"""))
  ,

    OpQuery("q199_pareto_front",
      // PARETO FRONT (skyline, Börzsönyi et al. ICDE 2001): the orders
      // that are not strictly dominated on (maximize o_totalprice,
      // minimize o_orderdate) — "no other order is at least as valuable
      // AND at least as early, and better on one axis". Two-phase
      // distributed skyline: each partition computes its LOCAL front with
      // an O(n·s) dominance scan (s = running front size — tiny for
      // anti-correlated-free data, O(log n) expected per dimension pair),
      // because local non-membership is conclusive: a point dominated
      // within its partition is dominated globally. The union of local
      // fronts (≤ partitions × s rows, never O(table)) then takes one
      // final scan. The output set is path- and layout-independent — the
      // skyline is a pure function of the data — so the oracle is the
      // textbook NOT EXISTS dominance query.
      (s, d) => {
        val o = ld(s, d, "orders")
          .filter(col("o_totalprice").isNotNull && col("o_orderdate").isNotNull)
        paretoFront(o, idCol = "o_orderkey",
          maxCols = Seq(col("o_totalprice")),
          minCols = Seq(unix_micros(col("o_orderdate").cast("timestamp")).cast("double")))
          .join(o.select("o_orderkey", "o_totalprice", "o_orderdate"), Seq("o_orderkey"))
          .select("o_orderkey", "o_totalprice", "o_orderdate")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice, o_orderdate FROM orders o
        WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM orders b
            WHERE b.o_totalprice IS NOT NULL AND b.o_orderdate IS NOT NULL
              AND b.o_totalprice >= o.o_totalprice AND b.o_orderdate <= o.o_orderdate
              AND (b.o_totalprice > o.o_totalprice OR b.o_orderdate < o.o_orderdate))
        ORDER BY o_orderkey"""))
  )

  /** Distributed PARETO FRONT over d criteria, all normalized to
    * "maximize" (minCols are negated). Phase 1: per-partition dominance
    * scan keeps only the partition's LOCAL skyline — sound pruning,
    * because dominance is transitive: a point dominated inside its
    * partition is dominated globally (by its dominator, or by whatever
    * dominated that). Phase 2: the union of local fronts (bounded by
    * partitions × local-front size, never O(table)) collapses to one
    * partition for the identical scan. Strict dominance: ≥ on every axis
    * AND > on at least one — exact criterion ties all survive together.
    * The skyline is a pure function of the data, so the result is
    * partitioning- and order-independent. Returns one `idCol` row per
    * front member. */
  def paretoFront(df: org.apache.spark.sql.DataFrame, idCol: String,
      maxCols: Seq[org.apache.spark.sql.Column],
      minCols: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val crit: Seq[org.apache.spark.sql.Column] =
      maxCols.map(_.cast("double")) ++ minCols.map(c => -c.cast("double"))
    def dominates(a: Seq[Double], b: Seq[Double]): Boolean = {
      var ge = true; var gt = false; var i = 0
      while (i < a.length && ge) {
        if (a(i) < b(i)) ge = false else if (a(i) > b(i)) gt = true
        i += 1
      }
      ge && gt
    }
    def scan(it: Iterator[(Long, Seq[Double])]): Iterator[(Long, Seq[Double])] = {
      val front = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Double])]
      it.foreach { p =>
        if (!front.exists(q => dominates(q._2, p._2))) {
          var i = 0
          while (i < front.length) {
            if (dominates(p._2, front(i)._2)) front.remove(i) else i += 1
          }
          front += p
        }
      }
      front.iterator
    }
    val typed = df.select(col(idCol).cast("long"), array(crit: _*))
      .as[(Long, Seq[Double])]
    typed.mapPartitions(scan)         // phase 1: local fronts
      .repartition(1).mapPartitions(scan) // phase 2: final scan over the union
      .map(_._1).toDF(idCol)
  }
}
