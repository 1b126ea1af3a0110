package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.ld

/** Iterative graph analytics over relationship graphs derived from the
  * warehouse tables — the centrality/ranking primitive corpus-curation
  * pipelines use to weight sources (the public web-scale precedent:
  * link-graph PageRank as a crawl-quality prior). Complements the
  * pointer-doubling connected components in [[DedupOps]]: CC answers
  * "which rows are the same thing", PageRank answers "which nodes matter".
  *
  * The reference (a per-record NiFi protobuf codec) has no graph surface;
  * this extends the engine's derived-pipeline layer.
  */
object GraphOps {

  /** Initial rank per node. INTEGER-EXACT scoring (the q97 pattern): ranks
    * stay BIGINT throughout — per-edge contribution is `r div deg` and the
    * damping step is `(15·BASE + 85·inflow) div 100`, all positive-operand
    * floor divisions that Spark (`div`) and DuckDB (`//`) define
    * identically — so the oracle hash-matches bit for bit. A float
    * PageRank would hostage the gate to summation order.
    *
    * OVERFLOW BOUND: worst case concentrates the whole mass N·base on one
    * node, and the damping step multiplies inflow by 85 — so base is
    * capped at `MassCap / N` (N = node count), keeping 85·inflow ≤
    * 85·MassCap ≈ 7.7e18 < Long.Max with full headroom. Spark's non-ANSI
    * Long arithmetic would WRAP silently past that while DuckDB's HUGEINT
    * sum would not — the cap is what keeps the two engines (and the
    * answer) exact at any graph size, not just toy ones. At ≤ 90k nodes
    * the cap leaves base at its nominal 1e12. */
  val Base = 1000000000000L
  val MassCap = 90000000000000000L // 9e16

  /** The adaptive per-node initial rank for an `n`-node graph. */
  def baseFor(n: Long): Long = math.min(Base, MassCap / math.max(1L, n))

  /** `iters` damped PageRank sweeps over a directed edge list (src, dst).
    * Every node must have out-degree ≥ 1 (callers pass symmetrized edges).
    *
    * Scale shape: one shuffle per iteration (the groupBy(dst) that sums
    * contributions) plus the contribution join partitioned the same way —
    * the canonical iterative-join plan. The edge list and degree table are
    * computed ONCE and localCheckpointed as reduced projections (the q18
    * pattern for a stage consumed `iters` times — without it every
    * iteration re-derives the edge list and the plan deepens
    * exponentially). At 100 TB: edges pre-bucketed by src make the
    * contribution join co-located; the per-iteration shuffle carries one
    * (node, rank) row per node, not the edge list. */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    val base = baseFor(deg.count()) // deg is checkpointed: count is cheap
    var r = deg.select(col("src").as("node"), lit(base).as("r"))
    for (_ <- 1 to iters) {
      val contrib = e.join(r, e("src") === r("node")).join(deg, "src")
        .select(col("dst"), expr("r div deg").as("c"))
      r = contrib.groupBy("dst")
        .agg(sum(col("c")).as("inflow"))
        .select(col("dst").as("node"),
          expr(s"(${15 * base}L + 85L * inflow) div 100").as("r"))
    }
    r
  }

  /** FRONTIER BFS — shortest hop distance (≤ `k`) from a seed set over a
    * directed edge list. Each sweep expands ONLY the newest frontier (the
    * nodes first reached last sweep): in an unweighted graph the first
    * arrival IS the shortest distance, so settled nodes never re-enter the
    * join — per-iteration cost is O(edges out of the frontier), not
    * O(edges × iterations), the property that keeps k-hop queries usable
    * on a 100 TB link graph where hop-2 frontiers already dominate. One
    * shuffle per sweep (the expansion join + anti-join against settled
    * nodes, both keyed on node); plans stay shallow via localCheckpoint
    * (the pageRank pattern). Output: (node, dist) for every node within
    * `k` hops, dist exact. */
  def kHopDistances(edges: DataFrame, seeds: DataFrame, k: Int,
      pin: Boolean = true): DataFrame = {
    def ckpt(df: DataFrame): DataFrame = if (pin) df.localCheckpoint() else df
    val e = ckpt(edges.select(col("src").cast("long"), col("dst").cast("long")))
    var settled = ckpt(seeds.select(col("node").cast("long"), lit(0L).as("dist"))
      .distinct())
    var frontier = settled
    for (i <- 1 to k) {
      val next = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
        .withColumn("dist", lit(i.toLong))
      frontier = ckpt(next.join(settled, Seq("node"), "left_anti"))
      settled = ckpt(settled.unionByName(frontier))
    }
    settled
  }

  /** Un-pinned one-sweep BFS plan for graft.Explain (localCheckpoint would
    * explain as a bare RDD scan): seeds → one frontier expansion. */
  private[graft] def q147Plan(s: SparkSession, d: String): DataFrame = {
    val edges = ld(s, d, "orders").select("o_orderkey", "o_custkey")
      .join(ld(s, d, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val seeds = edges.select(col("src").as("node")).distinct().orderBy("node").limit(5)
    kHopDistances(edges, seeds, k = 1, pin = false)
  }

  val queries: Seq[OpQuery] = Seq(

    OpQuery("q101_pagerank",
      // 3 damped sweeps over the symmetrized customer↔supplier trade
      // graph (an edge per distinct (custkey, suppkey) that traded, both
      // directions, so no dangling nodes), top-20 nodes. Node ids disjoint
      // by parity: customer 2k, supplier 2k+1.
      (s, d) => {
        val edges = ld(s, d, "orders").select("o_orderkey", "o_custkey")
          .join(ld(s, d, "lineitem").select("l_orderkey", "l_suppkey"),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
        val both = edges.union(
          edges.select(col("dst").as("src"), col("src").as("dst")))
        pageRank(both, iters = 3)
          .orderBy(col("r").desc, col("node"))
          .select(col("node"), col("r").as("pr"))
          .limit(20)
      },
      Some(s"""WITH edges AS (
          SELECT DISTINCT o_custkey*2 AS src, l_suppkey*2+1 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        bidir AS (SELECT src, dst FROM edges
                  UNION ALL SELECT dst, src FROM edges),
        deg AS (SELECT src, count(*) AS deg FROM bidir GROUP BY src),
        b AS (SELECT LEAST(CAST(${Base} AS BIGINT),
                           CAST(${MassCap} AS BIGINT) // count(*)) AS base FROM deg),
        r0 AS (SELECT src AS node, b.base AS r FROM deg, b),
        r1 AS (SELECT e.dst AS node, (15*b.base + 85*sum(r0.r // d.deg)) // 100 AS r
               FROM bidir e JOIN r0 ON e.src = r0.node
               JOIN deg d ON e.src = d.src, b GROUP BY e.dst, b.base),
        r2 AS (SELECT e.dst AS node, (15*b.base + 85*sum(r1.r // d.deg)) // 100 AS r
               FROM bidir e JOIN r1 ON e.src = r1.node
               JOIN deg d ON e.src = d.src, b GROUP BY e.dst, b.base),
        r3 AS (SELECT e.dst AS node, (15*b.base + 85*sum(r2.r // d.deg)) // 100 AS r
               FROM bidir e JOIN r2 ON e.src = r2.node
               JOIN deg d ON e.src = d.src, b GROUP BY e.dst, b.base)
        SELECT node, CAST(r AS BIGINT) AS pr FROM r3 ORDER BY r DESC, node LIMIT 20""")),

    OpQuery("q127_triangle_count",
      // PER-NODE TRIANGLE COUNTS with degree orientation — the classic
      // skew-proof formulation: orient every undirected edge from the
      // lower-(degree, id) endpoint to the higher, enumerate wedges only
      // at each edge's ORIENTED tail (fan-out bounded by oriented
      // out-degree ≈ O(√m) even when raw degrees are power-law), close
      // them with one semi-join back to the oriented edge list. A naive
      // wedge count at raw high-degree hubs is the quadratic blow-up this
      // avoids at 100 TB. All-integer output; the oracle counts the same
      // triangles by brute-force canonical a<b three-way join.
      (s, d) => triangleCounts(coPartEdges(s, d)).orderBy("node"),
      Some("""WITH el AS (
          SELECT DISTINCT least(l_partkey % 200, l_suppkey % 200) AS a,
                          greatest(l_partkey % 200, l_suppkey % 200) AS b
          FROM lineitem WHERE l_partkey % 200 <> l_suppkey % 200),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM el e1 JOIN el e2 ON e2.a = e1.a AND e2.b > e1.b
          JOIN el e3 ON e3.a = e1.b AND e3.b = e2.b)
        SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
          SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri) u
        GROUP BY node ORDER BY node""")),

    OpQuery("q147_khop_bfs",
      // K-HOP REACHABILITY: exact shortest hop distance (≤ 3) from the 5
      // lowest-id nodes of the symmetrized trade graph, via frontier BFS —
      // settled nodes never re-enter the expansion join (first arrival =
      // shortest in an unweighted graph), so sweep i costs O(frontier_i's
      // out-edges), the only shape that survives hop-2 frontier explosion
      // on a web-scale link graph. The oracle recomputes distances with a
      // genuine WITH RECURSIVE BFS + min-fold; a premature settle, lost
      // frontier node, or off-by-one hop breaks equality.
      (s, d) => {
        val edges = ld(s, d, "orders").select("o_orderkey", "o_custkey")
          .join(ld(s, d, "lineitem").select("l_orderkey", "l_suppkey"),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
        val both = edges.union(
          edges.select(col("dst").as("src"), col("src").as("dst")))
        val seeds = both.select(col("src").as("node")).distinct()
          .orderBy("node").limit(5)
        val dist = kHopDistances(both, seeds, k = 3)
        val byHop = dist.groupBy("dist").count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        require(byHop.getOrElse(0L, 0L) == 5L, s"5 seeds at dist 0: $byHop")
        require(byHop.getOrElse(1L, 0L) > 0, s"gate is vacuous: $byHop")
        byHop.foreach { case (h, n) =>
          CdcQueries.putMetric("q147", s"nodes_at_hop_$h", n.toDouble)
        }
        dist.orderBy("node")
      },
      Some("""WITH RECURSIVE bidir AS (
          SELECT src, dst FROM (
            SELECT DISTINCT o_custkey*2 AS src, l_suppkey*2+1 AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey) e
          UNION ALL
          SELECT dst, src FROM (
            SELECT DISTINCT o_custkey*2 AS src, l_suppkey*2+1 AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey) e),
        seeds AS (SELECT DISTINCT src AS node FROM bidir ORDER BY node LIMIT 5),
        bfs(node, dist) AS (
          SELECT node, 0 FROM seeds
          UNION
          SELECT e.dst, b.dist + 1 FROM bfs b JOIN bidir e ON e.src = b.node
          WHERE b.dist < 3)
        SELECT node, CAST(min(dist) AS BIGINT) AS dist
        FROM bfs GROUP BY node ORDER BY node"""))
  )

  /** Un-pinned q127 plan for graft.Explain (localCheckpoint would explain
    * as a bare RDD scan). */
  private[graft] def q127Plan(s: SparkSession, d: String): DataFrame =
    triangleCounts(coPartEdges(s, d), pin = false)

  /** Deterministic co-occurrence graph: residue classes of part and
    * supplier keys that appear on the same lineitem, canonical a<b. */
  private def coPartEdges(s: SparkSession, d: String): DataFrame = {
    val pa = col("l_partkey") % 200
    val pb = col("l_suppkey") % 200
    ld(s, d, "lineitem").filter(pa =!= pb)
      .select(least(pa, pb).cast("long").as("a"),
        greatest(pa, pb).cast("long").as("b"))
      .distinct()
  }

  /** (node, triangles) for an undirected canonical edge list (a<b, no
    * self-loops, distinct). Wedge enumeration runs at oriented tails
    * only; the closing edge check is a LEFT SEMI join so the planner
    * never materializes the (wedge × edge) product. */
  def triangleCounts(edges: DataFrame, pin: Boolean = true): DataFrame = {
    def ckpt(df: DataFrame): DataFrame = if (pin) df.localCheckpoint() else df
    val e = ckpt(edges.select(col("a"), col("b")))
    // total order (degree, node): rank = deg·2^32 + node, collision-free
    // for node ids < 2^32 and degrees < 2^31
    val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
      .select(col("n"), (col("deg") * 4294967296L + col("n")).as("rank"))
    val oriented = e
      .join(deg.select(col("n").as("a"), col("rank").as("ra")), "a")
      .join(deg.select(col("n").as("b"), col("rank").as("rb")), "b")
      .select(
        when(col("ra") < col("rb"), col("a")).otherwise(col("b")).as("u"),
        when(col("ra") < col("rb"), col("b")).otherwise(col("a")).as("v"),
        when(col("ra") < col("rb"), col("rb")).otherwise(col("ra")).as("rv"))
    val orientedPinned = ckpt(oriented)
    // wedges (u → v, u → w) with rv < rw: each triangle yields exactly one
    // wedge whose closing edge is oriented v → w under the same order
    val o1 = orientedPinned.select(col("u"), col("v"), col("rv"))
    val o2 = orientedPinned.select(col("u"), col("v").as("w"), col("rv").as("rw"))
    val wedges = o1.join(o2, Seq("u")).filter(col("rv") < col("rw"))
      .select(col("u"), col("v"), col("w"))
    val closed = wedges.join(
      orientedPinned.select(col("u").as("v"), col("v").as("w")),
      Seq("v", "w"), "left_semi")
    closed.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }
}
