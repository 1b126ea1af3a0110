package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANTI-ENTROPY between logical replicas — the Dynamo/Cassandra repair
  * loop re-expressed for lake tables: detect WHERE two replicas diverge by
  * comparing O(leaves) digests, then ship ONLY the diverged key ranges.
  * The digest tree has one level (leaves ≡ Merkle leaves; the root is the
  * leaf-map equality check): each leaf is a key-hash residue class, its
  * digest the (row count, XOR fold of per-row hashes) over the
  * replica's RESOLVED live rows — a commutative fold, so it is independent
  * of file layout, bucket count, row order, and compaction history, which
  * is exactly what lets two replicas with DIFFERENT physical layouts
  * compare states without a row-level join.
  *
  * Scale shape: digesting is one scan + one tiny aggregate per replica
  * (at 100 TB the digests would ride each commit incrementally — XOR is
  * self-inverse, so a delta updates a leaf by folding in exactly the rows
  * it added and removed); comparison is
  * O(leaves) on the driver; repair reads only the diverged leaves' rows.
  * Leaves are chosen as a MULTIPLE of each side's bucket count, so a leaf
  * maps to exactly one physical bucket on both sides (`leaf mod B`) and
  * the repair scans are structurally pruned to the diverged buckets.
  *
  * Repair semantics: for each diverged leaf the source's live rows ship
  * at their ORIGINAL sequences (stale destination rows lose the LWW fold;
  * ties with already-correct rows are benign — the q81 overlap rule), and
  * destination keys ABSENT on the source get tombstones at a fresh
  * sequence (the missed-delete case Merkle repair must handle). One
  * fenced epoch per repair run — re-running a completed repair is a
  * no-op.
  *
  * CONTRACT: the destination is a FOLLOWER — its state is some subset of
  * the source's history (missed hops, lost chunks). A rogue LOCAL write
  * on the follower that outranks the source's sequence (e.g. a manual
  * DML) is a different failure: detection still works (digests differ),
  * but convergence needs a fresh-sequence overwrite, not an
  * original-sequence merge — run repair, re-digest, and escalate to a
  * [[Purge]]/rewrite if the leaf stays diverged. */
object AntiEntropy {

  /** Per-row content hash over the visible columns + the row's sequence —
    * the sequence matters: two replicas agreeing on values but not on
    * which version produced them are NOT converged (a later feed would
    * order differently). */
  private def rowHash(snap: IceLite.Snapshot): org.apache.spark.sql.Column = {
    val cols = snap.currentSchema.filterNot(_.hidden).map(c => col(c.name)) :+
      col(IceLite.SeqCol.name)
    xxhash64(cols: _*)
  }

  private def leafCol(snap: IceLite.Snapshot, leaves: Int) =
    pmod(xxhash64(snap.keyCols.map(col): _*), lit(leaves.toLong)).cast("int")

  /** Resolved live rows + hidden seq of `dir`, optionally pruned to the
    * physical buckets hosting `onlyLeaves`. */
  private def liveRows(spark: SparkSession, snap: IceLite.Snapshot,
      leaves: Int, onlyLeaves: Option[Set[Int]]): DataFrame = {
    val df = onlyLeaves match {
      case Some(ls) if leaves % snap.buckets == 0 =>
        val buckets = ls.map(_ % snap.buckets)
        IceLite.read(spark, snap, f => buckets(f.bucket), includeHidden = true)
      case _ => IceLite.read(spark, snap, includeHidden = true)
    }
    val live = df.filter(!coalesce(col(IceLite.DelCol.name), lit(false)))
    onlyLeaves match {
      case Some(ls) => live.filter(leafCol(snap, leaves).isin(ls.toSeq: _*))
      case None => live
    }
  }

  /** leaf → (live rows, xxhash64 XOR fold). Missing leaves are empty.
    * XOR (not sum): closed on Long under ANSI arithmetic, commutative,
    * and self-inverse — a replica's digest updates incrementally by
    * XOR-ing exactly the rows a delta added and removed. */
  def leafDigests(spark: SparkSession, dir: String, leaves: Int): Map[Int, (Long, Long)] = {
    val snap = IceLite.load(dir)
    liveRows(spark, snap, leaves, None)
      .withColumn("__h", rowHash(snap))
      .groupBy(leafCol(snap, leaves).as("leaf"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(__h)").as("h"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  /** INCREMENTAL digest maintenance: fold one [[Cdf.rowVersionLedger]]
    * window into an existing leaf-digest map WITHOUT rescanning the table
    * — O(changes), the property the module doc promises at 100 TB. Every
    * ledger row is a (values, seq) row VERSION entering or leaving the
    * live set; XOR is self-inverse, so leaving versions cancel exactly
    * the contribution [[leafDigests]] once folded in. The result must be
    * BIT-EQUAL to a recomputed digest of the new snapshot (gated, q151). */
  def applyVersionLedger(spark: SparkSession, digests: Map[Int, (Long, Long)],
      ledger: DataFrame, snap: IceLite.Snapshot, leaves: Int): Map[Int, (Long, Long)] = {
    val visible = snap.currentSchema.filterNot(_.hidden).map(c => col(c.name))
    val h = xxhash64(visible :+ col("seq"): _*)
    val sign = when(col("change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val deltas = ledger
      .withColumn("__leaf", leafCol(snap, leaves))
      .withColumn("__h", h).withColumn("__sign", sign)
      .groupBy("__leaf")
      .agg(expr("bit_xor(__h)").as("hx"), sum(col("__sign")).as("dn"))
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getLong(1))).toMap
    (digests.keySet ++ deltas.keySet).flatMap { l =>
      val (n0, h0) = digests.getOrElse(l, (0L, 0L))
      val (dn, hx) = deltas.getOrElse(l, (0L, 0L))
      val merged = (n0 + dn, h0 ^ hx)
      if (merged._1 == 0L) None else Some(l -> merged)
    }.toMap
  }

  /** The leaves on which two replicas disagree (either side's missing
    * leaf counts as empty). */
  def divergedLeaves(a: Map[Int, (Long, Long)], b: Map[Int, (Long, Long)]): Set[Int] =
    (a.keySet ++ b.keySet).filter(l =>
      a.getOrElse(l, (0L, 0L)) != b.getOrElse(l, (0L, 0L)))

  final case class RepairStats(leaves: Int, upserts: Long, deletes: Long,
      applied: Boolean)

  /** Repair `dstDir` from `srcDir` on exactly `diverged` leaves: source
    * rows at original sequences + tombstones for destination-extra keys,
    * one fenced epoch. Both scans are bucket-pruned via the leaf→bucket
    * alignment when `leaves` is a multiple of the side's bucket count.
    * Counts come from the merge itself — a fenced-out re-run reports
    * `applied = false` with zero rows shipped. */
  def repairLeaves(spark: SparkSession, srcDir: String, dstDir: String,
      diverged: Set[Int], leaves: Int, epochId: String): RepairStats = {
    require(diverged.nonEmpty, "nothing to repair")
    val src = IceLite.load(srcDir)
    val dst = IceLite.load(dstDir)
    require(src.keyCols == dst.keyCols, "replicas must share the key")
    val dataCols = src.currentSchema.filterNot(_.hidden).map(_.name)
    val srcRows = liveRows(spark, src, leaves, Some(diverged))
    val dstRows = liveRows(spark, dst, leaves, Some(diverged))
    val extra = dstRows.select(dst.keyCols.map(col): _*)
      .join(srcRows.select(src.keyCols.map(col): _*), src.keyCols, "left_anti")
    val delSeq = math.max(src.maxSeq, dst.maxSeq) + 1
    val ups = srcRows.select(
      dataCols.map(col) :+ col(IceLite.SeqCol.name).as("__sq") :+
        lit("UPSERT").as("__op"): _*)
    val dels = extra.select(
      dataCols.map(c => (if (dst.keyCols.contains(c)) col(c)
        else lit(null).cast(src.currentSchema.find(_.name == c).get.sparkType))
        .as(c)) :+ lit(delSeq).as("__sq") :+ lit("DELETE").as("__op"): _*)
    val pinned = ups.unionByName(dels).select(
      graft.cdc.Replay.pinnedDataCols(dataCols) ++
        Seq(col("__sq"), col("__op")): _*)
    val st = Merge.mergeEpoch(spark, dstDir, pinned, "__sq", "__op", epochId)
    if (st.applied) RepairStats(diverged.size, st.upserts, st.deletes, applied = true)
    else RepairStats(diverged.size, 0L, 0L, applied = false)
  }
}
