package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** INCREMENTALLY-MAINTAINED JOIN VIEW — the denormalization half of view
  * maintenance ([[MatView]] is the aggregate half): keep
  *
  *   OUT = F LEFT JOIN D ON F.j = D.key        (keyed by F's key)
  *
  * current from BOTH sides' change feeds instead of re-joining the world:
  *
  *   ΔF keys  → re-emit those fact rows joined against the CURRENT dim
  *              (fact deletes delete the view row);
  *   ΔD keys  → re-emit every CURRENT fact row whose join column hit a
  *              changed dim key (a dim delete degrades them to NULL dim
  *              columns — LEFT JOIN semantics, not row loss).
  *
  * Refresh cost is O(Δ) on the fact feed plus, when the dim moved, one
  * broadcast-semi-join pass over the fact table — and when the fact table
  * carries a BLOOM INDEX on the join column ([[IceLite.addBloomIndex]],
  * the q64 machinery) and the changed dim key set is small enough to
  * probe from the driver (≤ [[IndexProbeCap]]), even that pass is
  * bucket-pruned structurally: blooms have no false negatives, so probing
  * each changed key's bucket set is exhaustive. Larger dim deltas fall
  * back to the full scan (the honest bound — a probe set that big is a
  * rebuild, not a propagation). The dim's own read is always
  * bucket-pruned to the affected join keys. At 10^10 fact rows with a
  * daily dim tier change this is the difference between re-joining 10^10
  * rows and re-emitting the few million that reference the touched keys.
  *
  * Exactly-once: the single MERGE commit carries epoch
  * `fd-<vf·2^20 + vd>` — BOTH source versions ride one fenced number (the
  * pair is lexicographically monotone), so the view's own ledger is the
  * refresh watermark for both feeds at once and a replayed refresh is a
  * no-op. The batch seq uses the same encoding: later refreshes always
  * win LWW over earlier ones. */
object MatJoin {

  final case class Spec(joinCols: Vector[String], dimValueCols: Vector[String])

  final case class RefreshStats(fFrom: Int, fTo: Int, dFrom: Int, dTo: Int,
      applied: Boolean, recomputed: Long, deleted: Long,
      /** fact buckets the dim-propagation pass scanned (== the table's
        * bucket count unless the join-column bloom index pruned it). */
      factBucketsScanned: Int = 0)

  /** Largest changed-dim key set the refresh will probe through the fact's
    * join-column bloom index (driver-side, one bucket-set lookup per key);
    * beyond this the propagation falls back to the full fact pass. */
  val IndexProbeCap = 1024

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def specPath(outDir: String) = Paths.get(outDir, "mj.json")

  def loadSpec(outDir: String): Spec = {
    import scala.jdk.CollectionConverters._
    val n = mapper.readTree(Files.readAllBytes(specPath(outDir)))
    Spec(n.get("joinCols").elements().asScala.map(_.asText()).toVector,
      n.get("dimValueCols").elements().asScala.map(_.asText()).toVector)
  }

  /** Create the view table: the fact's visible columns followed by the
    * dim's value columns (its non-key columns), keyed by the fact's key.
    * Column names must not clash (the join columns are the fact's — the
    * dim's copy of the key is not duplicated). */
  def create(fDir: String, dDir: String, outDir: String,
      buckets: Int = 8): IceLite.Snapshot = {
    val f = IceLite.load(fDir)
    val d = IceLite.load(dDir)
    val joinCols = d.keyCols
    joinCols.foreach(j => require(f.currentSchema.exists(_.name == j),
      s"fact has no join column '$j'"))
    val fVisible = f.currentSchema.filterNot(_.hidden)
    val dValues = d.currentSchema.filterNot(_.hidden)
      .filterNot(c => joinCols.contains(c.name))
    dValues.foreach(c => require(!fVisible.exists(_.name == c.name),
      s"dim value column '${c.name}' clashes with a fact column"))
    val defs = fVisible.zipWithIndex.map { case (c, i) =>
      IceLite.ColDef(i + 1, c.name, c.dataType) } ++
      dValues.zipWithIndex.map { case (c, i) =>
        IceLite.ColDef(fVisible.length + i + 1, c.name, c.dataType) }
    val snap = IceLite.create(outDir, IceLite.withCdcCols(defs), f.keyCols, buckets)
    val root = mapper.createObjectNode()
    val jc = root.putArray("joinCols"); joinCols.foreach(jc.add)
    val dv = root.putArray("dimValueCols"); dValues.map(_.name).foreach(dv.add)
    Files.write(specPath(outDir), mapper.writeValueAsBytes(root))
    snap
  }

  /** Both last-applied source versions, decoded from the view's own
    * ledger (namespace `fd`, epoch = vf·2^20 + vd). */
  def lastApplied(out: IceLite.Snapshot): (Int, Int) = {
    val led = out.ledger
    val wm = led.watermarks.getOrElse("fd", -1L)
    val rc = led.recent.getOrElse("fd", Set.empty).foldLeft(-1L)(math.max)
    val e = math.max(-1L, math.max(wm, rc))
    if (e < 0) (0, 0) else ((e >> 20).toInt, (e & 0xFFFFF).toInt)
  }

  def read(spark: SparkSession, outDir: String): DataFrame =
    IceLite.read(spark, IceLite.load(outDir))

  /** Advance the view to both sources' current versions. */
  def refresh(spark: SparkSession, fDir: String, dDir: String,
      outDir: String): RefreshStats = {
    import spark.implicits._
    val spec = loadSpec(outDir)
    val outSnap = IceLite.load(outDir)
    val fSnap = IceLite.load(fDir)
    val dSnap = IceLite.load(dDir)
    val (vf0, vd0) = lastApplied(outSnap)
    val (vf1, vd1) = (fSnap.version, dSnap.version)
    require(vd1 < (1 << 20), s"dim version $vd1 exceeds the fence encoding")
    val enc = (vf1.toLong << 20) | vd1.toLong
    if ((vf1 <= vf0 && vd1 <= vd0) || outSnap.hasEpoch(s"fd-$enc"))
      return RefreshStats(vf0, vf1, vd0, vd1, applied = false, 0, 0)
    val fKeys = fSnap.keyCols
    val j = spec.joinCols

    // net fact change per key over the window (intermediate versions cancel)
    val wf = Window.partitionBy(fKeys.map(col): _*)
      .orderBy(col(IceLite.SeqCol.name).desc)
    val dF =
      (if (vf1 > vf0) IceLite.changes(spark, fDir, vf0, vf1)
       else IceLite.read(spark, fSnap, _ => false, includeHidden = true))
        .withColumn("__rn", row_number().over(wf))
        .filter(col("__rn") === 1).drop("__rn")
        .localCheckpoint()
    val dFLive = dF.filter(!coalesce(col(IceLite.DelCol.name), lit(false)))
    val dFDead = dF.filter(coalesce(col(IceLite.DelCol.name), lit(false)))

    // dim keys whose value changed → every CURRENT fact row referencing
    // them must re-emit (minus keys the fact feed already re-emits)
    val changedDimKeys =
      (if (vd1 > vd0) IceLite.changes(spark, dDir, vd0, vd1)
       else IceLite.read(spark, dSnap, _ => false, includeHidden = true))
        .select(j.map(col): _*).distinct().localCheckpoint()
    // the propagation scan: bloom-index-pruned when the fact table indexes
    // the (single) join column and the changed key set is probe-sized
    val factBuckets: Set[Int] =
      if (vd1 <= vd0) Set.empty // fact-only refresh: nothing to propagate
      else if (j.size == 1 && fSnap.indexedCols.contains(j.head)) {
        val probe = changedDimKeys.limit(IndexProbeCap + 1).collect()
        if (probe.length <= IndexProbeCap)
          probe.flatMap(r => IceLite.bucketsForValue(fSnap, j.head, r.get(0))).toSet
        else (0 until fSnap.buckets).toSet
      } else (0 until fSnap.buckets).toSet
    val fFromDim = IceLite.read(spark, fSnap, f => factBuckets(f.bucket))
      .join(broadcast(changedDimKeys), j, "left_semi")
      .join(dF.select(fKeys.map(col): _*), fKeys, "left_anti")

    val fVisibleCols = outSnap.currentSchema.filterNot(_.hidden)
      .map(_.name).filterNot(spec.dimValueCols.contains)
    val affected = dFLive.select(fVisibleCols.map(col): _*)
      .unionByName(fFromDim.select(fVisibleCols.map(col): _*))

    // CURRENT dim rows for exactly the affected join keys — bucket-pruned
    // (the affected keys' bucket set is bounded by the dim's bucket count)
    val touched = affected
      .select(IceLite.bucketExpr(j, dSnap.buckets).as("__b"))
      .distinct().as[Int].collect().toSet
    val dimNow = IceLite.read(spark, dSnap, f => touched(f.bucket))
      .select((j ++ spec.dimValueCols).map(col): _*)
    val upserts = affected.join(broadcast(dimNow), j.toSeq, "left_outer")
      .withColumn("__op", lit("UPSERT"))
    val outSchema = outSnap.currentSchema.filterNot(_.hidden)
    val deletes = dFDead.select(
      outSchema.map(c =>
        (if (fKeys.contains(c.name)) col(c.name)
         else lit(null).cast(c.sparkType)).as(c.name)): _*)
      .withColumn("__op", lit("DELETE"))
    // pin the batch: it previously executed its (fact-scan + joins) graph
    // once for the counts and AGAIN inside the merge; one materialization
    // serves both, and one groupBy replaces the two count jobs
    val batch0 = upserts.select(
        (outSchema.map(c => col(c.name)) :+ col("__op")): _*)
      .unionByName(deletes)
      .withColumn("__sq", lit(enc))
      .localCheckpoint()
    val byOp = batch0.groupBy("__op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nUp = byOp.getOrElse("UPSERT", 0L); val nDel = byOp.getOrElse("DELETE", 0L)
    if (nUp + nDel == 0) {
      // still advance the watermark: a no-op version bump (compaction,
      // expire, a window whose changes cancel out) must not pin
      // lastApplied, or every later refresh re-scans an ever-growing
      // [vf0, current] change window just to rediscover emptiness. An
      // empty fence commit is metadata-only — no files, no data IO.
      IceLite.commit(outDir, outSnap, IceLite.CommitDelta(
        s"fd-$enc", Set.empty, Vector.empty, outSnap.currentSchema))
      return RefreshStats(vf0, vf1, vd0, vd1, applied = false, 0, 0)
    }
    val pinned = batch0.select(
      outSchema.map(cd => col(cd.name).as(cd.name,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong(graft.decode.SparkSchema.FieldIdKey, cd.id.toLong).build())) ++
        Seq(col("__sq"), col("__op")): _*)
    val st = Merge.mergeEpoch(spark, outDir, pinned, "__sq", "__op", s"fd-$enc",
      batchRowsHint = Some(nUp + nDel))
    RefreshStats(vf0, vf1, vd0, vd1, st.applied, nUp, nDel, factBuckets.size)
  }
}
