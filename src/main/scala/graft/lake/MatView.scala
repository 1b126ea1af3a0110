package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** INCREMENTAL MATERIALIZED VIEW over a CDC-maintained IceLite table — the
  * canonical change-feed consumer. The view is a grouped aggregate
  * (`GROUP BY groupCols` with `count(*)` plus integral `sum(expr)`s) stored
  * as its own IceLite table keyed by the group columns, maintained by
  * RETRACTION from the source's change feed instead of recomputation:
  *
  *   refresh cost = O(keys changed since last refresh), not O(source).
  *
  * At 10^10 source rows with a per-epoch delta of 10^5 keys, recomputing a
  * grouped aggregate is a full shuffle of the table; this refresh reads the
  * window's delta files ([[IceLite.changes]]), the pre-image of ONLY the
  * changed keys (bucket-pruned + semi-join), and the current view rows of
  * ONLY the touched groups — three O(delta)-shaped reads and one tiny merge.
  *
  * Exactly-once: the refresh's MERGE commit carries epoch id
  * `src-<toVersion>` — the view's own epoch ledger IS the refresh watermark
  * (atomic with the data; a replayed refresh fences as a no-op, and
  * `lastApplied` is re-derived from the ledger on every call, so there is no
  * separate watermark file to get out of sync).
  *
  * When the last-applied source snapshot has been EXPIRED (aggressive
  * retention), refresh falls back to a FULL REBUILD: recompute the aggregate
  * from the current source, diff against the view (null-safe full outer
  * join), and merge only the differing groups — O(source) for that one
  * refresh, correct forever after, same epoch fencing.
  *
  * Caveats (documented, not silent): sum expressions must be integral (sums
  * are BIGINT — cross-engine exact, no float drift); a group column value of
  * NULL groups like SQL (null-safe join internally); dropping a source
  * column the view groups or sums over fails the refresh loudly. */
object MatView {

  /** What the view computes: `GROUP BY groupCols` with `count(*) AS cnt`
    * and, per (outCol, sqlExpr), `sum(CAST(sqlExpr AS BIGINT)) AS outCol`. */
  final case class Spec(groupCols: Vector[String], sums: Vector[(String, String)])

  final case class RefreshStats(fromVersion: Int, toVersion: Int,
      applied: Boolean, changedKeys: Long, touchedGroups: Long)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def specPath(mvDir: String) = Paths.get(mvDir, "mv.json")

  private def writeSpec(mvDir: String, spec: Spec): Unit = {
    val root = mapper.createObjectNode()
    val g = root.putArray("groupCols"); spec.groupCols.foreach(g.add)
    val sm = root.putArray("sums")
    spec.sums.foreach { case (o, e) => val a = sm.addArray(); a.add(o); a.add(e) }
    Files.write(specPath(mvDir), mapper.writeValueAsBytes(root))
  }

  def loadSpec(mvDir: String): Spec = {
    import scala.jdk.CollectionConverters._
    val n = mapper.readTree(Files.readAllBytes(specPath(mvDir)))
    Spec(
      n.get("groupCols").elements().asScala.map(_.asText()).toVector,
      n.get("sums").elements().asScala.map(a =>
        (a.get(0).asText(), a.get(1).asText())).toVector)
  }

  /** Create the view table (empty; the first refresh backfills — from
    * version 0 the "delta" is the whole source, one initial full pass). */
  def create(srcDir: String, mvDir: String, spec: Spec,
      buckets: Int = 8): IceLite.Snapshot = {
    val src = IceLite.load(srcDir)
    val groupDefs = spec.groupCols.zipWithIndex.map { case (gc, i) =>
      val cd = src.currentSchema.find(_.name == gc).getOrElse(
        throw new IllegalArgumentException(s"no such source column: $gc"))
      require(!cd.hidden, s"cannot group by hidden column $gc")
      IceLite.ColDef(i + 1, gc, cd.dataType)
    }
    val k = spec.groupCols.length
    val aggDefs = IceLite.ColDef(k + 1, "cnt", "BIGINT") +:
      spec.sums.zipWithIndex.map { case ((o, _), i) =>
        require(o != "cnt" && !spec.groupCols.contains(o), s"sum name clash: $o")
        IceLite.ColDef(k + 2 + i, o, "BIGINT")
      }
    val snap = IceLite.create(mvDir,
      IceLite.withCdcCols(groupDefs ++ aggDefs), spec.groupCols, buckets)
    writeSpec(mvDir, spec)
    snap
  }

  /** Last source version this view has applied — the max `src-<N>` epoch in
    * the view's own ledger (0 when none: version 0 is the source's create). */
  def lastApplied(mv: IceLite.Snapshot): Int = {
    val led = mv.ledger
    val wm = led.watermarks.getOrElse("src", -1L)
    val rc = led.recent.getOrElse("src", Set.empty).foldLeft(-1L)(math.max)
    math.max(0L, math.max(wm, rc)).toInt
  }

  def read(spark: SparkSession, mvDir: String): DataFrame =
    IceLite.read(spark, IceLite.load(mvDir))

  /** Advance the view to the source's current version by retraction:
    *   delta(group) = Σ contributions(new state of changed keys)
    *                − Σ contributions(pre-image of changed keys)
    *   view(group) += delta(group); groups reaching cnt = 0 are DELETEd.
    * Idempotent (epoch-fenced) and atomic (one MERGE commit). */
  def refresh(spark: SparkSession, srcDir: String, mvDir: String): RefreshStats = {
    import spark.implicits._
    val spec = loadSpec(mvDir)
    val mvSnap = IceLite.load(mvDir)
    val srcSnap = IceLite.load(srcDir)
    val to = srcSnap.version
    val from = lastApplied(mvSnap)
    if (to <= from || mvSnap.hasEpoch(s"src-$to"))
      return RefreshStats(from, to, applied = false, 0, 0)
    spec.groupCols.foreach(c => require(srcSnap.currentSchema.exists(_.name == c),
      s"view groups by '$c' but the source no longer has it (dropped/renamed?)"))
    val fromSnap =
      try IceLite.loadVersion(srcDir, from)
      catch { case _: java.io.IOException =>
        // the last-applied snapshot was expired — retraction has no
        // pre-image to read, so rebuild from the current state instead
        return fullRefresh(spark, spec, srcSnap, mvSnap, mvDir, from, to)
      }
    val keyCols = srcSnap.keyCols

    // the window's change rows, folded to one NET row per changed key
    // (latest __seq wins — intermediate versions cancel out). O(delta);
    // localCheckpoint because three downstream reads branch from it.
    val wnd = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(IceLite.SeqCol.name).desc)
    val folded = IceLite.changes(spark, srcDir, from, to)
      .withColumn("__rn", row_number().over(wnd))
      .filter(col("__rn") === 1).drop("__rn")
      .localCheckpoint()
    // pre-image of the window's keys: driver-derived touched-bucket set
    // (bounded by the bucket count, never the corpus) prunes the scan
    // structurally; the semi-join then keeps only the window keys. Hidden
    // columns kept — the pre-image's __seq drives the LWW guard below and
    // its __del excludes tombstoned keys from retraction.
    val touched = folded
      .select(IceLite.bucketExpr(keyCols, fromSnap.buckets).as("__b"))
      .distinct().as[Int].collect().toSet
    val preAll = IceLite.read(spark, fromSnap, f => touched(f.bucket),
        includeHidden = true)
      .join(folded.select(keyCols.map(col): _*), keyCols, "left_semi")
      .localCheckpoint()

    // LWW GUARD: changes() deliberately feeds LATE events, including ones
    // whose seq LOSES to the stored pre-image (a late duplicate the table
    // absorbed without changing state — the q92 out-of-order contract). A
    // key whose window winner does not BEAT its pre-image's seq (upsert or
    // tombstone) left the source state untouched; applying it would
    // retract the real state and add the stale one, permanently skewing
    // the aggregates. Keep only true advances.
    val advanced = folded.join(
        preAll.select((keyCols.map(col) :+
          col(IceLite.SeqCol.name).as("__pre_seq")): _*),
        keyCols, "left_outer")
      .filter(col("__pre_seq").isNull ||
        col(IceLite.SeqCol.name) > col("__pre_seq"))
      .drop("__pre_seq")
      .localCheckpoint()
    val changedCnt = advanced.count()
    val newState = advanced.filter(!coalesce(col(IceLite.DelCol.name), lit(false)))
    val changedKeys = advanced.select(keyCols.map(col): _*)
    val oldState = preAll
      .filter(!coalesce(col(IceLite.DelCol.name), lit(false)))
      .join(changedKeys, keyCols, "left_semi")

    // signed contributions → net per-group delta
    def contrib(df: DataFrame, sign: Int): DataFrame = df.select(
      spec.groupCols.map(col) ++
        (lit(sign.toLong).as("__dc") +:
          spec.sums.map { case (o, e) =>
            (expr(e).cast("long") * sign).as(s"__d_$o") }): _*)
    val aggs = sum("__dc").as("__dc") +:
      spec.sums.map { case (o, _) => sum(s"__d_$o").as(s"__d_$o") }
    val delta0 = contrib(newState, 1).unionByName(contrib(oldState, -1))
      .groupBy(spec.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    // all-zero rows (updates that didn't move any aggregate) write nothing
    val delta = delta0.filter(
      ((col("__dc") =!= 0L) +:
        spec.sums.map { case (o, _) => col(s"__d_$o") =!= 0L })
        .reduce(_ || _))

    // current view rows for the touched groups only (same pruning shape),
    // null-safe join so a NULL group value behaves like SQL GROUP BY
    val mvTouched = delta
      .select(IceLite.bucketExpr(spec.groupCols, mvSnap.buckets).as("__b"))
      .distinct().as[Int].collect().toSet
    val mvOld = IceLite.read(spark, mvSnap, f => mvTouched(f.bucket))
    val cond = spec.groupCols.map(c => delta(c) <=> mvOld(c)).reduce(_ && _)
    val joined = delta.join(mvOld, cond, "left_outer")
    val newRows = joined.select(
      spec.groupCols.map(c => delta(c).as(c)) ++
        ((coalesce(mvOld("cnt"), lit(0L)) + col("__dc")).as("cnt") +:
          spec.sums.map { case (o, _) =>
            (coalesce(mvOld(o), lit(0L)) + col(s"__d_$o")).as(o) }): _*)
      .withColumn("__op", when(col("cnt") === 0L, "DELETE").otherwise("UPSERT"))
      .withColumn("__sq", lit(to.toLong))

    val stats = commitBatch(spark, mvSnap, mvDir, newRows, to)
    RefreshStats(from, to, stats.applied, changedCnt, stats.batchRows)
  }

  /** Field ids pinned from the view schema → Merge normalization is exact. */
  private def commitBatch(spark: SparkSession, mvSnap: IceLite.Snapshot,
      mvDir: String, newRows: DataFrame, to: Int): Merge.MergeStats = {
    val visible = mvSnap.currentSchema.filterNot(_.hidden)
    val batch = newRows.select(
      visible.map(cd => col(cd.name).as(cd.name,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("graft.fieldId", cd.id.toLong).build())) ++
        Seq(col("__sq"), col("__op")): _*)
    Merge.mergeEpoch(spark, mvDir, batch, "__sq", "__op", s"src-$to")
  }

  /** Retention fallback: the retraction window's pre-image is gone, so
    * recompute the aggregate from the CURRENT source, diff it against the
    * view (null-safe full outer join), and merge only the differing groups
    * — one O(source) pass, then incremental refreshes resume. Reported
    * `changedKeys` is the manifest row count actually re-read (the honest
    * cost signal; incremental refreshes report window keys instead). */
  private def fullRefresh(spark: SparkSession, spec: Spec,
      srcSnap: IceLite.Snapshot, mvSnap: IceLite.Snapshot,
      mvDir: String, from: Int, to: Int): RefreshStats = {
    val aggCols = count(lit(1)).as("cnt") +:
      spec.sums.map { case (o, e) => sum(expr(e).cast("long")).as(o) }
    val target = IceLite.read(spark, srcSnap)
      .groupBy(spec.groupCols.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val cur = IceLite.read(spark, mvSnap)
    val cond = spec.groupCols.map(c => target(c) <=> cur(c)).reduce(_ && _)
    val joined = target.join(cur, cond, "full_outer")
    val valCols = "cnt" +: spec.sums.map(_._1)
    val differs = valCols.map(o => !(target(o) <=> cur(o))).reduce(_ || _)
    val newRows = joined.filter(differs).select(
      spec.groupCols.map(c => coalesce(target(c), cur(c)).as(c)) ++
        valCols.map(o => coalesce(target(o), lit(0L)).as(o)): _*)
      .withColumn("__op", when(col("cnt") === 0L, "DELETE").otherwise("UPSERT"))
      .withColumn("__sq", lit(to.toLong))
    val stats = commitBatch(spark, mvSnap, mvDir, newRows, to)
    RefreshStats(from, to, stats.applied,
      srcSnap.files.map(_.rows).sum, stats.batchRows)
  }
}
