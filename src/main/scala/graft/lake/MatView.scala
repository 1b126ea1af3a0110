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
    * and, per (outCol, sqlExpr), `sum(CAST(sqlExpr AS BIGINT)) AS outCol`,
    * plus optional `min(...)`/`max(...)` columns (integral, NULLs ignored
    * like SQL).
    *
    * count/sum are SELF-MAINTAINABLE (Gupta & Mumick's distinction): a
    * retraction delta fixes them without touching the base table. min/max
    * are NOT — deleting the row that achieved the extremum leaves the new
    * extremum unknown. The refresh therefore splits touched groups: groups
    * where no removed row THREATENS a stored extremum stay on the cheap
    * path (`least`/`greatest` of stored and inserted values); threatened
    * groups are RECOMPUTED from the source head, pruned to exactly those
    * groups (value-bloom bucket pruning when the group column is indexed —
    * the q64 machinery — else a filtered scan). */
  final case class Spec(groupCols: Vector[String], sums: Vector[(String, String)],
      mins: Vector[(String, String)] = Vector.empty,
      maxs: Vector[(String, String)] = Vector.empty)

  final case class RefreshStats(fromVersion: Int, toVersion: Int,
      applied: Boolean, changedKeys: Long, touchedGroups: Long,
      /** groups whose min/max was recomputed from the head this refresh
        * (0 when the view has no extrema or nothing was threatened) —
        * the honest cost signal of the non-self-maintainable path. */
      recomputedGroups: Long = 0L)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def specPath(mvDir: String) = Paths.get(mvDir, "mv.json")

  private def writeSpec(mvDir: String, spec: Spec): Unit = {
    val root = mapper.createObjectNode()
    val g = root.putArray("groupCols"); spec.groupCols.foreach(g.add)
    val sm = root.putArray("sums")
    spec.sums.foreach { case (o, e) => val a = sm.addArray(); a.add(o); a.add(e) }
    val mn = root.putArray("mins")
    spec.mins.foreach { case (o, e) => val a = mn.addArray(); a.add(o); a.add(e) }
    val mx = root.putArray("maxs")
    spec.maxs.foreach { case (o, e) => val a = mx.addArray(); a.add(o); a.add(e) }
    Files.write(specPath(mvDir), mapper.writeValueAsBytes(root))
  }

  def loadSpec(mvDir: String): Spec = {
    import scala.jdk.CollectionConverters._
    val n = mapper.readTree(Files.readAllBytes(specPath(mvDir)))
    def pairs(field: String): Vector[(String, String)] =
      Option(n.get(field)).map(_.elements().asScala.map(a =>
        (a.get(0).asText(), a.get(1).asText())).toVector).getOrElse(Vector.empty)
    Spec(
      n.get("groupCols").elements().asScala.map(_.asText()).toVector,
      pairs("sums"), pairs("mins"), pairs("maxs"))
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
    val extremes = spec.mins ++ spec.maxs
    val allOut = spec.sums ++ extremes
    require(allOut.map(_._1).distinct.length == allOut.length,
      "duplicate output column in sums/mins/maxs")
    val aggDefs = IceLite.ColDef(k + 1, "cnt", "BIGINT") +:
      allOut.zipWithIndex.map { case ((o, _), i) =>
        require(o != "cnt" && !spec.groupCols.contains(o), s"agg name clash: $o")
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
    // all-zero rows (updates that didn't move any aggregate) write nothing —
    // but ONLY when the view has no extrema: a removed-and-compensated min
    // row can move min() while leaving every count/sum delta at zero, so
    // with mins/maxs every touched group stays in play
    val hasExt = spec.mins.nonEmpty || spec.maxs.nonEmpty
    val delta = if (hasExt) delta0 else delta0.filter(
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
    val newRows0 = joined.select(
      spec.groupCols.map(c => delta(c).as(c)) ++
        ((coalesce(mvOld("cnt"), lit(0L)) + col("__dc")).as("cnt") +:
          spec.sums.map { case (o, _) =>
            (coalesce(mvOld(o), lit(0L)) + col(s"__d_$o")).as(o) }): _*)

    val (withExt, recomputed) =
      if (!hasExt) (newRows0, 0L)
      else withExtremes(spark, spec, srcSnap, mvOld, newState, oldState, newRows0)
    val newRows = withExt
      .withColumn("__op", when(col("cnt") === 0L, "DELETE").otherwise("UPSERT"))
      .withColumn("__sq", lit(to.toLong))

    // touched groups ≤ changed keys — an order-of-magnitude task-count hint
    val stats = commitBatch(spark, mvSnap, mvDir, newRows, to,
      rowsHint = Some(math.max(changedCnt, 1L)))
    RefreshStats(from, to, stats.applied, changedCnt, stats.batchRows, recomputed)
  }

  /** The min/max half of a refresh (see [[Spec]]): per touched group,
    *   - the INSERT side can only improve an extremum → null-safe
    *     least/greatest of (stored, inserted) — the cheap path;
    *   - a REMOVED row THREATENS an extremum iff its value ties-or-beats
    *     the stored one (≤ stored min / ≥ stored max; a removed value
    *     strictly inside the range cannot have been the extremum) →
    *     those groups' extrema are recomputed from the source HEAD,
    *     pruned to exactly the threatened groups.
    * Decision is PER COLUMN: a threatened min beside a safe max recomputes
    * only the min. Returns `newRows0` with the extrema columns appended. */
  private def withExtremes(spark: SparkSession, spec: Spec,
      srcSnap: IceLite.Snapshot, mvOld: DataFrame,
      newState: DataFrame, oldState: DataFrame,
      newRows0: DataFrame): (DataFrame, Long) = {
    val gcs = spec.groupCols
    val extremes = spec.mins.map((_, true)) ++ spec.maxs.map((_, false))
    def g(df: DataFrame) = gcs.map(c => df(c))
    def gRenamed(df: DataFrame) =
      df.select(gcs.map(c => col(c).as(s"__g_$c")) ++
        df.columns.filterNot(gcs.contains(_)).map(col): _*)
    def gjoin(left: DataFrame, right: DataFrame): DataFrame = {
      val r = gRenamed(right)
      left.join(r, gcs.map(c => left(c) <=> r(s"__g_$c")).reduce(_ && _), "left_outer")
        .drop(gcs.map(c => s"__g_$c"): _*)
    }
    // insert-side extrema
    val insAggs = extremes.map { case ((o, e), isMin) =>
      val v = expr(e).cast("long")
      (if (isMin) min(v) else max(v)).as(s"__ins_$o")
    }
    val ins = newState.groupBy(g(newState): _*).agg(insAggs.head, insAggs.tail: _*)
    // removal threats vs the STORED extrema (groups not yet in the view
    // cannot have removals — inner join)
    val storedX = mvOld.select(gcs.map(col) ++
      extremes.map { case ((o, _), _) => col(o).as(s"__st_$o") }: _*)
    val sx = gRenamed(storedX)
    val remJ = oldState.join(sx,
      gcs.map(c => oldState(c) <=> sx(s"__g_$c")).reduce(_ && _), "inner")
    val thrAggs = extremes.map { case ((o, e), isMin) =>
      val v = expr(e).cast("long")
      val hit = v.isNotNull && col(s"__st_$o").isNotNull &&
        (if (isMin) v <= col(s"__st_$o") else v >= col(s"__st_$o"))
      max(when(hit, 1).otherwise(0)).as(s"__thr_$o")
    }
    val thr = remJ.groupBy(g(oldState): _*).agg(thrAggs.head, thrAggs.tail: _*)
    // head recompute for threatened groups, structurally pruned
    val recGroups = thr.filter(
      extremes.map { case ((o, _), _) => col(s"__thr_$o") === 1 }.reduce(_ || _))
      .select(gcs.map(col): _*).distinct().localCheckpoint()
    val headAggs = extremes.map { case ((o, e), isMin) =>
      val v = expr(e).cast("long")
      (if (isMin) min(v) else max(v)).as(s"__hd_$o")
    }
    val headX = headForGroups(spark, srcSnap, gcs, recGroups)
      .groupBy(gcs.map(col): _*).agg(headAggs.head, headAggs.tail: _*)

    var out = newRows0
    out = gjoin(out, storedX)
    out = gjoin(out, ins)
    out = gjoin(out, thr)
    out = gjoin(out, headX)
    def nsLeast(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column, isMin: Boolean) =
      when(a.isNull, b).when(b.isNull, a)
        .otherwise(if (isMin) least(a, b) else greatest(a, b))
    val finals = extremes.map { case ((o, _), isMin) =>
      when(coalesce(col(s"__thr_$o"), lit(0)) === 1, col(s"__hd_$o"))
        .otherwise(nsLeast(col(s"__st_$o"), col(s"__ins_$o"), isMin)).as(o)
    }
    (out.select(out.columns.filterNot(_.startsWith("__")).filterNot(c =>
        extremes.exists(_._1._1 == c)).map(col) ++ finals: _*),
      recGroups.count())
  }

  /** Source-head rows of exactly the `rec` groups: value-bloom bucket
    * pruning when the (single) group column is indexed (q64), else a
    * filtered scan — either way a null-safe semi join bounds the rows. */
  private def headForGroups(spark: SparkSession, srcSnap: IceLite.Snapshot,
      gcs: Vector[String], rec: DataFrame): DataFrame = {
    val base =
      if (gcs.length == 1 && srcSnap.indexedCols(gcs.head)) {
        val vals = rec.select(col(gcs.head)).collect().map(_.get(0))
        val hasNull = vals.contains(null)
        val bs = vals.filter(_ != null).foldLeft(Set.empty[Int])((acc, v) =>
          acc ++ IceLite.bucketsForValue(srcSnap, gcs.head, v))
        val keep: IceLite.DataFile => Boolean =
          if (hasNull) _ => true else f => bs(f.bucket)
        IceLite.read(spark, srcSnap, keep)
      } else IceLite.read(spark, srcSnap)
    base.join(rec, gcs.map(c => base(c) <=> rec(c)).reduce(_ && _), "left_semi")
  }

  /** Field ids pinned from the view schema → Merge normalization is exact. */
  private def commitBatch(spark: SparkSession, mvSnap: IceLite.Snapshot,
      mvDir: String, newRows: DataFrame, to: Int,
      rowsHint: Option[Long] = None): Merge.MergeStats = {
    val visible = mvSnap.currentSchema.filterNot(_.hidden)
    val batch = newRows.select(
      visible.map(cd => col(cd.name).as(cd.name,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("graft.fieldId", cd.id.toLong).build())) ++
        Seq(col("__sq"), col("__op")): _*)
    Merge.mergeEpoch(spark, mvDir, batch, "__sq", "__op", s"src-$to",
      batchRowsHint = rowsHint)
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
      (spec.sums.map { case (o, e) => sum(expr(e).cast("long")).as(o) } ++
        spec.mins.map { case (o, e) => min(expr(e).cast("long")).as(o) } ++
        spec.maxs.map { case (o, e) => max(expr(e).cast("long")).as(o) })
    val target = IceLite.read(spark, srcSnap)
      .groupBy(spec.groupCols.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val cur = IceLite.read(spark, mvSnap)
    val cond = spec.groupCols.map(c => target(c) <=> cur(c)).reduce(_ && _)
    val joined = target.join(cur, cond, "full_outer")
    val valCols = "cnt" +: (spec.sums.map(_._1) ++ spec.mins.map(_._1) ++
      spec.maxs.map(_._1))
    val differs = valCols.map(o => !(target(o) <=> cur(o))).reduce(_ || _)
    val newRows = joined.filter(differs).select(
      spec.groupCols.map(c => coalesce(target(c), cur(c)).as(c)) ++
        valCols.map { o =>
          // count/sum of a vanished group read back as 0; min/max keep SQL
          // NULL semantics (a live group whose values are all NULL has a
          // NULL extremum, not 0)
          val isExt = spec.mins.exists(_._1 == o) || spec.maxs.exists(_._1 == o)
          (if (isExt) target(o) else coalesce(target(o), lit(0L))).as(o)
        }: _*)
      .withColumn("__op", when(col("cnt") === 0L, "DELETE").otherwise("UPSERT"))
      .withColumn("__sq", lit(to.toLong))
    val stats = commitBatch(spark, mvSnap, mvDir, newRows, to)
    RefreshStats(from, to, stats.applied,
      srcSnap.files.map(_.rows).sum, stats.batchRows)
  }
}
