package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** TYPE-2 SLOWLY-CHANGING-DIMENSION maintenance from the change feed — the
  * canonical CDC→warehouse operator: every version a key ever had is kept
  * as its own row with a `[valid_from, valid_to)` sequence interval, closed
  * when the next change arrives, open (`valid_to` NULL, `is_current` true)
  * while it is the live version.
  *
  * Storage is split by MUTABILITY, which is what makes the operator
  * 100 TB-shaped:
  *
  *   - `current/` — an IceLite table keyed by the SOURCE key columns,
  *     holding exactly the open row per live key. Epoch-fenced MERGE
  *     commits, bucket-pruned reads: the refresh touches O(changed keys).
  *   - `history/batch=<v>/` — closed versions, APPEND-ONLY parquet. A
  *     closed SCD2 row is immutable by construction (its interval is
  *     sealed by a later event), so history is never rewritten — at
  *     10^10 rows the mutable working set stays O(live keys), and each
  *     refresh appends O(changes in the window).
  *
  * Refresh (`apply`): read the source change feed for the unapplied window
  * ([[IceLite.changes]] — per-epoch net rows with their winning `__seq`),
  * pull the open rows of ONLY the touched keys (driver-derived bucket set +
  * semi-join, the [[MatView]] pruning shape), order each key's timeline by
  * sequence, and `lead()` over it: every row with a successor seals at the
  * successor's sequence and moves to history; the last row per key either
  * becomes the new open row (UPSERT) or, for a DELETE, removes the key from
  * `current/` (the prior version having been sealed at the delete's
  * sequence — a full-history table records deletions as closed intervals,
  * not vanished rows).
  *
  * Exactly-once: the history batch for window end `v` is staged and
  * atomically renamed to `history/batch=<v>` BEFORE the current-table MERGE
  * commits fence `src-<v>`; the batch content is a pure function of the
  * window, so every crash point either replays to an identical batch
  * (rename replaces it) or fences as a no-op. The ledger of `current/` IS
  * the refresh watermark — no side file to drift.
  *
  * Granularity caveat (same as any batch CDC consumer): the feed carries
  * each epoch's NET row per key, so intra-epoch intermediate versions
  * collapse — this is SCD2 at commit granularity, exactly what a
  * change-feed consumer can observe.
  *
  * Schema caveat: the dimension tracks the source columns it was CREATED
  * with. A column the source gains later is ignored (recreate the
  * dimension to track it); a tracked column the source drops fails the
  * apply loudly rather than null-filling history. */
object Scd2 {

  final case class ApplyStats(fromVersion: Int, toVersion: Int, applied: Boolean,
      changedKeys: Long, closed: Long, opened: Long, deleted: Long)

  private def currentDir(scdDir: String) = s"$scdDir/current"
  private def historyDir(scdDir: String) = s"$scdDir/history"

  /** Create the dimension store: `current/` mirrors the source's visible
    * schema plus `valid_from`, keyed (and therefore bucketed) by the
    * source's key columns so refreshes prune structurally. */
  def create(srcDir: String, scdDir: String, buckets: Int = 8): IceLite.Snapshot = {
    val src = IceLite.load(srcDir)
    val visible = src.currentSchema.filterNot(_.hidden)
    val defs = visible.zipWithIndex.map { case (cd, i) =>
      IceLite.ColDef(i + 1, cd.name, cd.dataType)
    } :+ IceLite.ColDef(visible.length + 1, "valid_from", "BIGINT")
    Files.createDirectories(Paths.get(historyDir(scdDir)))
    IceLite.create(currentDir(scdDir), IceLite.withCdcCols(defs), src.keyCols, buckets)
  }

  /** Last source version applied — max `src-<v>` epoch in current/'s ledger. */
  def lastApplied(cur: IceLite.Snapshot): Int = {
    val led = cur.ledger
    val wm = led.watermarks.getOrElse("src", -1L)
    val rc = led.recent.getOrElse("src", Set.empty).foldLeft(-1L)(math.max)
    math.max(0L, math.max(wm, rc)).toInt
  }

  /** Advance the dimension to the source's current version. Idempotent
    * (epoch-fenced) and O(window changes + touched open rows). */
  def apply(spark: SparkSession, srcDir: String, scdDir: String): ApplyStats = {
    import spark.implicits._
    val curSnap = IceLite.load(currentDir(scdDir))
    val srcSnap = IceLite.load(srcDir)
    val to = srcSnap.version
    val from = lastApplied(curSnap)
    if (to <= from || curSnap.hasEpoch(s"src-$to"))
      return ApplyStats(from, to, applied = false, 0, 0, 0, 0)

    val keyCols = srcSnap.keyCols
    val valCols = curSnap.currentSchema.filterNot(_.hidden).map(_.name)
      .filterNot(_ == "valid_from") // source visible columns, SCD order
    require(valCols.forall(c => srcSnap.currentSchema.exists(_.name == c)),
      s"source schema diverged from the dimension's (${valCols.mkString(",")})")

    // the window's change rows — one NET row per (key, epoch), each with
    // the winning __seq; several epochs in one window give several
    // timeline entries per key. localCheckpoint: three reads branch off.
    val feed = IceLite.changes(spark, srcDir, from, to)
      .select((valCols.map(col) :+ col(IceLite.SeqCol.name).as("__vseq") :+
        coalesce(col(IceLite.DelCol.name), lit(false)).as("__del")): _*)
      .localCheckpoint()
    val changedKeys = feed.select(keyCols.map(col): _*).distinct()
    // ONE job yields both the changed-key count and the touched-bucket set
    // (the bucket is a function of the key, so per-bucket distinct-key
    // counts sum to the total)
    val perBucket = changedKeys
      .groupBy(IceLite.bucketExpr(keyCols, curSnap.buckets).as("__b"))
      .agg(count(lit(1)).as("n")).collect()
    val changedCnt = perBucket.map(_.getLong(1)).sum
    val touched = perBucket.map(_.getInt(0)).toSet
    val open = IceLite.read(spark, curSnap, f => touched(f.bucket))
      .join(changedKeys, keyCols.toSeq, "left_semi")
      .select((valCols.map(col) :+ col("valid_from").as("__vseq") :+
        lit(false).as("__del")): _*)
      .withColumn("__base", lit(true))

    // per-key timeline: the open row (its valid_from predates every window
    // sequence) followed by the window's changes; lead() seals intervals
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__vseq"))
    val timeline = open.unionByName(feed.withColumn("__base", lit(false)))
      .withColumn("__next", lead(col("__vseq"), 1).over(w))
      .localCheckpoint()

    // closed versions → history (immutable from here on)
    val closed = timeline.filter(col("__next").isNotNull && !col("__del"))
      .select((valCols.map(col) :+ col("__vseq").as("valid_from") :+
        col("__next").as("valid_to")): _*)
    val staged = s"${historyDir(scdDir)}/.stage-$to"
    val finalBatch = s"${historyDir(scdDir)}/batch=$to"
    // count from the checkpointed timeline (cheap second pass); an
    // all-zero-rows write would leave a part-file-less dir that breaks
    // schema inference on read, so empty windows write no batch at all
    val closedCnt = closed.count()
    if (closedCnt > 0) {
      closed.write.mode("overwrite").parquet(staged)
      // stage → atomic rename BEFORE the fence commits: every crash point
      // either regenerates an identical batch or fences as a no-op
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(finalBatch))
      Files.move(Paths.get(staged), Paths.get(finalBatch), StandardCopyOption.ATOMIC_MOVE)
    }

    // last timeline row per key → the new open row, or a DELETE
    val last = timeline.filter(col("__next").isNull && !col("__base"))
    val batch = last.select(
      (valCols.map(col) :+ col("__vseq").as("valid_from") :+
        col("__vseq").as("__sq") :+
        when(col("__del"), "DELETE").otherwise("UPSERT").as("__op")): _*)
    val visible = curSnap.currentSchema.filterNot(_.hidden)
    val pinned = batch.select(
      visible.map(cd => col(cd.name).as(cd.name,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("graft.fieldId", cd.id.toLong).build())) ++
        Seq(col("__sq"), col("__op")): _*)
    val st = Merge.mergeEpoch(spark, currentDir(scdDir), pinned, "__sq", "__op", s"src-$to",
      batchRowsHint = Some(changedCnt)) // batch = last timeline row per changed key
    val deleted = last.filter(col("__del")).count()
    ApplyStats(from, to, st.applied, changedCnt, closedCnt,
      st.batchRows - deleted, deleted)
  }

  /** TEMPORAL POINT-IN-TIME read: the version of every key whose
    * `[valid_from, valid_to)` interval contains `seq` — "the dimension as
    * the change stream had it at sequence s", answerable long after the
    * source's snapshot at that point was expired (history is append-only,
    * so SCD2 retention is independent of snapshot retention). The interval
    * predicate pushes to the parquet scan, so row groups whose
    * [valid_from, valid_to] stats exclude `seq` are never decompressed. */
  def asOf(spark: SparkSession, scdDir: String, seq: Long): DataFrame =
    read(spark, scdDir).filter(col("valid_from") <= seq &&
      (col("valid_to").isNull || col("valid_to") > seq))

  /** The full dimension: closed history plus the open rows. History dirs
    * resolve through [[graft.operators.BatchStore]]'s liveness rules, so a
    * compaction crash window (both consolidated and superseded dirs on
    * disk) still reads each interval exactly once. */
  def read(spark: SparkSession, scdDir: String): DataFrame = {
    val curSnap = IceLite.load(currentDir(scdDir))
    val cur = IceLite.read(spark, curSnap)
      .withColumn("valid_to", lit(null).cast("bigint"))
      .withColumn("is_current", lit(true))
    val batches = graft.operators.BatchStore.liveBatchDirs(historyDir(scdDir))
      .map(_.toString)
    val hist = batches.foldLeft(Option.empty[DataFrame]) { (acc, p) =>
      val df = spark.read.parquet(p)
      Some(acc.map(_.unionByName(df, allowMissingColumns = true)).getOrElse(df))
    }.map(_.withColumn("is_current", lit(false)))
    hist.map(h => cur.unionByName(h, allowMissingColumns = true)).getOrElse(cur)
  }

  /** Consolidated-history batch ids live far above any source version, so
    * a post-compaction apply's `batch=<srcVersion>` can never collide. */
  private val ConsolidatedBase = 1L << 40

  /** OFFLINE HISTORY COMPACTION: each apply appends one `batch=<v>` dir, so
    * a long-running dimension accumulates O(refreshes) small dirs — the
    * same operational problem the signature store solves, and the same
    * cure: fold all live batches into one consolidated dir via
    * [[graft.operators.BatchStore.compact]]'s crash-safe swap (stage with a
    * superseded-ids marker, move into place, only then delete). Returns
    * the number of dirs collapsed (0 = nothing to do). */
  def compactHistory(spark: SparkSession, scdDir: String,
      crashPoint: String => Unit = _ => ()): Int = {
    import graft.operators.BatchStore
    val hd = historyDir(scdDir)
    // entry sweep even when there's nothing to fold — a previous crash's
    // superseded dirs and stranded stages get reclaimed either way
    BatchStore.sweepSuperseded(scdDir, Seq(hd))
    val live = BatchStore.liveBatchDirs(hd)
    if (live.size <= 1) return 0
    val into = ConsolidatedBase + live.map(BatchStore.batchIdOf).max
    val all = live.map(p => spark.read.parquet(p.toString))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    BatchStore.compact(scdDir,
      Seq(hd -> ((stage: String) => all.write.mode("overwrite").parquet(stage))),
      into, crashPoint)
  }
}
