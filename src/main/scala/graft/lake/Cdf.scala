package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CHANGE FEED WITH ROW IMAGES — the full-fidelity CDC-out surface: for
  * every change applied in a snapshot window, emit typed rows a downstream
  * consumer can apply or audit without re-reading the table:
  *
  *   - `insert`            — the new row (key was absent / tombstoned)
  *   - `update_preimage`   — the row as it was BEFORE an overwrite
  *   - `update_postimage`  — the row as it is AFTER the overwrite
  *   - `delete`            — the last live row, at its deletion
  *
  * [[IceLite.changes]] alone gives post-states and tombstones; the images
  * require the PREVIOUS version of each changed key, which this operator
  * reconstructs at O(changes) cost, never O(table):
  *
  *   1. window changes (delta files only — O(changed files));
  *   2. base pre-state of ONLY the touched keys: driver-derived bucket set
  *      over the `from` snapshot (bounded by the bucket count), structural
  *      file prune, then a semi-join on the changed keys;
  *   3. one per-key sequence-ordered `lag()` over base ∪ changes — each
  *      change row sees its predecessor's values without any self-join.
  *
  * A change whose predecessor is dead (absent or tombstoned) is an
  * `insert`; a tombstone with a dead predecessor emits nothing (the
  * redundant delete carries no image — same as Delta's CDF contract).
  * Multi-epoch windows chain naturally: epoch N's pre-image is epoch N-1's
  * post-image, both inside the same window, base state only seeding the
  * first hop. */
object Cdf {

  /** Image rows for `(fromVersion, toVersion]`: `change_type`, the table's
    * visible columns, and `seq` (the change's commit sequence — pre/post
    * pairs share it). */
  def changesWithImages(spark: SparkSession, dir: String,
      fromVersion: Int, toVersion: Int): DataFrame =
    images(spark, dir, fromVersion, toVersion, preSeqIsPredecessor = false)

  /** [[changesWithImages]] with one twist for INCREMENTAL MAINTAINERS
    * (digests, secondary indexes): pre-image rows carry the PREDECESSOR's
    * sequence instead of the change's — every output row is then a
    * (values, seq) row VERSION, `change_type` saying whether that exact
    * version enters (`insert`/`update_postimage`) or leaves
    * (`delete`/`update_preimage`) the live set, so a maintainer can
    * subtract exactly the contribution it once added (AntiEntropy's XOR
    * digests ride this, q151). */
  def rowVersionLedger(spark: SparkSession, dir: String,
      fromVersion: Int, toVersion: Int): DataFrame =
    images(spark, dir, fromVersion, toVersion, preSeqIsPredecessor = true)

  private def images(spark: SparkSession, dir: String,
      fromVersion: Int, toVersion: Int, preSeqIsPredecessor: Boolean): DataFrame = {
    import spark.implicits._
    val fromSnap = IceLite.loadVersion(dir, fromVersion)
    val toSnap = IceLite.loadVersion(dir, toVersion)
    val keyCols = toSnap.keyCols
    val valCols = toSnap.currentSchema.filterNot(_.hidden).map(_.name)

    val feed = IceLite.changes(spark, dir, fromVersion, toVersion)
      .select((valCols.map(col) :+ col(IceLite.SeqCol.name).as("__vseq") :+
        coalesce(col(IceLite.DelCol.name), lit(false)).as("__del")): _*)
      .withColumn("__base", lit(false))
      .localCheckpoint()

    // pre-state of exactly the touched keys, as of the window start
    val changedKeys = feed.select(keyCols.map(col): _*).distinct()
    val touched = feed
      .select(IceLite.bucketExpr(keyCols, fromSnap.buckets).as("__b"))
      .distinct().as[Int].collect().toSet
    // base rows keep their REAL sequences (all ≤ the from-snapshot's
    // watermark, so they still sort before every window change) — the
    // row-version ledger needs the predecessor's true identity
    val baseAll = IceLite.read(spark, fromSnap, f => touched(f.bucket), includeHidden = true)
      .join(changedKeys, keyCols.toSeq, "left_semi")
      .localCheckpoint()
    val base = baseAll
      .filter(!coalesce(col(IceLite.DelCol.name), lit(false)))
      .select(valCols.map(col) :+ col(IceLite.SeqCol.name).as("__vseq"): _*)
      .withColumn("__del", lit(false))
      .withColumn("__base", lit(true))

    // LWW GUARD: changes() feeds LATE events, including ones whose seq
    // LOSES to the window-start state (upsert OR tombstone — hence the
    // unfiltered baseAll here). The table absorbed those without a state
    // transition, so the image feed must not emit them: sorted by seq they
    // would land BEFORE the anchor row and fabricate an 'insert' of stale
    // values that was never live (skewing row-version maintainers).
    val baseSeq = baseAll.select((keyCols.map(col) :+
      col(IceLite.SeqCol.name).as("__anchor_seq")): _*)
    val feedAdv = feed.join(baseSeq, keyCols.toSeq, "left_outer")
      .filter(col("__anchor_seq").isNull || col("__vseq") > col("__anchor_seq"))
      .drop("__anchor_seq")

    // base-first tiebreak: a (theoretically impossible) seq collision must
    // still put the anchor row before the change it anchors
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__vseq"), col("__base").desc)
    val timeline = base.unionByName(feedAdv)
      .withColumn("__prev", lag(struct(valCols.map(col): _*), 1).over(w))
      .withColumn("__prev_seq", lag(col("__vseq"), 1).over(w))
      .withColumn("__prev_live", lag(col("__del"), 1).over(w) === false)
      .filter(!col("__base")) // base rows seed lag state, emit nothing
      .localCheckpoint()

    val preSeq = if (preSeqIsPredecessor) col("__prev_seq") else col("__vseq")
    val pre = timeline.filter(col("__prev_live"))
      .select((when(col("__del"), "delete").otherwise("update_preimage").as("change_type") +:
        valCols.map(c => col(s"__prev.$c").as(c))) :+ preSeq.as("seq"): _*)
    val post = timeline.filter(!col("__del"))
      .select((when(coalesce(col("__prev_live"), lit(false)), "update_postimage")
        .otherwise("insert").as("change_type") +:
        valCols.map(col)) :+ col("__vseq").as("seq"): _*)
    pre.unionByName(post)
  }
}
