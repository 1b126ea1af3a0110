package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Predicate row-level DML over a CDC table: DELETE WHERE / UPDATE WHERE,
  * expressed as ordinary epoch-fenced merges so every guarantee the CDC
  * path has (LWW ordering, exactly-once epochs, change-feed visibility,
  * merge-on-read cost model) applies to DML for free.
  *
  * Semantics: the DML reads the table AS OF its current snapshot, and its
  * rows enter the log at seq = snapshot.maxSeq + 1 — a point in the
  * per-key total order. CDC events that arrive later with a HIGHER seq win
  * over the DML (exactly the behavior a log-repair or GDPR redaction job
  * wants: the delete/update is an event in the stream, not a fork of it).
  * Replaying the same epochId fences as a no-op, like any epoch.
  *
  * Scale notes (100 TB design point):
  *  - cost is O(matching rows), NOT O(table): matches become one merge
  *    batch (tombstones for DELETE, rewritten rows for UPDATE), so only
  *    the buckets containing matches are touched — a right-to-be-forgotten
  *    delete of one user writes a handful of delta rows, never rewrites
  *    the table;
  *  - the predicate scan is a normal pruned read: parquet pushdown applies,
  *    and tables with a bloom index / clustering on the predicate column
  *    skip whole buckets or files before the scan;
  *  - DELETE writes tombstones (merge-on-read), so the data bytes are
  *    reclaimed by the normal compact→expire→vacuum lifecycle — callers
  *    with a hard purge deadline schedule compaction of the touched
  *    buckets, they don't pay it inline. */
object Dml {

  private def fid(id: Int) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", id.toLong).build()

  /** The matching rows with graft.fieldId metadata re-attached (IceLite.read
    * drops it) plus the DML seq/op columns, ready for Merge.mergeEpoch. */
  private def dmlBatch(spark: SparkSession, snap: IceLite.Snapshot,
      predicate: String, sets: Seq[(String, String)], op: String) = {
    val visible = snap.currentSchema.filterNot(_.hidden)
    sets.foreach { case (n, _) =>
      require(visible.exists(_.name == n), s"no such column: $n")
      require(!snap.keyCols.contains(n),
        s"cannot update key column $n (delete + re-insert expresses a key change)")
    }
    val updated = sets.foldLeft(IceLite.read(spark, snap).where(expr(predicate))) {
      case (df, (n, e)) => df.withColumn(n, expr(e).cast(
        visible.find(_.name == n).get.sparkType))
    }
    updated.select(visible.map(c => col(c.name).as(c.name, fid(c.id))) :+
      lit(snap.maxSeq + 1).as("__dml_seq") :+ lit(op).as("__dml_op"): _*)
  }

  /** DELETE FROM table WHERE predicate — tombstones for every matching row,
    * through the normal epoch-fenced merge. */
  def deleteWhere(spark: SparkSession, dir: String, predicate: String,
      epochId: String): Merge.MergeStats = {
    val snap = IceLite.load(dir)
    Merge.mergeEpoch(spark, dir,
      dmlBatch(spark, snap, predicate, Seq.empty, "DELETE"),
      "__dml_seq", "__dml_op", epochId, matchedKeys(spark, snap, predicate),
      // the batch's maxSeq+1 sequence is only unique while `snap` is HEAD:
      // two DMLs rebasing from one head would tie at the same seq and make
      // read-time LWW tie-break arbitrary — refuse the rebase instead
      requireBaseVersion = Some(snap.version))
  }

  /** Keys-only pre-pass over the matching rows so the merge prunes to the
    * buckets that actually contain matches — without it every DML would
    * "touch" (and write a delta into) every bucket, turning a one-user
    * delete into an O(buckets) write. Column-pruned scan: only the key and
    * predicate columns are read. */
  private def matchedKeys(spark: SparkSession, snap: IceLite.Snapshot,
      predicate: String): Option[DataFrame] =
    Some(IceLite.read(spark, snap).where(expr(predicate))
      .select(snap.keyCols.map(col): _*))

  /** UPDATE table SET col = expr, ... WHERE predicate — rewritten versions
    * of every matching row (non-key columns only; a key change is a
    * delete + insert, not an update). Each `set` right-hand side is a Spark
    * SQL expression evaluated on the matching row and cast to the column's
    * declared type. */
  def updateWhere(spark: SparkSession, dir: String, predicate: String,
      sets: Seq[(String, String)], epochId: String): Merge.MergeStats = {
    require(sets.nonEmpty, "updateWhere needs at least one SET assignment")
    val snap = IceLite.load(dir)
    Merge.mergeEpoch(spark, dir,
      dmlBatch(spark, snap, predicate, sets, "UPSERT"),
      "__dml_seq", "__dml_op", epochId, matchedKeys(spark, snap, predicate),
      requireBaseVersion = Some(snap.version)) // same-seq tie guard, see deleteWhere
  }

  final case class MergeIntoStats(updated: Long, deleted: Long, inserted: Long,
      merge: Merge.MergeStats,
      /** rows deleted by the WHEN NOT MATCHED BY SOURCE clause. */
      deletedBySource: Long = 0L)

  /** MERGE INTO table t USING source s ON t.key = s.key (Iceberg/Delta
    * MERGE semantics over an arbitrary source DataFrame):
    *
    *   WHEN MATCHED AND matchedDelete THEN DELETE
    *   WHEN MATCHED THEN UPDATE SET matchedSet (empty = SET * — every data
    *     column the source carries replaces the target's)
    *   WHEN NOT MATCHED THEN INSERT (if insertNotMatched; data columns the
    *     source doesn't carry insert as NULL)
    *
    * Set right-hand sides and the delete condition are Spark SQL
    * expressions resolved against BOTH aliases: `s.col` = source, `t.col` =
    * the target row's current value. The classic MERGE ambiguity rule is
    * enforced: each target key matches at most one source row (duplicate
    * source keys refuse, like Delta's multiple-matches error).
    *
    * Like the other DML verbs this is an ordinary epoch-fenced merge at
    * seq = maxSeq + 1, so LWW ordering vs the CDC stream, exactly-once
    * replay fencing, and change-feed visibility all apply unchanged.
    *
    * Scale: cost is O(source + matched buckets), never O(table) — the
    * target pre-image read prunes to the buckets the source's keys hash
    * into (driver-derived from the source keys, bounded by the bucket
    * layout) and semi-joins down to matched keys before the wide join. */
  def mergeInto(spark: SparkSession, dir: String, source: DataFrame,
      matchedDelete: Option[String],
      matchedSet: Seq[(String, String)],
      insertNotMatched: Boolean,
      epochId: String,
      /** WHEN NOT MATCHED BY SOURCE THEN DELETE, bounded to a target scope
        * (Delta 2.3's fourth clause — the full-sync primitive): target
        * rows matching this predicate that have NO source row are
        * tombstoned, so inside the scope the table mirrors the source
        * exactly. The predicate (over target columns) is also the scan
        * bound: it rides normal pushdown/pruning, and WITHOUT a selective
        * one this clause is O(scope) = O(table) by definition — same
        * guidance as Delta's. */
      notMatchedBySourceDelete: Option[String] = None): MergeIntoStats = {
    val snap = IceLite.load(dir)
    // exactly-once fence FIRST: a replayed MERGE epoch is a metadata no-op
    // (and reports zero clause counts) — never pays the batch construction
    if (snap.hasEpoch(epochId))
      return MergeIntoStats(0L, 0L, 0L, Merge.MergeStats(epochId,
        applied = false, 0L, 0L, 0L, 0, 0, 0L))
    val batch0 = mergeIntoBatch(spark, snap, source, matchedDelete, matchedSet,
      insertNotMatched, notMatchedBySourceDelete).localCheckpoint()
    val visible = snap.currentSchema.filterNot(_.hidden)
    val byClause = batch0.groupBy("__dml_clause", "__dml_op").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val st = Merge.mergeEpoch(spark, dir,
      batch0.select(visible.map(c => col(c.name).as(c.name, fid(c.id))) :+
        lit(snap.maxSeq + 1).as("__dml_seq") :+ col("__dml_op"): _*),
      "__dml_seq", "__dml_op", epochId,
      requireBaseVersion = Some(snap.version), // same-seq tie guard, see deleteWhere
      batchRowsHint = Some(byClause.values.sum)) // clause counts already collected
    MergeIntoStats(
      updated = byClause.getOrElse(("m", "UPSERT"), 0L),
      deleted = byClause.getOrElse(("m", "DELETE"), 0L),
      inserted = byClause.getOrElse(("i", "UPSERT"), 0L),
      merge = st,
      deletedBySource = byClause.getOrElse(("x", "DELETE"), 0L))
  }

  /** The MERGE batch construction (matched clauses + inserts, before the
    * epoch merge) — split out so the plan is reviewable on its own
    * (graft.Explain) and unit-testable without a commit. */
  private[graft] def mergeIntoBatch(spark: SparkSession, snap: IceLite.Snapshot,
      source: DataFrame,
      matchedDelete: Option[String],
      matchedSet: Seq[(String, String)],
      insertNotMatched: Boolean,
      notMatchedBySourceDelete: Option[String] = None,
      /** pin the multiply-consumed source/pre-image subplans (the default);
        * Explain passes false so the bucket-pruned read stays visible. */
      pin: Boolean = true): DataFrame = {
    val keyCols = snap.keyCols
    require(keyCols.forall(source.columns.contains),
      s"source must carry the key columns $keyCols")
    val visible = snap.currentSchema.filterNot(_.hidden)
    val dataCols = visible.filterNot(c => keyCols.contains(c.name))
    val srcCols = source.columns.toSet
    // normalize source KEY types to the table's declared key types up
    // front: xxhash64 is type-dependent (hash of int 7 != hash of 7L), so
    // an uncast narrower source key (CSV/JSON inference, literal ints)
    // would derive WRONG bucket ids and silently exclude matched rows from
    // the pre-image — the joins coerce and would mask it (data columns are
    // cast at use via typed())
    val sourceK = source.withColumns(
      keyCols.map(k => k -> col(k).cast(
        visible.find(_.name == k).get.sparkType)).toMap)
    val sets: Seq[(String, String)] =
      if (matchedSet.nonEmpty) matchedSet
      else dataCols.map(_.name).filter(srcCols).map(n => n -> s"s.$n")
    sets.foreach { case (n, _) =>
      require(visible.exists(_.name == n), s"no such column: $n")
      require(!keyCols.contains(n),
        s"cannot update key column $n (delete + re-insert expresses a key change)")
    }
    // pin the source: it feeds bucket derivation, the match join, the
    // anti-join, and the final batch
    val src = if (pin) sourceK.localCheckpoint() else sourceK
    // one validation pass: NULL keys would never match (SQL null semantics)
    // and an anti-join would INSERT them as null-key rows; duplicate keys
    // are the classic MERGE ambiguity (Delta's multiple-matches error)
    val keyIssues = src.groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > 1 || keyCols.map(col(_).isNull).reduce(_ || _))
      .limit(1).collect()
    require(keyIssues.isEmpty,
      if (keyIssues.headOption.exists(r => keyCols.indices.exists(r.isNullAt)))
        "source has NULL key values: MERGE keys must be non-null"
      else
        "source has duplicate keys: each target row must match at most one source row")

    // live pre-image of ONLY the buckets the source keys hash into,
    // narrowed to the matched keys
    val touched = src.select(IceLite.bucketExpr(keyCols, snap.buckets).as("__b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val target0 = IceLite.read(spark, snap, f => touched(f.bucket))
      .join(src.select(keyCols.map(col): _*), keyCols.toSeq, "left_semi")
    val target = if (pin) target0.localCheckpoint() else target0

    def typed(n: String, e: Column): Column =
      e.cast(visible.find(_.name == n).get.sparkType)
    val setOf = sets.toMap
    val delCond = matchedDelete.map(expr).getOrElse(lit(false))
    val matched = target.as("t")
      .join(src.as("s"), keyCols.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _))
      .select(keyCols.map(k => col(s"t.$k").as(k)) ++ dataCols.map { c =>
        (setOf.get(c.name) match {
          // a deleted row keeps its target values (only the tombstone matters)
          case Some(e) => when(delCond, col(s"t.${c.name}"))
            .otherwise(typed(c.name, expr(e)))
          case None => col(s"t.${c.name}")
        }).as(c.name)
      } :+ when(delCond, lit("DELETE")).otherwise(lit("UPSERT")).as("__dml_op")
        :+ lit("m").as("__dml_clause"): _*)
    val inserts =
      if (!insertNotMatched) None
      else Some(src
        .join(target.select(keyCols.map(col): _*), keyCols.toSeq, "left_anti")
        .select(keyCols.map(col) ++ dataCols.map { c =>
          (if (srcCols(c.name)) typed(c.name, col(c.name))
           else lit(null).cast(c.sparkType)).as(c.name)
        } :+ lit("UPSERT").as("__dml_op") :+ lit("i").as("__dml_clause"): _*))
    // WHEN NOT MATCHED BY SOURCE THEN DELETE, inside the caller's scope:
    // a separate scan from the matched pre-image (absence can live in ANY
    // bucket of the scope — bucket pruning doesn't apply; the scope
    // predicate is the bound and rides normal pushdown). A matched scope
    // row is excluded by the anti-join, so the clauses stay a partition.
    val bySource = notMatchedBySourceDelete.map { pred =>
      IceLite.read(spark, snap).where(expr(pred))
        .join(src.select(keyCols.map(col): _*), keyCols.toSeq, "left_anti")
        .select(keyCols.map(col) ++ dataCols.map(c => col(c.name)) :+
          lit("DELETE").as("__dml_op") :+ lit("x").as("__dml_clause"): _*)
    }
    Seq(Some(matched), inserts, bySource).flatten.reduce(_.unionByName(_))
  }
}
