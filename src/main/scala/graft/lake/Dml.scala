package graft.lake

import org.apache.spark.sql.{Column, SparkSession}
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
      "__dml_seq", "__dml_op", epochId)
  }

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
      "__dml_seq", "__dml_op", epochId)
  }
}
