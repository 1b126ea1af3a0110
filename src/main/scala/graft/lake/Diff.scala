package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SNAPSHOT DIFF — the direct state delta between two committed versions of
  * one table, classified per key as insert / update / delete (Iceberg's
  * `table_changes` cousin, Delta's `DESCRIBE HISTORY` + state join).
  *
  * This is NOT the change feed ([[IceLite.changes]]): the feed replays the
  * window's physical change rows (every intermediate version of a key), the
  * diff compares the two RESOLVED states — one row per key whose live value
  * differs, regardless of how many epochs touched it in between. A consumer
  * reconciling a downstream copy wants the diff; an incremental view wants
  * the feed.
  *
  * Scale shape: both snapshots reference mostly the SAME immutable data
  * files (a commit rewrites only the buckets its epoch touched), so a
  * bucket whose file-path set is identical on both sides cannot contribute
  * a diff row and is skipped STRUCTURALLY — never opened. Cost is
  * O(changed buckets), not O(table): a 10^5-bucket table where one epoch
  * touched 40 buckets diffs by reading 40. The remaining join is
  * bucket-aligned (both sides use the table's own key hashing), so at
  * cluster scale the shuffle moves only the changed slice. Pruning falls
  * back to all-buckets when the two versions disagree on bucket count
  * (a rebucket ran in the window — file identity is meaningless across
  * layouts). In-place rewrites that keep paths ([[Purge.purgeKey]]) are
  * invisible by design: purge rewrites EVERY retained version, so both
  * sides read the same post-purge bytes and the diff stays consistent.
  *
  * Column semantics under schema evolution: the diff compares the columns
  * the two schemas share BY NAME (each side read through its own snapshot's
  * schema mapping, so renames/defaults resolve per side first); columns
  * added or dropped in the window don't by themselves make every row an
  * update. Output carries the to-side values (NULL for deletes).
  */
object Diff {

  /** Buckets whose live file set differs between the snapshots — the only
    * buckets that can contribute diff rows. None = pruning unavailable
    * (bucket layouts differ; caller must read everything). */
  def changedBuckets(from: IceLite.Snapshot, to: IceLite.Snapshot): Option[Set[Int]] = {
    if (from.buckets != to.buckets) None
    else {
      val f = from.files.groupBy(_.bucket).view.mapValues(_.map(_.path).toSet).toMap
      val t = to.files.groupBy(_.bucket).view.mapValues(_.map(_.path).toSet).toMap
      Some((f.keySet ++ t.keySet).filter(b =>
        f.getOrElse(b, Set.empty[String]) != t.getOrElse(b, Set.empty[String])))
    }
  }

  /** One row per key whose resolved live state differs between the two
    * versions: key columns (from the `to` schema), `change_type`
    * (insert | update | delete), then the shared data columns with the
    * to-side values (NULL for deletes). */
  def betweenVersions(spark: SparkSession, dir: String, fromVersion: Int,
      toVersion: Int): DataFrame = {
    val from = IceLite.loadVersion(dir, fromVersion)
    val to = IceLite.loadVersion(dir, toVersion)
    val pruned = changedBuckets(from, to)
    val keep: IceLite.DataFile => Boolean = pruned match {
      case Some(bs) => f => bs.contains(f.bucket)
      case None => _ => true
    }
    val keys = to.keyCols
    val sf = IceLite.read(spark, from, keep).withColumn("__fp", lit(true))
    val st = IceLite.read(spark, to, keep).withColumn("__tp", lit(true))
    val dataCols = sf.columns.toSeq.intersect(st.columns.toSeq)
      .filterNot(keys.contains).filterNot(Set("__fp", "__tp"))
    val cond = keys.map(k => sf(k) <=> st(k)).reduce(_ && _)
    val joined = sf.alias("f").join(st.alias("t"), cond, "full_outer")
    val differs = dataCols.map(c => !(col(s"f.$c") <=> col(s"t.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .where(col("f.__fp").isNull || col("t.__tp").isNull || differs)
      .select(
        keys.map(k => coalesce(col(s"t.$k"), col(s"f.$k")).as(k)) ++
        Seq(when(col("f.__fp").isNull, "insert")
          .when(col("t.__tp").isNull, "delete")
          .otherwise("update").as("change_type")) ++
        dataCols.map(c => col(s"t.$c").as(c)): _*)
  }
}
