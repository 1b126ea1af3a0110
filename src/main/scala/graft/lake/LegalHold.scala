package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** LEGAL HOLD — the compliance guard that sits ABOVE erasure: a key under
  * an active litigation/audit hold must not be destroyed, even by an
  * otherwise-valid right-to-be-forgotten ticket (erasure requests lose to
  * preservation obligations; GDPR Art. 17(3)(e)). Holds are tiny metadata
  * markers (`meta/hold-<id>.json`, one per hold — placement and release
  * are each ONE atomic file op, no table IO), and [[Purge.purgeKeys]] is
  * FAIL-CLOSED against them: purging a held key throws. Batch erasure
  * tickets go through [[guardedPurge]], which splits the batch into the
  * erasable subset (purged normally, one rewrite per candidate file) and
  * the refused subset (reported to the operator, re-submittable after
  * release).
  *
  * Scale shape: holds are O(active holds) driver-side metadata — the
  * enforcement check is a set lookup before any job launches. Nothing
  * about the data path changes while a hold exists. */
object LegalHold {

  final case class Hold(id: String, key: Map[String, String], reason: String)

  private def holdPath(dir: String, id: String): Path = {
    require(id.matches("[A-Za-z0-9._-]+"), s"unsafe hold id: $id")
    IceLite.metaDir(dir).resolve(s"hold-$id.json")
  }

  private def esc(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"")
  private def unesc(v: String): String =
    v.replace("\\\"", "\"").replace("\\\\", "\\")

  /** Place a hold on one key (all its key columns bound). Atomic: staged
    * write + rename. Fails if the hold id already exists. */
  def place(dir: String, id: String, key: Map[String, Any], reason: String): Unit = {
    val head = IceLite.load(dir)
    require(head.keyCols.forall(key.contains),
      s"hold key must bind every key column ${head.keyCols}, got ${key.keys}")
    val p = holdPath(dir, id)
    require(!Files.exists(p), s"hold $id already exists")
    // store the key in declared-type form (same coercion purgeKeys uses),
    // so a hold placed with e.g. a Double against a BIGINT column still
    // blocks the purge of key 5
    val norm = head.keyCols.zip(
      Purge.normKey(head, head.currentSchema.map(c => c.name -> c).toMap, key))
    val kv = norm.map { case (k, v) =>
        s""""${esc(k)}":"${esc(String.valueOf(v))}"""" }
      .mkString(",")
    val json = s"""{"hold_id":"${esc(id)}","reason":"${esc(reason)}","key":{$kv}}"""
    val tmp = p.resolveSibling(s".${p.getFileName}.tmp")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Release a hold; true if it existed. */
  def release(dir: String, id: String): Boolean =
    Files.deleteIfExists(holdPath(dir, id))

  private val Field = """"((?:[^"\\]|\\.)+)":"((?:[^"\\]|\\.)*)"""".r

  /** Active holds, parsed from the marker files. */
  def active(dir: String): Seq[Hold] = {
    val meta = IceLite.metaDir(dir)
    if (!Files.isDirectory(meta)) return Seq.empty
    Files.list(meta).iterator().asScala
      .filter(_.getFileName.toString.startsWith("hold-"))
      .toSeq.sortBy(_.getFileName.toString)
      .map { p =>
        val s = new String(Files.readAllBytes(p), "UTF-8")
        val fields = Field.findAllMatchIn(s)
          .map(m => unesc(m.group(1)) -> unesc(m.group(2))).toVector
        val kv = fields.filterNot(f => f._1 == "hold_id" || f._1 == "reason").toMap
        Hold(fields.collectFirst { case ("hold_id", v) => v }.getOrElse(""),
          kv, fields.collectFirst { case ("reason", v) => v }.getOrElse(""))
      }
  }

  /** The held keys as normalized (col → string value) maps — what the
    * purge guard checks requested keys against. */
  def heldKeySet(dir: String): Set[Map[String, String]] =
    active(dir).map(_.key).toSet

  /** True iff the key (in keyCols order) is under an active hold. */
  def isHeld(dir: String, keyCols: Seq[String], vals: Seq[Any]): Boolean =
    heldKeySet(dir).contains(
      keyCols.zip(vals.map(String.valueOf(_))).toMap)

  /** Batch erasure with hold enforcement: purge the erasable keys, refuse
    * (and return) the held ones. Zero stats when everything is held. */
  def guardedPurge(spark: SparkSession, dir: String,
      keys: Seq[Map[String, Any]]): (Purge.PurgeStats, Seq[Map[String, Any]]) = {
    val head = IceLite.load(dir)
    val curByName = head.currentSchema.map(c => c.name -> c).toMap
    val held = heldKeySet(dir)
    // classify under the SAME declared-type coercion purgeKeys enforces
    // with: a ticket key typed differently from the hold (Double 5.0 vs a
    // BIGINT hold on 5) must land in `refused`, not slip through here and
    // abort the whole batch inside purgeKeys' fail-closed check
    val (refused, erasable) = keys.partition { key =>
      val norm = Purge.normKey(head, curByName, key)
      held.contains(head.keyCols.zip(norm.map(String.valueOf(_))).toMap)
    }
    val stats =
      if (erasable.isEmpty) Purge.PurgeStats(0, 0, 0, 0, 0L)
      else Purge.purgeKeys(spark, dir, erasable)
    (stats, refused)
  }
}
