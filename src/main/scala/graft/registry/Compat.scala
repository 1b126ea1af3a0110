package graft.registry

import graft.proto.Descriptors
import graft.proto.Descriptors.{FieldDesc, FileSet, MessageDesc}

/** SCHEMA COMPATIBILITY GATE — the check a schema registry runs BEFORE
  * accepting a new descriptor version, so a producer can never publish a
  * schema that silently corrupts consumers or the table. The reference
  * loads whatever descriptor file it is pointed at (ProtobufService
  * .java:85-87) and corruption surfaces as downstream decode garbage; a
  * registry-fronted pipeline refuses the registration instead.
  *
  * The engine's identity contract makes the rules concrete: columns are
  * keyed by FIELD NUMBER end to end (decode projects writer→reader by
  * number; IceLite evolves by field id). A candidate version is
  * backward-compatible iff, for every field number present in both:
  *   - the WIRE TYPE is unchanged (varint/fixed32/fixed64/length-delimited)
  *     — a mismatch makes old payloads misparse or hard-fail;
  *   - the semantic type is unchanged or a protobuf-sanctioned widening
  *     (int32→int64, uint32→uint64, sint32→sint64, enum→int32/int64);
  *   - the label does not flip between singular and repeated;
  *   - message-typed fields keep a compatible message (checked
  *     recursively).
  * Separately, a field NAME that moves to a different number is refused:
  * number identity means the "same" column would silently fork (old data
  * under the retired id, new data under the fresh one). Adding fields at
  * fresh numbers and removing fields are always compatible (removal is
  * null-fill on read; resurrection of a RETIRED id is refused downstream
  * by IceLite.dropColumn's table-level guard). */
object Compat {

  final case class Violation(message: String, field: String, number: Int,
      kind: String, detail: String) {
    override def toString = s"$message.$field#$number $kind: $detail"
  }

  import Descriptors._
  import Descriptors.FType._

  private def wireClass(f: FieldDesc): String =
    if (isVarintType(f.tpe)) "varint"
    else if (isFixed32Type(f.tpe)) "fixed32"
    else if (isFixed64Type(f.tpe)) "fixed64"
    else "delimited"

  /** sanctioned same-wire widenings (old → new). */
  private val widenings: Set[(FType, FType)] = Set(
    (TYPE_INT32, TYPE_INT64), (TYPE_UINT32, TYPE_UINT64),
    (TYPE_SINT32, TYPE_SINT64), (TYPE_ENUM, TYPE_INT32), (TYPE_ENUM, TYPE_INT64))

  /** Violations an upgrade from `oldFs` to `newFs` would introduce for
    * `messageType` (fully checked, recursing into message-typed fields).
    * Empty = compatible. */
  def check(oldFs: FileSet, newFs: FileSet, messageType: String): Vector[Violation] = {
    val seen = scala.collection.mutable.Set.empty[(String, String)]

    def checkMsg(oldName: String, newName: String): Vector[Violation] = {
      if (!seen.add((oldName, newName))) return Vector.empty // cycle guard
      (oldFs.findMessage(oldName), newFs.findMessage(newName)) match {
        case (Some(om), Some(nm)) => checkFields(om, nm)
        case (Some(om), None) =>
          Vector(Violation(oldName, "", 0, "message_removed",
            s"message ${om.fullName} missing from the candidate file set"))
        case _ => Vector.empty
      }
    }

    def checkFields(om: MessageDesc, nm: MessageDesc): Vector[Violation] = {
      val newByNum = nm.fields.map(f => f.number -> f).toMap
      val byNumber = om.fields.flatMap { of =>
        newByNum.get(of.number) match {
          case None => Vector.empty // removed: null-fill on read, compatible
          case Some(nf) =>
            val wire =
              if (wireClass(of) != wireClass(nf))
                Vector(Violation(om.fullName, of.name, of.number, "wire_type",
                  s"${of.tpe} (${wireClass(of)}) -> ${nf.tpe} (${wireClass(nf)})"))
              else Vector.empty
            val sem =
              if (wire.nonEmpty || of.tpe == nf.tpe || widenings((of.tpe, nf.tpe)))
                Vector.empty
              else Vector(Violation(om.fullName, of.name, of.number, "type_change",
                s"${of.tpe} -> ${nf.tpe} is not a sanctioned widening"))
            val lab =
              if (of.repeated != nf.repeated)
                Vector(Violation(om.fullName, of.name, of.number, "label",
                  s"${if (of.repeated) "repeated -> singular" else "singular -> repeated"}"))
              else Vector.empty
            val nested =
              if (of.tpe == TYPE_MESSAGE && nf.tpe == TYPE_MESSAGE)
                checkMsg(of.typeName.stripPrefix("."), nf.typeName.stripPrefix("."))
              else Vector.empty
            wire ++ sem ++ lab ++ nested
        }
      }
      // a name that MOVED to a different number forks the column identity
      val oldByName = om.fields.map(f => f.name -> f.number).toMap
      val moved = nm.fields.flatMap { nf =>
        oldByName.get(nf.name) match {
          case Some(oldNum) if oldNum != nf.number =>
            Vector(Violation(om.fullName, nf.name, nf.number, "name_moved",
              s"field '${nf.name}' moved from #$oldNum to #${nf.number}; " +
                "number identity would fork the column"))
          case _ => Vector.empty
        }
      }
      byNumber ++ moved
    }

    checkMsg(messageType, messageType)
  }

  /** Register `fs` as `key` only if compatible with the registry's CURRENT
    * latest version of the same schemaId (first registration is always
    * accepted). Throws with every violation listed otherwise. */
  def registerChecked(registry: DescriptorRegistry, key: SchemaKey, fs: FileSet,
      messageType: String): DescriptorRegistry = {
    val base = registry.fileSet(SchemaKey(key.schemaId, -1))
    base.foreach { oldFs =>
      val vs = check(oldFs, fs, messageType)
      if (vs.nonEmpty)
        throw new IllegalArgumentException(
          s"incompatible schema ${key.schemaId} v${key.version}:\n  " + vs.mkString("\n  "))
    }
    registry.withSchema(key, fs)
  }
}
