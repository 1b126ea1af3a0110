package graft.decode

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.types._
import scala.collection.immutable.TreeMap
import graft.proto.{DynMsg, PValue, ProtoJson}
import graft.proto.Descriptors._
import graft.proto.Descriptors.FType._
import graft.registry.{DescriptorRegistry, SchemaKey}
import PValue._

/** The inverse of the decode stage (SURVEY.md §2.1 op #2): typed rows →
  * protobuf wire bytes via a broadcast descriptor, one resolution per
  * partition. Canonical output: fields in number order, proto3 defaults
  * omitted — byte-compatible with protobuf-java serialization. */
object Encode {

  /** Encode each row of `df` (whose columns match the descriptor's fields
    * by NAME; missing columns are simply absent) to one binary payload. */
  def encode(
      df: DataFrame,
      registry: Broadcast[DescriptorRegistry],
      key: SchemaKey,
      messageType: String): Dataset[Array[Byte]] = {

    val schema = df.schema
    df.mapPartitions { iter =>
      val reg = registry.value
      val (fs, desc) = reg.descriptor(key, messageType).getOrElse(
        throw new UnknownMessageTypeException(messageType))
      val conv = new RowToProto(fs, desc, schema)
      iter.map(row => DynMsg.encode(fs, conv(row)))
    }(Encoders.BINARY)
  }
}

/** Row → DynMsg under a descriptor: the inverse of SparkSchema.toRowAs.
  * Field matching is by column name → field name at EVERY nesting level —
  * nested converters are prebuilt from the DataFrame's ACTUAL nested
  * StructTypes, so a struct assembled in a different column order than the
  * canonical schema still maps each value to the right proto field (a
  * positional read would silently transpose same-typed fields). Types per
  * the SparkSchema mapping (enum accepts the name string, Timestamp
  * structs accept java.sql.Timestamp). */
final class RowToProto(fs: FileSet, desc: MessageDesc, schema: StructType) extends Serializable {

  private val slots: Array[(Int, FieldDesc)] =
    schema.fields.zipWithIndex.flatMap { case (sf, i) =>
      desc.fieldByName.get(sf.name).map(f => (i, f))
    }.toArray

  /** prebuilt nested converters, keyed by field number — derived from the
    * row's own nested schema (struct column, array-of-struct element, or
    * map value type), built once instead of per nested value per row. */
  private val subConvs: Map[Int, RowToProto] =
    schema.fields.flatMap { sf =>
      desc.fieldByName.get(sf.name).flatMap { f =>
        def structOf(dt: DataType): Option[StructType] = dt match {
          case st: StructType => Some(st)
          case ArrayType(st: StructType, _) => Some(st)
          case MapType(_, st: StructType, _) => Some(st)
          case _ => None
        }
        val target: Option[MessageDesc] =
          if (ProtoJson.isMapField(fs, f)) {
            val vf = fs.messageFor(f).fieldByNumber(2)
            if (vf.tpe == TYPE_MESSAGE) Some(fs.messageFor(vf)) else None
          } else if ((f.tpe == TYPE_MESSAGE &&
            fs.messageFor(f).fullName != "google.protobuf.Timestamp") ||
            f.tpe == TYPE_GROUP) Some(fs.messageFor(f))
          else None
        target.flatMap(md => structOf(sf.dataType).map(st =>
          f.number -> new RowToProto(fs, md, st)))
      }
    }.toMap

  def apply(row: Row): DynMsg = {
    var fields = TreeMap.empty[Int, PValue]
    var i = 0
    while (i < slots.length) {
      val (ordinal, f) = slots(i)
      if (!row.isNullAt(ordinal)) {
        val pv = toPValue(f, row.get(ordinal))
        // canonical proto3: omit default-valued singular fields
        val keep = pv match {
          case PList(vs) => vs.nonEmpty
          case v => f.repeated || !DynMsg.isDefault(f, v)
        }
        if (keep) fields += (f.number -> pv)
      }
      i += 1
    }
    DynMsg(desc, fields)
  }

  private def toPValue(f: FieldDesc, v: Any): PValue = {
    if (ProtoJson.isMapField(fs, f)) {
      val entry = fs.messageFor(f)
      val kf = entry.fieldByNumber(1); val vf = entry.fieldByNumber(2)
      val entries = v.asInstanceOf[scala.collection.Map[Any, Any]].toVector
        .map { case (k, vv) =>
          val pvv = if (vf.tpe == TYPE_MESSAGE) PMsg(convRow(f, vf, vv)) else one(f, vf, vv)
          PMsg(DynMsg(entry, TreeMap(1 -> scalar(kf, k), 2 -> pvv)))
        }
      PList(entries)
    } else if (f.repeated) {
      PList(v.asInstanceOf[scala.collection.Seq[Any]].toVector.map(one(f, f, _)))
    } else one(f, f, v)
  }

  /** convert a nested Row with the prebuilt by-name converter; fall back to
    * the value's own schema when the column's static type wasn't a struct. */
  private def convRow(slotField: FieldDesc, f: FieldDesc, v: Any): DynMsg = {
    val md = fs.messageFor(f)
    subConvs.get(slotField.number) match {
      case Some(c) => c(v.asInstanceOf[Row])
      case None =>
        val row = v.asInstanceOf[Row]
        val st = if (row.schema != null) row.schema else SparkSchema.structFor(fs, md)
        new RowToProto(fs, md, st)(row)
    }
  }

  private def one(slotField: FieldDesc, f: FieldDesc, v: Any): PValue = f.tpe match {
    case TYPE_MESSAGE =>
      val md = fs.messageFor(f)
      if (md.fullName == "google.protobuf.Timestamp") {
        val inst = v match {
          case ts: java.sql.Timestamp => ts.toInstant
          case inst: java.time.Instant => inst
          case other => throw new MessageEncodingException(s"field ${f.name}: not a timestamp: $other")
        }
        var fields = TreeMap.empty[Int, PValue]
        if (inst.getEpochSecond != 0) fields += (1 -> PLong(inst.getEpochSecond))
        if (inst.getNano != 0) fields += (2 -> PLong(inst.getNano.toLong))
        PMsg(DynMsg(md, fields))
      } else {
        PMsg(convRow(slotField, f, v))
      }
    case TYPE_GROUP =>
      PMsg(convRow(slotField, f, v))
    case TYPE_ENUM =>
      v match {
        case s: String => PEnum(fs.enumFor(f).byName.getOrElse(s,
          s.toIntOption.getOrElse(throw new MessageEncodingException(
            s"field ${f.name}: unknown enum value '$s'"))))
        case n: Int => PEnum(n)
        case other => throw new MessageEncodingException(s"field ${f.name}: bad enum $other")
      }
    case _ => scalar(f, v)
  }

  private def scalar(f: FieldDesc, v: Any): PValue = (f.tpe, v) match {
    case (TYPE_DOUBLE, d: Double) => PDouble(d)
    case (TYPE_FLOAT, fl: Float) => PFloat(fl)
    case (TYPE_BOOL, b: Boolean) => PBool(b)
    case (TYPE_STRING, s: String) => PStr(s)
    case (TYPE_BYTES, b: Array[Byte]) => PBytes(b)
    case (_, l: Long) => PLong(l)
    case (_, i: Int) => PLong(i.toLong)
    case (t, other) => throw new MessageEncodingException(s"field ${f.name}: $t cannot encode $other")
  }
}
