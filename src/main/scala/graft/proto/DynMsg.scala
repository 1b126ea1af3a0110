package graft.proto

import scala.collection.immutable.TreeMap
import graft.proto.Descriptors._
import graft.proto.Descriptors.FType._
import graft.proto.Wire.ProtoParseException

/** Dynamic message value tree — our DynamicMessage
  * (reference: DynamicMessage.parseFrom / writeTo at
  * /root/reference/src/main/java/com/github/whiver/nifi/service/ProtobufService.java:64,122).
  */
sealed trait PValue extends Serializable
object PValue {
  final case class PLong(v: Long) extends PValue           // all varint/fixed integer types
  final case class PDouble(v: Double) extends PValue
  final case class PFloat(v: Float) extends PValue
  final case class PBool(v: Boolean) extends PValue
  final case class PStr(v: String) extends PValue
  final case class PBytes(v: Array[Byte]) extends PValue
  final case class PEnum(number: Int) extends PValue
  final case class PMsg(v: DynMsg) extends PValue
  final case class PList(vs: Vector[PValue]) extends PValue
}

/** fields keyed by field number; TreeMap keeps canonical (number) order. */
final case class DynMsg(desc: MessageDesc, fields: TreeMap[Int, PValue]) extends Serializable {
  def get(number: Int): Option[PValue] = fields.get(number)
  def getByName(name: String): Option[PValue] =
    desc.fieldByName.get(name).flatMap(f => fields.get(f.number))
  def set(number: Int, v: PValue): DynMsg = copy(fields = fields.updated(number, v))
}

object DynMsg {
  import PValue._

  def empty(desc: MessageDesc): DynMsg = DynMsg(desc, TreeMap.empty)

  // ---------------------------------------------------------------- decode

  /** Decode one raw (non-delimited) message: consumes the whole buffer,
    * mirroring ProtobufService.java:64. */
  def decode(fs: FileSet, desc: MessageDesc, bytes: Array[Byte]): DynMsg =
    decodeReader(fs, desc, new Wire.Reader(bytes))

  /** protobuf-java parity: nesting deeper than 100 is rejected, so a
    * hostile/corrupt payload against a RECURSIVE schema routes to the error
    * relationship instead of killing the executor with a StackOverflowError
    * (which is an Error, not an Exception — no catch would see it). */
  val MaxNestingDepth = 100

  def decodeReader(fs: FileSet, desc: MessageDesc, r: Wire.Reader): DynMsg =
    decodeReader(fs, desc, r, 0)

  /** `endGroupFn >= 0` means this invocation decodes a GROUP body inline on
    * the shared reader: it returns at the matching END_GROUP tag instead of
    * at the buffer limit (single pass — no scan-ahead + re-decode, so a
    * payload against a RECURSIVE group schema stays O(n), not O(n×depth)). */
  private def decodeReader(fs: FileSet, desc: MessageDesc, r: Wire.Reader, depth: Int,
      endGroupFn: Int = -1): DynMsg = {
    if (depth > MaxNestingDepth)
      throw new ProtoParseException(s"message nesting exceeds $MaxNestingDepth levels")
    var acc = TreeMap.empty[Int, PValue]
    while (r.hasRemaining) {
      val (fn, wt) = r.readTag()
      if (wt == Wire.WtEndGroup) {
        if (fn == endGroupFn) return DynMsg(desc, acc)
        throw new ProtoParseException(
          if (endGroupFn >= 0) s"mismatched END_GROUP: expected $endGroupFn, got $fn"
          else "unmatched END_GROUP tag")
      }
      desc.fieldByNumber.get(fn) match {
        case None => r.skip(wt, fn) // unknown field: tolerated and dropped
        case Some(f) if wt != f.wireType &&
            !(f.repeated && isPackable(f.tpe) && wt == Wire.WtLen) =>
          // wire-type mismatch (evolved field / corrupt tag): treated as an
          // unknown field and skipped (protobuf-java parity) — parsing it
          // under the declared type would desync the stream
          r.skip(wt, fn)
        case Some(f) =>
          if (f.repeated && isPackable(f.tpe) && wt == Wire.WtLen) {
            // packed encoding
            val (p, len) = r.readSlice()
            val sub = new Wire.Reader(r.buf, p, p + len)
            var vs = acc.get(fn) match {
              case Some(PList(existing)) => existing
              case _ => Vector.empty[PValue]
            }
            while (sub.hasRemaining) vs :+= readScalar(fs, f, sub, f.wireType)
            acc = acc.updated(fn, PList(vs))
          } else {
            val v = readOne(fs, f, r, wt, depth)
            if (f.repeated) {
              val vs = acc.get(fn) match {
                case Some(PList(existing)) => existing :+ v
                case _ => Vector(v)
              }
              acc = acc.updated(fn, PList(vs))
            } else {
              // repeated occurrences of a SINGULAR field: scalars are
              // last-one-wins, but embedded messages MERGE per the protobuf
              // spec (protobuf-java DynamicMessage merges too)
              val merged = (acc.get(fn), v) match {
                case (Some(PMsg(prev)), PMsg(next)) => PMsg(mergeMsg(prev, next))
                case _ => v
              }
              // oneof: the last member seen clears its peers
              desc.oneofPeers.get(fn).foreach(_.foreach(peer => acc = acc.removed(peer)))
              acc = acc.updated(fn, merged)
            }
          }
      }
    }
    if (endGroupFn >= 0) throw new ProtoParseException("truncated group")
    DynMsg(desc, acc)
  }

  /** Protobuf message-merge semantics: singular scalars replace, repeated
    * fields concatenate, embedded messages merge recursively. */
  private def mergeMsg(a: DynMsg, b: DynMsg): DynMsg =
    DynMsg(a.desc, b.fields.foldLeft(a.fields) { case (acc0, (fn, v)) =>
      // a oneof member set in `b` clears `a`'s other members of the group
      val acc = a.desc.oneofPeers.get(fn)
        .map(_.foldLeft(acc0)(_ removed _)).getOrElse(acc0)
      acc.updated(fn, (acc.get(fn), v) match {
        case (Some(PList(xs)), PList(ys)) => PList(xs ++ ys)
        case (Some(PMsg(x)), PMsg(y)) => PMsg(mergeMsg(x, y))
        case _ => v
      })
    })

  private def readOne(fs: FileSet, f: FieldDesc, r: Wire.Reader, wt: Int, depth: Int): PValue = f.tpe match {
    case TYPE_MESSAGE =>
      if (wt != Wire.WtLen) throw new ProtoParseException(s"field ${f.name}: expected LEN wire type, got $wt")
      val (p, len) = r.readSlice()
      PMsg(decodeReader(fs, fs.messageFor(f), new Wire.Reader(r.buf, p, p + len), depth + 1))
    case TYPE_STRING =>
      if (wt != Wire.WtLen) throw new ProtoParseException(s"field ${f.name}: expected LEN wire type, got $wt")
      PStr(new String(r.readBytes(), java.nio.charset.StandardCharsets.UTF_8))
    case TYPE_BYTES =>
      if (wt != Wire.WtLen) throw new ProtoParseException(s"field ${f.name}: expected LEN wire type, got $wt")
      PBytes(r.readBytes())
    case TYPE_GROUP =>
      // proto2 group: delimited by START/END tags instead of a length
      // prefix — decoded INLINE on the shared reader up to the matching end
      // tag (protobuf-java DynamicMessage parity, single pass)
      PMsg(decodeReader(fs, fs.messageFor(f), r, depth + 1, endGroupFn = f.number))
    case _ => readScalar(fs, f, r, wt)
  }

  private def readScalar(fs: FileSet, f: FieldDesc, r: Wire.Reader, expectedWt: Int): PValue = f.tpe match {
    case TYPE_DOUBLE   => PDouble(java.lang.Double.longBitsToDouble(r.readFixed64()))
    case TYPE_FLOAT    => PFloat(java.lang.Float.intBitsToFloat(r.readFixed32()))
    case TYPE_INT64 | TYPE_UINT64 => PLong(r.readVarint64())
    case TYPE_INT32    => PLong(r.readVarint64().toInt.toLong)
    case TYPE_UINT32   => PLong(r.readVarint64().toInt & 0xffffffffL)
    case TYPE_FIXED64  => PLong(r.readFixed64())
    case TYPE_FIXED32  => PLong(r.readFixed32() & 0xffffffffL)
    case TYPE_SFIXED64 => PLong(r.readFixed64())
    case TYPE_SFIXED32 => PLong(r.readFixed32().toLong)
    case TYPE_SINT32   => PLong(Wire.zigzagDecode32(r.readVarint64().toInt).toLong)
    case TYPE_SINT64   => PLong(Wire.zigzagDecode64(r.readVarint64()))
    case TYPE_BOOL     => PBool(r.readVarint64() != 0L)
    case TYPE_ENUM     => PEnum(r.readVarint64().toInt)
    case other => throw new ProtoParseException(s"not a scalar type: $other")
  }

  // ---------------------------------------------------------------- encode

  /** Canonical serialization: fields in number order, proto3 default-valued
    * singular scalars omitted, packed repeated for packable scalars. Matches
    * protobuf-java byte output for the reference's golden fixtures
    * (ProtobufEncoderTest.java:85-88 asserts byte equality). */
  def encode(fs: FileSet, m: DynMsg): Array[Byte] = {
    val w = new Wire.Writer
    encodeTo(fs, m, w)
    w.toBytes
  }

  private def encodeTo(fs: FileSet, m: DynMsg, w: Wire.Writer): Unit = {
    // TreeMap iteration = ascending field number = canonical order
    m.fields.foreach { case (fn, v) =>
      val f = m.desc.fieldByNumber.getOrElse(
        fn, throw new MessageEncodingException(s"message ${m.desc.fullName} has no field number $fn"))
      v match {
        case PList(vs) if f.packed =>
          if (vs.nonEmpty) {
            val sub = new Wire.Writer
            vs.foreach(writeScalarPayload(f, _, sub))
            w.writeLenDelimited(fn, sub.toBytes)
          }
        case PList(vs) =>
          vs.foreach(writeField(fs, f, _, w))
        case single =>
          // proto3 implicit presence: skip default-valued singular scalars —
          // UNLESS the field has explicit presence (proto3 `optional` /
          // proto2), where a set-but-default value still serializes
          if (f.repeated || f.explicitPresence || !isDefault(f, single)) writeField(fs, f, single, w)
      }
    }
  }

  def isDefault(f: FieldDesc, v: PValue): Boolean = v match {
    case PLong(0L) => true
    case PDouble(d) => d == 0.0 && !(1.0 / d < 0) // -0.0 is not default
    case PFloat(fl) => fl == 0.0f && !(1.0 / fl < 0)
    case PBool(false) => true
    case PStr("") => true
    case PBytes(b) => b.isEmpty
    case PEnum(0) => true
    case PMsg(_) => false // message presence is explicit
    case _ => false
  }

  private def writeField(fs: FileSet, f: FieldDesc, v: PValue, w: Wire.Writer): Unit = f.tpe match {
    case TYPE_MESSAGE =>
      val sub = new Wire.Writer
      v match {
        case PMsg(m) => encodeTo(fs, m, sub)
        case other => throw new MessageEncodingException(s"field ${f.name}: expected message, got $other")
      }
      w.writeLenDelimited(f.number, sub.toBytes)
    case TYPE_GROUP =>
      v match {
        case PMsg(m) =>
          w.writeTag(f.number, Wire.WtStartGroup)
          encodeTo(fs, m, w)
          w.writeTag(f.number, Wire.WtEndGroup)
        case other => throw new MessageEncodingException(s"field ${f.name}: expected group message, got $other")
      }
    case TYPE_STRING =>
      v match {
        case PStr(s) => w.writeLenDelimited(f.number, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        case other => throw new MessageEncodingException(s"field ${f.name}: expected string, got $other")
      }
    case TYPE_BYTES =>
      v match {
        case PBytes(b) => w.writeLenDelimited(f.number, b)
        case other => throw new MessageEncodingException(s"field ${f.name}: expected bytes, got $other")
      }
    case _ =>
      w.writeTag(f.number, f.wireType)
      writeScalarPayload(f, v, w)
  }

  private def writeScalarPayload(f: FieldDesc, v: PValue, w: Wire.Writer): Unit = (f.tpe, v) match {
    case (TYPE_DOUBLE, PDouble(d))  => w.writeFixed64(java.lang.Double.doubleToLongBits(d))
    case (TYPE_FLOAT, PFloat(fl))   => w.writeFixed32(java.lang.Float.floatToIntBits(fl))
    case (TYPE_INT64 | TYPE_UINT64, PLong(l)) => w.writeVarint64(l)
    case (TYPE_INT32, PLong(l))     => w.writeVarint64(l.toInt.toLong) // sign-extends negatives to 10 bytes
    case (TYPE_UINT32, PLong(l))    => w.writeVarint64(l & 0xffffffffL)
    case (TYPE_FIXED64 | TYPE_SFIXED64, PLong(l)) => w.writeFixed64(l)
    case (TYPE_FIXED32 | TYPE_SFIXED32, PLong(l)) => w.writeFixed32(l.toInt)
    case (TYPE_SINT32, PLong(l))    => w.writeVarint64(Wire.zigzagEncode32(l.toInt).toLong & 0xffffffffL)
    case (TYPE_SINT64, PLong(l))    => w.writeVarint64(Wire.zigzagEncode64(l))
    case (TYPE_BOOL, PBool(b))      => w.writeVarint64(if (b) 1L else 0L)
    case (TYPE_ENUM, PEnum(n))      => w.writeVarint64(n.toLong)
    case (t, other) => throw new MessageEncodingException(s"field ${f.name}: type $t cannot encode $other")
  }

  // ---------------------------------------------------------------- framing

  /** Varint-length-delimited stream framing (writeDelimitedTo/parseDelimitedFrom
    * wire idiom) — the `VarintDelimited` framing from SURVEY.md §2.1. */
  def encodeDelimited(fs: FileSet, msgs: Seq[DynMsg]): Array[Byte] = {
    val w = new Wire.Writer
    msgs.foreach { m =>
      val b = encode(fs, m)
      w.writeVarint64(b.length.toLong)
      w.writeRaw(b)
    }
    w.toBytes
  }

  /** Decode a delimited stream; returns successfully decoded prefix and an
    * optional error for the malformed tail (good-prefix semantics per
    * FIXTURES.md §B). */
  def decodeDelimited(fs: FileSet, desc: MessageDesc, bytes: Array[Byte]): (Vector[DynMsg], Option[String]) = {
    val r = new Wire.Reader(bytes)
    var out = Vector.empty[DynMsg]
    var err: Option[String] = None
    while (r.hasRemaining && err.isEmpty) {
      try {
        val (p, len) = r.readSlice()
        out :+= decodeReader(fs, desc, new Wire.Reader(r.buf, p, p + len))
      } catch {
        case e: Exception => err = Some(e.getMessage)
      }
    }
    (out, err)
  }
}
