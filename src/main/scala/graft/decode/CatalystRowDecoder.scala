package graft.decode

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable.ArrayBuffer
import graft.proto.Wire
import graft.proto.Wire.{Reader, ProtoParseException}
import graft.proto.Descriptors._
import graft.proto.Descriptors.FType._
import graft.proto.ProtoJson

/** Catalyst-native twin of [[RowDecoder]]: decodes wire bytes straight into
  * `InternalRow` values — strings become ZERO-COPY `UTF8String` slices of
  * the payload buffer (no `new String` materialization and no Row →
  * InternalRow encoder pass afterwards; the exchange's UnsafeRow conversion
  * is the single copy). Same semantics as RowDecoder: reader-schema
  * projection by field number, writer-field gating, proto3 defaults,
  * singular-message merge (slice concat), oneof last-member-wins, map /
  * repeated / Timestamp handling. Equivalence is property-tested against
  * RowDecoder (EncodeDecodeSpec).
  */
final class CatalystRowDecoder(fs: FileSet, val desc: MessageDesc,
    allowed: Option[Set[Int]] = None,
    /** message names on the construction path — rejects RECURSIVE message
      * types (legal protobuf, unrepresentable as a flat InternalRow schema)
      * with the typed exception instead of overflowing the stack while
      * eagerly pre-compiling nested decoders (same guard as SparkSchema). */
    visiting: Set[String] = Set.empty) extends Serializable {

  if (visiting(desc.fullName))
    throw new SchemaLoadingException(
      s"recursive message type ${desc.fullName} cannot be row-decoded")
  private val childVisiting = visiting + desc.fullName

  private val fields: Array[FieldDesc] = desc.fieldsInNumberOrder.toArray
  private val nFields = fields.length
  // dense ordinal lookup only while it stays small: proto field numbers go
  // up to 536,870,911 — a schema using a high number must not allocate a
  // 2 GB array per decoder (sparse map fallback instead)
  private val maxNum: Int = {
    val m = if (nFields == 0) 0 else fields.map(_.number).max
    if (m <= 65536) m else -1
  }

  private val ordByNum: Array[Int] =
    if (maxNum < 0) null
    else {
      val a = Array.fill(maxNum + 1)(-1)
      fields.zipWithIndex.foreach { case (f, i) =>
        if (allowed.forall(_.contains(f.number))) a(f.number) = i
      }
      a
    }

  private val ordByNumSparse: java.util.HashMap[Integer, Integer] =
    if (maxNum >= 0) null
    else {
      val m = new java.util.HashMap[Integer, Integer]()
      fields.zipWithIndex.foreach { case (f, i) =>
        if (allowed.forall(_.contains(f.number))) m.put(f.number, i)
      }
      m
    }

  @inline private def ordOf(fn: Int): Int =
    if (ordByNum != null) { if (fn <= maxNum && fn >= 0) ordByNum(fn) else -1 }
    else { val v = ordByNumSparse.get(fn); if (v == null) -1 else v.intValue() }

  /** the wire type each field must arrive with (packed repeated scalars
    * additionally accept LEN); anything else is UNKNOWN-FIELD semantics —
    * skipped, never parsed (a mismatched wire type would desync the
    * stream and decode garbage into later fields). */
  private val expectedWt: Array[Int] = fields.map(_.wireType)

  private val isMap: Array[Boolean] = fields.map(f => ProtoJson.isMapField(fs, f))
  private val isTimestamp: Array[Boolean] = fields.map(f =>
    f.tpe == TYPE_MESSAGE && !ProtoJson.isMapField(fs, f) &&
      fs.messageFor(f).fullName == "google.protobuf.Timestamp")
  private val nestedDec: Array[CatalystRowDecoder] = fields.map { f =>
    if ((f.tpe == TYPE_MESSAGE && !ProtoJson.isMapField(fs, f) &&
      fs.messageFor(f).fullName != "google.protobuf.Timestamp") || f.tpe == TYPE_GROUP)
      new CatalystRowDecoder(fs, fs.messageFor(f), visiting = childVisiting)
    else null
  }
  private val mapEntry: Array[(FieldDesc, FieldDesc, CatalystRowDecoder, Map[Int, UTF8String])] =
    fields.zipWithIndex.map { case (f, i) =>
      if (isMap(i)) {
        val e = fs.messageFor(f)
        val vf = e.fieldByNumber(2)
        val vn = if (vf.tpe == TYPE_MESSAGE) new CatalystRowDecoder(fs, fs.messageFor(vf), visiting = childVisiting) else null
        val venums = if (vf.tpe == TYPE_ENUM)
          fs.enumFor(vf).byNumber.map { case (n, s) => n -> UTF8String.fromString(s) } else null
        (e.fieldByNumber(1), vf, vn, venums)
      } else null
    }
  private val enumNames: Array[Map[Int, UTF8String]] = fields.map { f =>
    if (f.tpe == TYPE_ENUM)
      fs.enumFor(f).byNumber.map { case (n, s) => n -> UTF8String.fromString(s) }
    else null
  }
  private val isMsg: Array[Boolean] = fields.zipWithIndex.map { case (f, i) =>
    !f.repeated && !isMap(i) && (f.tpe == TYPE_MESSAGE || f.tpe == TYPE_GROUP)
  }
  private val oneofPeerOrds: Array[Array[Int]] = {
    val ordOfNum = fields.zipWithIndex.map { case (f, i) => f.number -> i }.toMap
    fields.map { f =>
      desc.oneofPeers.get(f.number) match {
        case Some(peers) if peers.nonEmpty => peers.flatMap(ordOfNum.get).toArray
        case _ => null
      }
    }
  }

  private val emptyArray = new GenericArrayData(Array.empty[Any])
  private val emptyMap = new ArrayBasedMapData(emptyArray, emptyArray)

  private val defaults: Array[Any] = fields.zipWithIndex.map { case (f, i) =>
    if (isMap(i)) emptyMap
    else if (f.repeated) emptyArray
    else f.parsedDefault match { // proto2 explicit default (absent → this)
      case Some(s: String) => UTF8String.fromString(s) // string/enum-name
      case Some(d) => d
      case None => f.tpe match {
        case TYPE_MESSAGE | TYPE_GROUP => null
        case TYPE_STRING => UTF8String.EMPTY_UTF8
        case TYPE_BYTES => Array.emptyByteArray
        case TYPE_BOOL => java.lang.Boolean.FALSE
        case TYPE_DOUBLE => java.lang.Double.valueOf(0.0)
        case TYPE_FLOAT => java.lang.Float.valueOf(0.0f)
        case TYPE_ENUM => enumNames(i).getOrElse(0, UTF8String.fromString("0"))
        case TYPE_INT32 | TYPE_SINT32 | TYPE_SFIXED32 => java.lang.Integer.valueOf(0)
        case _ => java.lang.Long.valueOf(0L)
      }
    }
  }

  def decode(bytes: Array[Byte]): InternalRow = decode(new Reader(bytes))

  def decode(r: Reader): InternalRow = {
    val vals: Array[Any] = defaults.clone()
    var bufs: Array[AnyRef] = null
    while (r.hasRemaining) {
      val (fn, wt) = r.readTag()
      val ord = ordOf(fn)
      if (ord < 0) r.skip(wt, fn)
      else if (wt != expectedWt(ord) &&
          !(fields(ord).repeated && isPackable(fields(ord).tpe) && wt == Wire.WtLen)) {
        // wire-type mismatch (field evolved/corrupt tag): unknown-field
        // semantics — skip, don't desync (protobuf-java parity)
        r.skip(wt, fn)
      } else {
        val f = fields(ord)
        if (isMap(ord)) {
          if (bufs == null) bufs = new Array[AnyRef](nFields)
          if (bufs(ord) == null) bufs(ord) = ArrayBuffer.empty[(Any, Any)]
          val (p, len) = r.readSlice()
          bufs(ord).asInstanceOf[ArrayBuffer[(Any, Any)]] += decodeMapEntry(ord, new Reader(r.buf, p, p + len))
        } else if (f.repeated) {
          if (bufs == null) bufs = new Array[AnyRef](nFields)
          if (bufs(ord) == null) bufs(ord) = ArrayBuffer.empty[Any]
          val buf = bufs(ord).asInstanceOf[ArrayBuffer[Any]]
          if (isPackable(f.tpe) && wt == Wire.WtLen) {
            val (p, len) = r.readSlice()
            val sub = new Reader(r.buf, p, p + len)
            while (sub.hasRemaining) buf += readScalar(ord, f, sub)
          } else buf += readOne(ord, f, r, wt)
        } else if (isMsg(ord)) {
          clearOneofPeers(ord, vals, bufs)
          if (bufs == null) bufs = new Array[AnyRef](nFields)
          if (bufs(ord) == null) bufs(ord) = ArrayBuffer.empty[(Int, Int)]
          // group content is tag-delimited, not length-prefixed (the
          // wire-type guard above already pinned wt to the declared type).
          // The scan-then-decode here is O(n × group depth), fine because
          // this decoder REJECTS recursive schemas at construction — depth
          // is the static schema depth, not attacker-controlled
          val slice = if (f.tpe == TYPE_GROUP) r.groupSlice(fn) else r.readSlice()
          bufs(ord).asInstanceOf[ArrayBuffer[(Int, Int)]] += slice
        } else {
          clearOneofPeers(ord, vals, bufs)
          vals(ord) = readOne(ord, f, r, wt)
        }
      }
    }
    if (bufs != null) {
      var i = 0
      while (i < nFields) {
        val b = bufs(i)
        if (b != null) {
          vals(i) =
            if (isMap(i)) {
              val entries = b.asInstanceOf[ArrayBuffer[(Any, Any)]]
              // proto map semantics: last entry per key wins
              val seen = new java.util.LinkedHashMap[Any, Any]()
              entries.foreach { case (k, v) => seen.remove(k); seen.put(k, v) }
              val ks = new Array[Any](seen.size); val vs = new Array[Any](seen.size)
              var j = 0
              seen.forEach { (k, v) => ks(j) = k; vs(j) = v; j += 1 }
              new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
            } else if (isMsg(i)) {
              val slices = b.asInstanceOf[ArrayBuffer[(Int, Int)]]
              val sub =
                if (slices.length == 1) new Reader(r.buf, slices(0)._1, slices(0)._1 + slices(0)._2)
                else {
                  val total = slices.iterator.map(_._2).sum
                  val cat = new Array[Byte](total)
                  var off = 0
                  slices.foreach { case (p, len) =>
                    System.arraycopy(r.buf, p, cat, off, len); off += len
                  }
                  new Reader(cat)
                }
              if (isTimestamp(i)) decodeTimestampMicros(sub) else nestedDec(i).decode(sub)
            }
            else new GenericArrayData(b.asInstanceOf[ArrayBuffer[Any]].toArray)
        }
        i += 1
      }
    }
    new GenericInternalRow(vals)
  }

  private def clearOneofPeers(ord: Int, vals: Array[Any], bufs: Array[AnyRef]): Unit = {
    val peers = oneofPeerOrds(ord)
    if (peers != null) {
      var i = 0
      while (i < peers.length) {
        vals(peers(i)) = defaults(peers(i))
        if (bufs != null) bufs(peers(i)) = null
        i += 1
      }
    }
  }

  private def decodeMapEntry(ord: Int, r: Reader): (Any, Any) = {
    val (kf, vf, vn, venums) = mapEntry(ord)
    // the spec allows entries with missing key/value: defaults must match
    // the declared Catalyst type (e.g. enum → the 0-value's NAME string,
    // bytes → empty array — never a Long 0, which would CCE at UnsafeRow
    // conversion)
    var k: Any = kf.tpe match {
      case TYPE_STRING => UTF8String.EMPTY_UTF8
      case TYPE_BOOL => java.lang.Boolean.FALSE
      case TYPE_INT32 | TYPE_SINT32 | TYPE_SFIXED32 => java.lang.Integer.valueOf(0)
      case _ => java.lang.Long.valueOf(0L)
    }
    var v: Any = vf.tpe match {
      case TYPE_MESSAGE => null
      case TYPE_STRING => UTF8String.EMPTY_UTF8
      case TYPE_BYTES => Array.emptyByteArray
      case TYPE_ENUM => venums.getOrElse(0, UTF8String.fromString("0"))
      case TYPE_BOOL => java.lang.Boolean.FALSE
      case TYPE_DOUBLE => java.lang.Double.valueOf(0.0)
      case TYPE_FLOAT => java.lang.Float.valueOf(0.0f)
      case TYPE_INT32 | TYPE_SINT32 | TYPE_SFIXED32 => java.lang.Integer.valueOf(0)
      case _ => java.lang.Long.valueOf(0L)
    }
    def kvValue(f: FieldDesc): Any = f.tpe match {
      case TYPE_STRING =>
        val (p, len) = r.readSlice()
        UTF8String.fromBytes(r.buf, p, len)
      case TYPE_BYTES => r.readBytes()
      case TYPE_MESSAGE =>
        val (p, len) = r.readSlice()
        vn.decode(new Reader(r.buf, p, p + len))
      case TYPE_ENUM =>
        // enum map values print as NAMES, same as singular/repeated enums
        val n = r.readVarint64().toInt
        venums.getOrElse(n, UTF8String.fromString(n.toString))
      case _ => readScalarField(f, r)
    }
    while (r.hasRemaining) {
      val (fn, wt) = r.readTag()
      if (fn == 1 && wt == kf.wireType) k = kvValue(kf)
      else if (fn == 2 && wt == vf.wireType) v = kvValue(vf)
      else r.skip(wt, fn) // unknown field / mismatched wire type
    }
    (k, v)
  }

  private def readOne(ord: Int, f: FieldDesc, r: Reader, wt: Int): Any = f.tpe match {
    case TYPE_MESSAGE =>
      if (wt != Wire.WtLen) throw new ProtoParseException(s"field ${f.name}: expected LEN, got $wt")
      val (p, len) = r.readSlice()
      if (isTimestamp(ord)) decodeTimestampMicros(new Reader(r.buf, p, p + len))
      else nestedDec(ord).decode(new Reader(r.buf, p, p + len))
    case TYPE_GROUP =>
      val (p, len) = r.groupSlice(f.number)
      nestedDec(ord).decode(new Reader(r.buf, p, p + len))
    case TYPE_STRING =>
      if (wt != Wire.WtLen) throw new ProtoParseException(s"field ${f.name}: expected LEN, got $wt")
      val (p, len) = r.readSlice()
      // Zero-copy slice, raw bytes kept VERBATIM even if not valid UTF-8 —
      // protobuf-java parity (ByteString stores the wire bytes; lazy
      // replacement happens only on String access), and what keeps a
      // decode→re-encode round trip byte-identical. KNOWN DIVERGENCE: the
      // Row-based twin (RowDecoder) goes through new String(..., UTF_8),
      // which U+FFFD-substitutes malformed sequences — out-of-contract
      // input (proto strings MUST be UTF-8) can therefore hash/compare
      // differently between the two paths. Eager validation here was
      // measured at 15-30% off the bulk decode throughput — not worth
      // paying on every valid string to normalize a protocol violation.
      UTF8String.fromBytes(r.buf, p, len)
    case TYPE_BYTES =>
      if (wt != Wire.WtLen) throw new ProtoParseException(s"field ${f.name}: expected LEN, got $wt")
      r.readBytes()
    case _ => readScalar(ord, f, r)
  }

  private def readScalar(ord: Int, f: FieldDesc, r: Reader): Any = f.tpe match {
    case TYPE_ENUM =>
      val n = r.readVarint64().toInt
      enumNames(ord).getOrElse(n, UTF8String.fromString(n.toString))
    case _ => readScalarField(f, r)
  }

  private def readScalarField(f: FieldDesc, r: Reader): Any = f.tpe match {
    case TYPE_DOUBLE => java.lang.Double.longBitsToDouble(r.readFixed64())
    case TYPE_FLOAT => java.lang.Float.intBitsToFloat(r.readFixed32())
    case TYPE_INT64 | TYPE_UINT64 => r.readVarint64()
    case TYPE_INT32 => r.readVarint64().toInt
    case TYPE_UINT32 => r.readVarint64().toInt & 0xffffffffL
    case TYPE_FIXED64 | TYPE_SFIXED64 => r.readFixed64()
    case TYPE_FIXED32 => r.readFixed32() & 0xffffffffL
    case TYPE_SFIXED32 => r.readFixed32()
    case TYPE_SINT32 => Wire.zigzagDecode32(r.readVarint64().toInt)
    case TYPE_SINT64 => Wire.zigzagDecode64(r.readVarint64())
    case TYPE_BOOL => r.readVarint64() != 0L
    case TYPE_ENUM => UTF8String.fromString(r.readVarint64().toInt.toString)
    case other => throw new ProtoParseException(s"not a scalar: $other")
  }

  /** catalyst TimestampType = micros since epoch. */
  private def decodeTimestampMicros(r: Reader): java.lang.Long = {
    var secs = 0L; var nanos = 0L
    while (r.hasRemaining) {
      val (fn, wt) = r.readTag()
      if (fn == 1 && wt == Wire.WtVarint) secs = r.readVarint64()
      else if (fn == 2 && wt == Wire.WtVarint) nanos = r.readVarint64()
      else r.skip(wt, fn)
    }
    java.lang.Long.valueOf(secs * 1000000L + nanos / 1000L)
  }
}
