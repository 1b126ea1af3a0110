package graft.proto

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeType
import java.util.Base64
import scala.collection.immutable.TreeMap
import graft.proto.Descriptors._
import graft.proto.Descriptors.FType._
import PValue._

/** proto3 canonical JSON mapping (https://protobuf.dev/programming-guides/json/)
  * — parity with protobuf-java's JsonFormat used by the reference
  * (/root/reference/src/main/java/com/github/whiver/nifi/mapper/JSONMapper.java:44-60):
  * lowerCamelCase names, default-valued singular fields omitted on print,
  * enums as names, bytes as base64, int64/uint64 as strings,
  * google.protobuf.Timestamp as RFC3339. Parser is strict: unknown fields
  * are an error (JsonFormat.parser() default).
  */
object ProtoJson {

  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------------ print

  def toJson(fs: FileSet, m: DynMsg, pretty: Boolean = true): String = {
    val sb = new StringBuilder
    printMsg(fs, m, sb, if (pretty) 0 else -1)
    sb.toString
  }

  private def indent(sb: StringBuilder, level: Int): Unit =
    if (level >= 0) { sb.append('\n'); sb.append("  " * level) }

  private def printMsg(fs: FileSet, m: DynMsg, sb: StringBuilder, level: Int): Unit = {
    // Timestamp well-known special form
    if (m.desc.fullName == "google.protobuf.Timestamp") {
      sb.append(quote(timestampToRfc3339(m))); return
    }
    val entries = m.desc.fieldsInNumberOrder.flatMap { f =>
      m.fields.get(f.number).flatMap { v =>
        // proto3 canonical JSON omits default-valued singular fields —
        // EXCEPT fields with explicit presence (proto3 optional, oneof
        // members, proto2): set-but-default still prints (JsonFormat parity)
        if (!f.repeated && !f.explicitPresence && DynMsg.isDefault(f, v)) None else Some((f, v))
      }
    }
    if (entries.isEmpty) { sb.append("{}"); return }
    sb.append('{')
    var first = true
    entries.foreach { case (f, v) =>
      if (!first) sb.append(if (level >= 0) "," else ",")
      first = false
      indent(sb, if (level >= 0) level + 1 else -1)
      sb.append(quote(f.jsonName)).append(if (level >= 0) ": " else ":")
      printValue(fs, f, v, sb, level)
    }
    indent(sb, level)
    sb.append('}')
  }

  private def printValue(fs: FileSet, f: FieldDesc, v: PValue, sb: StringBuilder, level: Int): Unit = v match {
    case PList(vs) if isMapField(fs, f) =>
      // proto map: object keyed by stringified key
      sb.append('{')
      var first = true
      vs.foreach { case PMsg(entry) =>
        if (!first) sb.append(',')
        first = false
        indent(sb, if (level >= 0) level + 1 else -1)
        val entryDesc = entry.desc
        val keyF = entryDesc.fieldByNumber(1)
        val valF = entryDesc.fieldByNumber(2)
        val key = entry.fields.getOrElse(1, defaultValue(keyF))
        sb.append(quote(mapKeyString(key))).append(if (level >= 0) ": " else ":")
        printValue(fs, valF, entry.fields.getOrElse(2, defaultValue(valF)), sb,
          if (level >= 0) level + 1 else -1)
        case other => throw new MessageEncodingException(s"map field ${f.name}: non-message entry $other")
      }
      indent(sb, level)
      sb.append('}')
    case PList(vs) =>
      sb.append('[')
      var first = true
      vs.foreach { e =>
        if (!first) sb.append(if (level >= 0) ", " else ",")
        first = false
        printValue(fs, f, e, sb, if (level >= 0) level + 1 else -1)
      }
      sb.append(']')
    case PMsg(m) => printMsg(fs, m, sb, if (level >= 0) level + 1 else -1)
    case PStr(s) => sb.append(quote(s))
    case PBytes(b) => sb.append(quote(Base64.getEncoder.encodeToString(b)))
    case PBool(b) => sb.append(b.toString)
    case PDouble(d) => sb.append(printDouble(d))
    case PFloat(fl) => sb.append(printFloat(fl))
    case PEnum(n) =>
      val ed = fs.enumFor(f)
      ed.byNumber.get(n) match {
        case Some(name) => sb.append(quote(name))
        case None => sb.append(n.toString) // unknown enum value prints as number
      }
    case PLong(l) => f.tpe match {
      case TYPE_INT64 | TYPE_SINT64 | TYPE_SFIXED64 => sb.append(quote(l.toString))
      case TYPE_UINT64 | TYPE_FIXED64 => sb.append(quote(java.lang.Long.toUnsignedString(l)))
      case _ => sb.append(l.toString) // 32-bit ints print as JSON numbers
    }
  }

  private def printDouble(d: Double): String =
    if (d.isNaN) "\"NaN\""
    else if (d.isPosInfinity) "\"Infinity\""
    else if (d.isNegInfinity) "\"-Infinity\""
    else if (d == 0.0 && 1.0 / d < 0) "-0.0"
    else if (d == Math.floor(d) && !d.isInfinite && Math.abs(d) < 1e15) {
      val l = d.toLong
      if (l.toDouble == d) s"$l.0" else d.toString
    } else d.toString

  private def printFloat(f: Float): String =
    if (f.isNaN) "\"NaN\""
    else if (f.isPosInfinity) "\"Infinity\""
    else if (f.isNegInfinity) "\"-Infinity\""
    else printDouble(f.toDouble)

  private def mapKeyString(k: PValue): String = k match {
    case PStr(s) => s
    case PLong(l) => l.toString
    case PBool(b) => b.toString
    case other => throw new MessageEncodingException(s"invalid map key $other")
  }

  private def defaultValue(f: FieldDesc): PValue = f.tpe match {
    case TYPE_STRING => PStr("")
    case TYPE_BYTES => PBytes(Array.emptyByteArray)
    case TYPE_BOOL => PBool(false)
    case TYPE_DOUBLE => PDouble(0.0)
    case TYPE_FLOAT => PFloat(0.0f)
    case TYPE_ENUM => PEnum(0)
    case TYPE_MESSAGE => throw new MessageEncodingException(s"no default for message field ${f.name}")
    case _ => PLong(0L)
  }

  def isMapField(fs: FileSet, f: FieldDesc): Boolean =
    f.repeated && f.tpe == TYPE_MESSAGE && fs.findMessage(f.typeName).exists(_.isMapEntry)

  private def quote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  // ------------------------------------------------------------- timestamp

  def timestampToRfc3339(m: DynMsg): String = {
    val seconds = m.fields.get(1).collect { case PLong(l) => l }.getOrElse(0L)
    val nanos = m.fields.get(2).collect { case PLong(l) => l.toInt }.getOrElse(0)
    val inst = java.time.Instant.ofEpochSecond(seconds, nanos.toLong)
    // JsonFormat prints 0/3/6/9 fractional digits
    val base = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC).format(inst)
    val frac =
      if (nanos == 0) ""
      else if (nanos % 1000000 == 0) f".${nanos / 1000000}%03d"
      else if (nanos % 1000 == 0) f".${nanos / 1000}%06d"
      else f".$nanos%09d"
    base + frac + "Z"
  }

  def rfc3339ToTimestamp(desc: MessageDesc, s: String): DynMsg = {
    val inst = java.time.Instant.parse(s)
    var fields = TreeMap.empty[Int, PValue]
    if (inst.getEpochSecond != 0) fields += (1 -> PLong(inst.getEpochSecond))
    if (inst.getNano != 0) fields += (2 -> PLong(inst.getNano.toLong))
    DynMsg(desc, fields)
  }

  // ------------------------------------------------------------------ parse

  def fromJson(fs: FileSet, desc: MessageDesc, json: String): DynMsg = {
    val root = try mapper.readTree(json) catch {
      case e: Exception => throw new MessageEncodingException(s"invalid JSON: ${e.getMessage}", e)
    }
    if (root == null || !root.isObject)
      throw new MessageEncodingException("JSON root must be an object")
    parseMsg(fs, desc, root)
  }

  private def parseMsg(fs: FileSet, desc: MessageDesc, node: JsonNode): DynMsg = {
    if (desc.fullName == "google.protobuf.Timestamp" && node.getNodeType == JsonNodeType.STRING)
      return rfc3339ToTimestamp(desc, node.asText())
    var fields = TreeMap.empty[Int, PValue]
    val it = node.properties().iterator()
    while (it.hasNext) {
      val e = it.next()
      val f = desc.fieldByJsonName.getOrElse(e.getKey,
        throw new MessageEncodingException(
          s"Cannot find field: ${e.getKey} in message ${desc.fullName}"))
      val v = e.getValue
      if (!v.isNull) {
        if (isMapField(fs, f)) {
          val entryDesc = fs.messageFor(f)
          val keyF = entryDesc.fieldByNumber(1)
          val valF = entryDesc.fieldByNumber(2)
          var entries = Vector.empty[PValue]
          val mit = v.properties().iterator()
          while (mit.hasNext) {
            val me = mit.next()
            val kv = parseMapKey(keyF, me.getKey)
            val vv = parseValue(fs, valF, me.getValue)
            entries :+= PMsg(DynMsg(entryDesc, TreeMap(1 -> kv, 2 -> vv)))
          }
          fields += (f.number -> PList(entries))
        } else if (f.repeated) {
          if (!v.isArray) throw new MessageEncodingException(s"field ${f.name}: expected JSON array")
          val vs = Vector.tabulate(v.size())(i => parseValue(fs, f, v.get(i)))
          fields += (f.number -> PList(vs))
        } else {
          fields += (f.number -> parseValue(fs, f, v))
        }
      }
    }
    DynMsg(desc, fields)
  }

  private def parseMapKey(f: FieldDesc, key: String): PValue = f.tpe match {
    case TYPE_STRING => PStr(key)
    case TYPE_BOOL => PBool(key == "true")
    case TYPE_INT32 | TYPE_SINT32 | TYPE_SFIXED32 | TYPE_UINT32 | TYPE_FIXED32 |
        TYPE_INT64 | TYPE_SINT64 | TYPE_SFIXED64 => PLong(key.toLong)
    case TYPE_UINT64 | TYPE_FIXED64 => PLong(java.lang.Long.parseUnsignedLong(key))
    case other => throw new MessageEncodingException(s"invalid map key type $other")
  }

  private def parseValue(fs: FileSet, f: FieldDesc, v: JsonNode): PValue = f.tpe match {
    case TYPE_MESSAGE => PMsg(parseMsg(fs, fs.messageFor(f), v))
    case TYPE_STRING => PStr(v.asText())
    case TYPE_BYTES => PBytes(Base64.getDecoder.decode(v.asText()))
    case TYPE_BOOL =>
      if (v.isBoolean) PBool(v.asBoolean())
      else throw new MessageEncodingException(s"field ${f.name}: expected boolean")
    case TYPE_DOUBLE => PDouble(parseFpText(v))
    case TYPE_FLOAT => PFloat(parseFpText(v).toFloat)
    case TYPE_ENUM =>
      val ed = fs.enumFor(f)
      if (v.isNumber) PEnum(v.asInt())
      else ed.byName.get(v.asText()) match {
        case Some(n) => PEnum(n)
        case None => throw new MessageEncodingException(
          s"Invalid enum value: ${v.asText()} for enum type ${ed.fullName}")
      }
    case TYPE_UINT64 | TYPE_FIXED64 =>
      PLong(java.lang.Long.parseUnsignedLong(v.asText()))
    case TYPE_INT64 | TYPE_SINT64 | TYPE_SFIXED64 =>
      PLong(v.asText().toLong)
    case TYPE_UINT32 | TYPE_FIXED32 =>
      PLong(java.lang.Long.parseLong(v.asText()) & 0xffffffffL)
    case TYPE_INT32 | TYPE_SINT32 | TYPE_SFIXED32 =>
      PLong(v.asText().toLong.toInt.toLong)
    case other => throw new MessageEncodingException(s"unsupported field type $other")
  }

  private def parseFpText(v: JsonNode): Double =
    if (v.isNumber) v.asDouble()
    else v.asText() match {
      case "NaN" => Double.NaN
      case "Infinity" => Double.PositiveInfinity
      case "-Infinity" => Double.NegativeInfinity
      case s => s.toDouble
    }

  /** Tree-equality helper for golden tests (mirrors the reference's
    * JSON-tree assertion, ProtobufDecoderTest.java:81-87). */
  def jsonTreeEquals(a: String, b: String): Boolean =
    mapper.readTree(a) == mapper.readTree(b)
}
