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

  /** Type registry for `google.protobuf.Any` — the in-JVM analogue of
    * JsonFormat.TypeRegistry the reference configures on its printer/parser:
    * resolves the full type name after the last '/' of a type URL against a
    * set of compiled FileSets. Without a registry (the default), Any
    * print/parse throws, matching JsonFormat's no-registry behavior. */
  final case class TypeRegistry(filesets: Vector[FileSet]) {
    def find(typeUrl: String): (FileSet, MessageDesc) = {
      val slash = typeUrl.lastIndexOf('/')
      if (slash < 0)
        throw new MessageEncodingException(s"google.protobuf.Any: invalid type url: $typeUrl")
      val name = typeUrl.substring(slash + 1)
      filesets.iterator
        .flatMap(fs => fs.findMessage(name).map(fs -> _))
        .nextOption()
        .getOrElse(throw new MessageEncodingException(
          s"google.protobuf.Any: cannot find type $typeUrl in the type registry"))
    }
  }
  object TypeRegistry {
    val empty: TypeRegistry = TypeRegistry(Vector.empty)
    def of(fs: FileSet*): TypeRegistry = TypeRegistry(fs.toVector)
  }

  // ------------------------------------------------------------------ print

  def toJson(fs: FileSet, m: DynMsg, pretty: Boolean = true,
      registry: TypeRegistry = TypeRegistry.empty): String = {
    val sb = new StringBuilder
    printMsg(fs, m, sb, if (pretty) 0 else -1)(registry)
    sb.toString
  }

  private def indent(sb: StringBuilder, level: Int): Unit =
    if (level >= 0) { sb.append('\n'); sb.append("  " * level) }

  /** Well-known types that JsonFormat prints in a special scalar/JSON form
    * rather than as the message object (the reference inherits all of these
    * through JSONMapper.java:44-60). */
  private val wrapperTypes = Set(
    "google.protobuf.DoubleValue", "google.protobuf.FloatValue",
    "google.protobuf.Int64Value", "google.protobuf.UInt64Value",
    "google.protobuf.Int32Value", "google.protobuf.UInt32Value",
    "google.protobuf.BoolValue", "google.protobuf.StringValue",
    "google.protobuf.BytesValue")

  /** WKTs that print/parse as a special scalar/JSON form rather than as the
    * message object — JsonFormat's wellKnownTypePrinters set. An Any whose
    * PAYLOAD is one of these wraps the form as {"@type": ..., "value": ...}. */
  private def isSpecialForm(fullName: String): Boolean =
    wrapperTypes(fullName) || (fullName match {
      case "google.protobuf.Timestamp" | "google.protobuf.Duration" |
          "google.protobuf.FieldMask" | "google.protobuf.Struct" |
          "google.protobuf.Value" | "google.protobuf.ListValue" |
          "google.protobuf.Any" => true
      case _ => false
    })

  private def printMsg(fs: FileSet, m: DynMsg, sb: StringBuilder, level: Int)(
      implicit reg: TypeRegistry): Unit = {
    m.desc.fullName match {
      case "google.protobuf.Timestamp" => sb.append(quote(timestampToRfc3339(m))); return
      case "google.protobuf.Duration" => sb.append(quote(durationToString(m))); return
      case "google.protobuf.FieldMask" => sb.append(quote(fieldMaskToString(m))); return
      case n if wrapperTypes(n) =>
        // a SET wrapper prints its bare value, default included
        val vf = m.desc.fieldByNumber(1)
        printValue(fs, vf, m.fields.getOrElse(1, defaultValue(vf)), sb, level)
        return
      case "google.protobuf.Struct" =>
        val vf = m.desc.fieldByNumber(1)
        printValue(fs, vf, m.fields.getOrElse(1, PList(Vector.empty)), sb, level)
        return
      case "google.protobuf.Value" => printGoogleValue(fs, m, sb, level); return
      case "google.protobuf.ListValue" =>
        val vf = m.desc.fieldByNumber(1)
        printValue(fs, vf, m.fields.getOrElse(1, PList(Vector.empty)), sb, level)
        return
      case "google.protobuf.Any" => printAny(m, sb, level); return
      case _ => ()
    }
    printFields(fs, m, sb, level, typeUrl = None)
  }

  /** The generic object form; `typeUrl` injects the "@type" key first (the
    * Any-payload form JsonFormat prints for ordinary payload types). */
  private def printFields(fs: FileSet, m: DynMsg, sb: StringBuilder, level: Int,
      typeUrl: Option[String])(implicit reg: TypeRegistry): Unit = {
    val entries = m.desc.fieldsInNumberOrder.flatMap { f =>
      m.fields.get(f.number).flatMap { v =>
        // proto3 canonical JSON omits default-valued singular fields —
        // EXCEPT fields with explicit presence (proto3 optional, oneof
        // members, proto2): set-but-default still prints (JsonFormat parity)
        if (!f.repeated && !f.explicitPresence && DynMsg.isDefault(f, v)) None else Some((f, v))
      }
    }
    if (entries.isEmpty && typeUrl.isEmpty) { sb.append("{}"); return }
    sb.append('{')
    var first = true
    typeUrl.foreach { u =>
      indent(sb, if (level >= 0) level + 1 else -1)
      sb.append(quote("@type")).append(if (level >= 0) ": " else ":").append(quote(u))
      first = false
    }
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

  /** google.protobuf.Any print (JsonFormat Printer.printAny): an empty Any is
    * `{}`; otherwise the payload type is resolved through the registry and
    * printed inline with "@type" first — or, when the payload is itself a
    * special-form WKT, wrapped as {"@type": ..., "value": <form>}. */
  private def printAny(m: DynMsg, sb: StringBuilder, level: Int)(
      implicit reg: TypeRegistry): Unit = {
    if (m.fields.isEmpty) { sb.append("{}"); return }
    val url = m.fields.get(1) match {
      case Some(PStr(u)) => u
      case _ => throw new MessageEncodingException("google.protobuf.Any: missing type_url")
    }
    val bytes = m.fields.get(2) match {
      case Some(PBytes(b)) => b
      case None => Array.emptyByteArray
      case other => throw new MessageEncodingException(s"google.protobuf.Any: bad value field $other")
    }
    val (pfs, pdesc) = reg.find(url)
    val payload = try DynMsg.decode(pfs, pdesc, bytes) catch {
      case e: Exception => throw new MessageEncodingException(
        s"google.protobuf.Any: payload does not parse as $url: ${e.getMessage}", e)
    }
    if (isSpecialForm(pdesc.fullName)) {
      sb.append('{')
      indent(sb, if (level >= 0) level + 1 else -1)
      sb.append(quote("@type")).append(if (level >= 0) ": " else ":").append(quote(url))
      sb.append(',')
      indent(sb, if (level >= 0) level + 1 else -1)
      sb.append(quote("value")).append(if (level >= 0) ": " else ":")
      printMsg(pfs, payload, sb, if (level >= 0) level + 1 else -1)
      indent(sb, level)
      sb.append('}')
    } else printFields(pfs, payload, sb, level, typeUrl = Some(url))
  }

  private def printValue(fs: FileSet, f: FieldDesc, v: PValue, sb: StringBuilder, level: Int)(
      implicit reg: TypeRegistry): Unit = v match {
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

  /** google.protobuf.Value: exactly one oneof member set → its JSON form. */
  private def printGoogleValue(fs: FileSet, m: DynMsg, sb: StringBuilder, level: Int)(
      implicit reg: TypeRegistry): Unit = {
    m.fields.headOption match {
      case Some((1, _)) => sb.append("null") // null_value
      case Some((n @ (2 | 3 | 4 | 5 | 6), v)) => printValue(fs, m.desc.fieldByNumber(n), v, sb, level)
      case Some((other, _)) =>
        throw new MessageEncodingException(s"google.protobuf.Value: unexpected field $other")
      case None => sb.append("null") // unset Value — JsonFormat throws; print null (lenient)
    }
  }

  // ---------------------------------------------------- duration / fieldmask

  /** JsonFormat form: "3s", "3.500s", "-0.000000001s" — 0/3/6/9 frac digits. */
  def durationToString(m: DynMsg): String = {
    val seconds = m.fields.get(1).collect { case PLong(l) => l }.getOrElse(0L)
    val nanos = m.fields.get(2).collect { case PLong(l) => l.toInt }.getOrElse(0)
    val neg = seconds < 0 || nanos < 0
    val s = math.abs(seconds); val n = math.abs(nanos)
    val frac =
      if (n == 0) ""
      else if (n % 1000000 == 0) f".${n / 1000000}%03d"
      else if (n % 1000 == 0) f".${n / 1000}%06d"
      else f".$n%09d"
    (if (neg) "-" else "") + s + frac + "s"
  }

  def stringToDuration(desc: MessageDesc, str: String): DynMsg = {
    if (!str.endsWith("s"))
      throw new MessageEncodingException(s"invalid Duration: $str (must end in 's')")
    val body0 = str.dropRight(1)
    val neg = body0.startsWith("-")
    val body = if (neg) body0.drop(1) else body0
    // digits only after the optional leading '-': non-numeric bodies
    // ("--3s", "abcs", "1.2x3s") must surface as the typed
    // MessageEncodingException, never escape as a raw NumberFormatException
    def digits(s: String): Long =
      if (s.isEmpty || s.length > 18 || !s.forall(_.isDigit))
        throw new MessageEncodingException(s"invalid Duration: $str")
      else s.toLong
    val (secPart, nanoPart) = body.split('.') match {
      case Array(sp) => (digits(sp), 0)
      case Array(sp, fp) =>
        if (fp.length > 9) throw new MessageEncodingException(s"invalid Duration: $str")
        (digits(sp), digits(fp.padTo(9, '0')).toInt)
      case _ => throw new MessageEncodingException(s"invalid Duration: $str")
    }
    val sign = if (neg) -1L else 1L
    val seconds = sign * secPart
    val nanos = (sign * nanoPart).toInt
    var fields = TreeMap.empty[Int, PValue]
    if (seconds != 0) fields += (1 -> PLong(seconds))
    if (nanos != 0) fields += (2 -> PLong(nanos.toLong))
    DynMsg(desc, fields)
  }

  /** JsonFormat form: paths joined with ",", snake_case → lowerCamelCase. */
  def fieldMaskToString(m: DynMsg): String =
    m.fields.get(1).collect { case PList(vs) =>
      vs.collect { case PStr(p) =>
        p.split('.').map(Descriptors.defaultJsonName).mkString(".")
      }.mkString(",")
    }.getOrElse("")

  def stringToFieldMask(desc: MessageDesc, str: String): DynMsg = {
    def toSnake(s: String): String = {
      val sb = new StringBuilder
      s.foreach { c => if (c.isUpper) { sb.append('_'); sb.append(c.toLower) } else sb.append(c) }
      sb.toString
    }
    val paths = str.split(',').filter(_.nonEmpty).toVector
      .map(p => PStr(p.split('.').map(toSnake).mkString(".")): PValue)
    DynMsg(desc, if (paths.isEmpty) TreeMap.empty[Int, PValue] else TreeMap(1 -> (PList(paths): PValue)))
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
    // proto3 JSON allows UTC offsets ("2024-03-01T12:00:00+08:00"), which
    // Instant.parse rejects (it only takes 'Z') — parse as an offset
    // datetime and normalize to UTC, like JsonFormat. Failures surface as
    // the TYPED encoding exception, never a raw DateTimeParseException.
    val inst =
      try java.time.OffsetDateTime.parse(s,
        java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME).toInstant
      catch { case e: java.time.format.DateTimeParseException =>
        throw new MessageEncodingException(
          s"invalid Timestamp: $s (${e.getMessage})")
      }
    var fields = TreeMap.empty[Int, PValue]
    if (inst.getEpochSecond != 0) fields += (1 -> PLong(inst.getEpochSecond))
    if (inst.getNano != 0) fields += (2 -> PLong(inst.getNano.toLong))
    DynMsg(desc, fields)
  }

  // ------------------------------------------------------------------ parse

  def fromJson(fs: FileSet, desc: MessageDesc, json: String,
      registry: TypeRegistry = TypeRegistry.empty): DynMsg = {
    val root = try mapper.readTree(json) catch {
      case e: Exception => throw new MessageEncodingException(s"invalid JSON: ${e.getMessage}", e)
    }
    if (root == null || !root.isObject)
      throw new MessageEncodingException("JSON root must be an object")
    parseMsg(fs, desc, root)(registry)
  }

  private def parseMsg(fs: FileSet, desc: MessageDesc, node: JsonNode)(
      implicit reg: TypeRegistry): DynMsg = {
    desc.fullName match {
      case "google.protobuf.Timestamp" if node.getNodeType == JsonNodeType.STRING =>
        return rfc3339ToTimestamp(desc, node.asText())
      case "google.protobuf.Duration" if node.getNodeType == JsonNodeType.STRING =>
        return stringToDuration(desc, node.asText())
      case "google.protobuf.FieldMask" if node.getNodeType == JsonNodeType.STRING =>
        return stringToFieldMask(desc, node.asText())
      case n if wrapperTypes(n) =>
        // the bare JSON scalar IS the wrapper's value (presence = message set)
        val vf = desc.fieldByNumber(1)
        val v = parseValue(fs, vf, node)
        return DynMsg(desc, TreeMap(1 -> v))
      case "google.protobuf.Struct" =>
        if (!node.isObject) throw new MessageEncodingException("Struct: expected JSON object")
        // fall through to the generic path with the map under field "fields"?
        // No — the special form IS the bare object: route it through the map
        // field directly.
        val vf = desc.fieldByNumber(1)
        val entryDesc = fs.messageFor(vf)
        val valF = entryDesc.fieldByNumber(2)
        var entries = Vector.empty[PValue]
        val mit = node.properties().iterator()
        while (mit.hasNext) {
          val me = mit.next()
          val vv = parseValue(fs, valF, me.getValue)
          entries :+= PMsg(DynMsg(entryDesc, TreeMap(1 -> PStr(me.getKey), 2 -> vv)))
        }
        return DynMsg(desc,
          if (entries.isEmpty) TreeMap.empty[Int, PValue] else TreeMap(1 -> (PList(entries): PValue)))
      case "google.protobuf.Value" =>
        return parseGoogleValue(fs, desc, node)
      case "google.protobuf.ListValue" =>
        if (!node.isArray) throw new MessageEncodingException("ListValue: expected JSON array")
        val vf = desc.fieldByNumber(1)
        val vs = Vector.tabulate(node.size())(i => parseValue(fs, vf, node.get(i)))
        return DynMsg(desc,
          if (vs.isEmpty) TreeMap.empty[Int, PValue] else TreeMap(1 -> (PList(vs): PValue)))
      case "google.protobuf.Any" =>
        return parseAny(desc, node)
      case _ => ()
    }
    var fields = TreeMap.empty[Int, PValue]
    // one member per oneof (JsonFormat parity: "Field ... is already set"):
    // accepting two members would store BOTH field numbers, encode both,
    // and silently lose one to last-member-wins on the next decode
    val oneofSeen = scala.collection.mutable.Map.empty[Int, String]
    val it = node.properties().iterator()
    while (it.hasNext) {
      val e = it.next()
      val f = desc.fieldByJsonName.getOrElse(e.getKey,
        throw new MessageEncodingException(
          s"Cannot find field: ${e.getKey} in message ${desc.fullName}"))
      val v = e.getValue
      val isValueNull = v.isNull && !f.repeated && f.tpe == FType.TYPE_MESSAGE &&
        fs.findMessage(f.typeName).exists(_.fullName == "google.protobuf.Value")
      if (!v.isNull || isValueNull) f.oneofIndex.foreach { oi =>
        oneofSeen.get(oi).foreach(prev => throw new MessageEncodingException(
          s"Message ${desc.fullName}: oneof is already set by field $prev; " +
            s"cannot also set ${f.name}"))
        oneofSeen(oi) = f.name
      }
      // JSON null clears a field — EXCEPT for google.protobuf.Value, where
      // null is a legal value parsed to NULL_VALUE (JsonFormat parity)
      if (isValueNull) {
        fields += (f.number -> PMsg(parseGoogleValue(fs, fs.messageFor(f), v)))
      } else if (!v.isNull) {
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

  /** google.protobuf.Any parse (JsonFormat Parser.mergeAny): `{}` is the
    * default Any; otherwise "@type" resolves the payload type through the
    * registry, the payload parses from either the "value" key (special-form
    * WKT payloads) or the remaining object fields, and is re-encoded into
    * the Any's `value` bytes. */
  private def parseAny(desc: MessageDesc, node: JsonNode)(
      implicit reg: TypeRegistry): DynMsg = {
    if (!node.isObject)
      throw new MessageEncodingException("google.protobuf.Any: expected JSON object")
    if (node.isEmpty) return DynMsg(desc, TreeMap.empty[Int, PValue])
    val tn = node.get("@type")
    if (tn == null || !tn.isTextual)
      throw new MessageEncodingException("google.protobuf.Any: missing \"@type\"")
    val url = tn.asText()
    val (pfs, pdesc) = reg.find(url)
    val payload =
      if (isSpecialForm(pdesc.fullName)) {
        val v = node.get("value")
        if (v == null) throw new MessageEncodingException(
          s"google.protobuf.Any: well-known payload $url requires a \"value\" key")
        parseMsg(pfs, pdesc, v)
      } else {
        val clone = node.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
        clone.remove("@type")
        parseMsg(pfs, pdesc, clone)
      }
    val bytes = DynMsg.encode(pfs, payload)
    var fields = TreeMap[Int, PValue](1 -> PStr(url))
    if (bytes.nonEmpty) fields += (2 -> PBytes(bytes))
    DynMsg(desc, fields)
  }

  /** Any JSON node → google.protobuf.Value (null/number/string/bool/object/array). */
  private def parseGoogleValue(fs: FileSet, desc: MessageDesc, node: JsonNode)(
      implicit reg: TypeRegistry): DynMsg = {
    val f: Int => FieldDesc = desc.fieldByNumber
    node.getNodeType match {
      case JsonNodeType.NULL => DynMsg(desc, TreeMap(1 -> PEnum(0))) // NULL_VALUE
      case JsonNodeType.NUMBER => DynMsg(desc, TreeMap(2 -> PDouble(node.asDouble())))
      case JsonNodeType.STRING => DynMsg(desc, TreeMap(3 -> PStr(node.asText())))
      case JsonNodeType.BOOLEAN => DynMsg(desc, TreeMap(4 -> PBool(node.asBoolean())))
      case JsonNodeType.OBJECT =>
        DynMsg(desc, TreeMap(5 -> PMsg(parseMsg(fs, fs.messageFor(f(5)), node))))
      case JsonNodeType.ARRAY =>
        DynMsg(desc, TreeMap(6 -> PMsg(parseMsg(fs, fs.messageFor(f(6)), node))))
      case other => throw new MessageEncodingException(s"google.protobuf.Value: unsupported JSON $other")
    }
  }

  private def parseMapKey(f: FieldDesc, key: String): PValue = f.tpe match {
    case TYPE_STRING => PStr(key)
    case TYPE_BOOL => PBool(key == "true")
    case TYPE_INT32 | TYPE_SINT32 | TYPE_SFIXED32 | TYPE_UINT32 | TYPE_FIXED32 |
        TYPE_INT64 | TYPE_SINT64 | TYPE_SFIXED64 => PLong(key.toLong)
    case TYPE_UINT64 | TYPE_FIXED64 => PLong(java.lang.Long.parseUnsignedLong(key))
    case other => throw new MessageEncodingException(s"invalid map key type $other")
  }

  private def parseValue(fs: FileSet, f: FieldDesc, v: JsonNode)(
      implicit reg: TypeRegistry): PValue = f.tpe match {
    case TYPE_MESSAGE | TYPE_GROUP => PMsg(parseMsg(fs, fs.messageFor(f), v))
    case _ if v.isContainerNode =>
      // Jackson's asText() on an object/array silently returns "" — without
      // this guard a {"floatField": {}} corrupts to 0.0 or escapes as a raw
      // NumberFormatException (caught by the JSON fuzz)
      throw new MessageEncodingException(
        s"field ${f.name}: expected scalar, got ${v.getNodeType}")
    case TYPE_STRING => PStr(v.asText())
    case TYPE_BYTES =>
      val s = v.asText()
      try PBytes(Base64.getDecoder.decode(s)) catch {
        case _: IllegalArgumentException =>
          // JsonFormat also accepts the URL-safe alphabet; anything else is
          // a typed error, not an escaping IllegalArgumentException
          try PBytes(Base64.getUrlDecoder.decode(s)) catch {
            case e: IllegalArgumentException =>
              throw new MessageEncodingException(s"field ${f.name}: invalid base64", e)
          }
      }
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
      if (v.asText().contains('.') || v.asText().toLowerCase.contains('e'))
        PLong(intIn(f, v, BigDecimal(0), BigDecimal("18446744073709551615")).toBigInt.longValue)
      else PLong(java.lang.Long.parseUnsignedLong(v.asText()))
    case TYPE_INT64 | TYPE_SINT64 | TYPE_SFIXED64 =>
      PLong(intIn(f, v, BigDecimal(Long.MinValue), BigDecimal(Long.MaxValue)).toLong)
    case TYPE_UINT32 | TYPE_FIXED32 =>
      PLong(intIn(f, v, BigDecimal(0), BigDecimal(4294967295L)).toLong)
    case TYPE_INT32 | TYPE_SINT32 | TYPE_SFIXED32 =>
      PLong(intIn(f, v, BigDecimal(Int.MinValue), BigDecimal(Int.MaxValue)).toLong)
    case other => throw new MessageEncodingException(s"unsupported field type $other")
  }

  /** JsonFormat numeric parity for integer fields: accept whole-valued
    * decimal/exponent forms ("1.000", "1e3"), REJECT fractional values and
    * out-of-range values (the old toLong.toInt silently truncated
    * 4294967296 → 0 — data corruption, where JsonFormat throws). */
  private def intIn(f: FieldDesc, v: JsonNode, lo: BigDecimal, hi: BigDecimal): BigDecimal = {
    val bd = try BigDecimal(v.asText()) catch {
      case e: NumberFormatException =>
        throw new MessageEncodingException(s"field ${f.name}: not a number: ${v.asText()}", e)
    }
    if (!bd.isWhole)
      throw new MessageEncodingException(s"field ${f.name}: not an integer: ${v.asText()}")
    if (bd < lo || bd > hi)
      throw new MessageEncodingException(s"field ${f.name}: out of range: ${v.asText()}")
    bd
  }

  private def parseFpText(v: JsonNode): Double =
    if (v.isNumber) v.asDouble()
    else v.asText() match {
      case "NaN" => Double.NaN
      case "Infinity" => Double.PositiveInfinity
      case "-Infinity" => Double.NegativeInfinity
      case s => try s.toDouble catch {
        case e: NumberFormatException =>
          throw new MessageEncodingException(s"not a number: '$s'", e)
      }
    }

  /** Tree-equality helper for golden tests (mirrors the reference's
    * JSON-tree assertion, ProtobufDecoderTest.java:81-87). */
  def jsonTreeEquals(a: String, b: String): Boolean =
    mapper.readTree(a) == mapper.readTree(b)
}
