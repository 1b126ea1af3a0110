package graft.proto

/** In-memory descriptor model — our replacement for protobuf-java's
  * Descriptors / os72 DynamicSchema used by the reference
  * (/root/reference/src/main/java/com/github/whiver/nifi/parser/SchemaParser.java:69-70,
  *  /root/reference/src/main/java/com/github/whiver/nifi/service/ProtobufService.java:57-61).
  *
  * All classes are immutable + Serializable so a [[FileSet]] can ride a
  * Spark broadcast to executors.
  */
object Descriptors {

  /** proto field types (values match FieldDescriptorProto.Type numbers). */
  object FType extends Enumeration {
    val TYPE_DOUBLE = Value(1)
    val TYPE_FLOAT = Value(2)
    val TYPE_INT64 = Value(3)
    val TYPE_UINT64 = Value(4)
    val TYPE_INT32 = Value(5)
    val TYPE_FIXED64 = Value(6)
    val TYPE_FIXED32 = Value(7)
    val TYPE_BOOL = Value(8)
    val TYPE_STRING = Value(9)
    val TYPE_GROUP = Value(10)
    val TYPE_MESSAGE = Value(11)
    val TYPE_BYTES = Value(12)
    val TYPE_UINT32 = Value(13)
    val TYPE_ENUM = Value(14)
    val TYPE_SFIXED32 = Value(15)
    val TYPE_SFIXED64 = Value(16)
    val TYPE_SINT32 = Value(17)
    val TYPE_SINT64 = Value(18)
  }
  type FType = FType.Value

  /** FieldDescriptorProto.Label numbers. */
  object Label extends Enumeration {
    val OPTIONAL = Value(1)
    val REQUIRED = Value(2)
    val REPEATED = Value(3)
  }
  type Label = Label.Value

  import FType._

  def isVarintType(t: FType): Boolean = t match {
    case TYPE_INT32 | TYPE_INT64 | TYPE_UINT32 | TYPE_UINT64 | TYPE_SINT32 |
        TYPE_SINT64 | TYPE_BOOL | TYPE_ENUM => true
    case _ => false
  }
  def isFixed32Type(t: FType): Boolean = t == TYPE_FIXED32 || t == TYPE_SFIXED32 || t == TYPE_FLOAT
  def isFixed64Type(t: FType): Boolean = t == TYPE_FIXED64 || t == TYPE_SFIXED64 || t == TYPE_DOUBLE
  /** Scalar numeric types that proto3 packs by default when repeated. */
  def isPackable(t: FType): Boolean = isVarintType(t) || isFixed32Type(t) || isFixed64Type(t)

  /** snake_case → lowerCamelCase, protobuf json_name derivation. */
  def defaultJsonName(name: String): String = {
    val sb = new StringBuilder(name.length)
    var upper = false
    name.foreach {
      case '_' => upper = true
      case c if upper => sb.append(c.toUpper); upper = false
      case c => sb.append(c)
    }
    sb.toString
  }

  final case class FieldDesc(
      name: String,
      number: Int,
      tpe: FType,
      label: Label,
      /** fully-qualified ".pkg.Msg" for message/enum fields, else "". */
      typeName: String,
      jsonName: String,
      /** explicit packed option; None = syntax default (proto3: packed,
        * proto2: unpacked). */
      packedOpt: Option[Boolean] = None,
      proto3Optional: Boolean = false,
      /** field belongs to a proto2-syntax file (set by the parsers via
        * [[applySyntax]]) — all singular proto2 fields have explicit
        * presence and repeated scalars default to unpacked. */
      proto2: Boolean = false,
      /** oneof group this field belongs to (per-message index). Members
        * have explicit presence; the last member seen on the wire CLEARS
        * its peers. proto3 `optional` compiles to a synthetic single-member
        * oneof, which these semantics cover trivially. */
      oneofIndex: Option[Int] = None,
      /** proto2 explicit default (FieldDescriptorProto.default_value,
        * textual form): an ABSENT field decodes to this instead of the
        * zero value (protobuf-java parity). None for proto3 / no default. */
      defaultValue: Option[String] = None
  ) extends Serializable {
    def repeated: Boolean = label == Label.REPEATED
    /** a set-but-default-valued singular field must still serialize. */
    def explicitPresence: Boolean = proto3Optional || proto2 || oneofIndex.isDefined
    /** the proto2 default parsed into the field's Scala-side scalar type
      * (enum defaults stay the NAME string — the decoders' enum
      * representation; bytes defaults unsupported → None). */
    def parsedDefault: Option[Any] = defaultValue.flatMap { s =>
      try tpe match {
        case FType.TYPE_STRING | FType.TYPE_ENUM => Some(s)
        case FType.TYPE_BOOL => Some(s == "true")
        case FType.TYPE_DOUBLE => Some(s.toDouble)
        case FType.TYPE_FLOAT => Some(s.toFloat)
        case FType.TYPE_INT32 | FType.TYPE_SINT32 | FType.TYPE_SFIXED32 => Some(s.toInt)
        case FType.TYPE_UINT32 | FType.TYPE_FIXED32 => Some(java.lang.Long.parseLong(s) & 0xffffffffL)
        case FType.TYPE_UINT64 | FType.TYPE_FIXED64 => Some(java.lang.Long.parseUnsignedLong(s))
        case FType.TYPE_INT64 | FType.TYPE_SINT64 | FType.TYPE_SFIXED64 => Some(s.toLong)
        case _ => None // bytes (C-escaped) / message: unsupported
      } catch { case _: NumberFormatException => None }
    }
    def packed: Boolean = repeated && isPackable(tpe) && packedOpt.getOrElse(!proto2)
    def wireType: Int =
      if (tpe == FType.TYPE_GROUP) Wire.WtStartGroup
      else if (isVarintType(tpe)) Wire.WtVarint
      else if (isFixed32Type(tpe)) Wire.WtFixed32
      else if (isFixed64Type(tpe)) Wire.WtFixed64
      else Wire.WtLen
  }

  final case class EnumDesc(
      name: String,
      fullName: String,
      values: Vector[(String, Int)]
  ) extends Serializable {
    @transient lazy val byNumber: Map[Int, String] = values.reverseIterator.map(v => v._2 -> v._1).toMap
    @transient lazy val byName: Map[String, Int] = values.map(v => v._1 -> v._2).toMap
  }

  final case class MessageDesc(
      name: String,
      fullName: String,
      fields: Vector[FieldDesc],
      nestedMessages: Vector[MessageDesc],
      nestedEnums: Vector[EnumDesc],
      isMapEntry: Boolean = false
  ) extends Serializable {
    @transient lazy val fieldByNumber: Map[Int, FieldDesc] = fields.map(f => f.number -> f).toMap
    @transient lazy val fieldByName: Map[String, FieldDesc] = fields.map(f => f.name -> f).toMap
    @transient lazy val fieldByJsonName: Map[String, FieldDesc] =
      fields.map(f => f.jsonName -> f).toMap ++ fields.map(f => f.name -> f).toMap
    /** fields sorted by number — protobuf canonical serialization order. */
    @transient lazy val fieldsInNumberOrder: Vector[FieldDesc] = fields.sortBy(_.number)
    /** field number → the OTHER members of its oneof group (to clear when
      * this member is set; spec: last member seen on the wire wins). */
    @transient lazy val oneofPeers: Map[Int, Vector[Int]] = {
      val byGroup = fields.filter(_.oneofIndex.isDefined).groupBy(_.oneofIndex.get)
      byGroup.values.flatMap { grp =>
        grp.map(f => f.number -> grp.map(_.number).filterNot(_ == f.number))
      }.toMap
    }
  }

  final case class FileDesc(
      name: String,
      pkg: String,
      messages: Vector[MessageDesc],
      enums: Vector[EnumDesc],
      syntax: String = "proto3"
  ) extends Serializable

  /** Thread the file's syntax into its fields: proto2 files mark every
    * field `proto2` (explicit presence, unpacked-by-default) and clear the
    * proto3-only `proto3Optional` flag. Parsers call this once per file. */
  def applySyntax(fd: FileDesc): FileDesc =
    if (fd.syntax != "proto2") fd
    else {
      def fix(m: MessageDesc): MessageDesc = m.copy(
        fields = m.fields.map(_.copy(proto2 = true, proto3Optional = false)),
        nestedMessages = m.nestedMessages.map(fix))
      fd.copy(messages = fd.messages.map(fix))
    }

  /** A resolved set of files — equivalent of the reference's DynamicSchema
    * (descriptor pool). Message lookup accepts fully-qualified names and,
    * matching the reference behavior proven by its tests (short name "Person"
    * against package `tutorial`), unqualified short names when unambiguous.
    */
  final case class FileSet(files: Vector[FileDesc]) extends Serializable {

    @transient lazy val allMessages: Vector[MessageDesc] = {
      def walk(m: MessageDesc): Vector[MessageDesc] = m +: m.nestedMessages.flatMap(walk)
      files.flatMap(_.messages.flatMap(walk))
    }

    @transient lazy val allEnums: Vector[EnumDesc] = {
      def walk(m: MessageDesc): Vector[EnumDesc] = m.nestedEnums ++ m.nestedMessages.flatMap(walk)
      files.flatMap(f => f.enums ++ f.messages.flatMap(walk))
    }

    @transient lazy val messageByFullName: Map[String, MessageDesc] =
      allMessages.map(m => m.fullName -> m).toMap
    @transient lazy val enumByFullName: Map[String, EnumDesc] =
      allEnums.map(e => e.fullName -> e).toMap

    /** Lookup by FQ name (with or without leading dot) or unambiguous short name. */
    def findMessage(name: String): Option[MessageDesc] = {
      val n = if (name.startsWith(".")) name.drop(1) else name
      messageByFullName.get(n).orElse {
        val matches = allMessages.filter(m => m.name == n || m.fullName.endsWith("." + n))
        if (matches.size == 1) Some(matches.head) else None
      }
    }

    def findEnum(name: String): Option[EnumDesc] = {
      val n = if (name.startsWith(".")) name.drop(1) else name
      enumByFullName.get(n).orElse {
        val matches = allEnums.filter(e => e.name == n || e.fullName.endsWith("." + n))
        if (matches.size == 1) Some(matches.head) else None
      }
    }

    def messageFor(field: FieldDesc): MessageDesc =
      findMessage(field.typeName).getOrElse(
        throw new IllegalArgumentException(s"unresolved message type ${field.typeName} for field ${field.name}"))

    def enumFor(field: FieldDesc): EnumDesc =
      findEnum(field.typeName).getOrElse(
        throw new IllegalArgumentException(s"unresolved enum type ${field.typeName} for field ${field.name}"))
  }

  /** Failure taxonomy mirroring the reference's exception set
    * (/root/reference/src/main/java/com/github/whiver/nifi/exception/). */
  final class SchemaLoadingException(msg: String, cause: Throwable = null) extends RuntimeException(msg, cause)
  final class SchemaCompilationException(msg: String, cause: Throwable = null) extends RuntimeException(msg, cause)
  final class UnknownMessageTypeException(tpe: String)
      extends RuntimeException(s"Message type $tpe not found in schema")
  final class MessageDecodingException(msg: String, cause: Throwable = null) extends RuntimeException(msg, cause)
  final class MessageEncodingException(msg: String, cause: Throwable = null) extends RuntimeException(msg, cause)
}
