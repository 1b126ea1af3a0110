package graft.proto

import graft.proto.Descriptors._
import graft.proto.Wire.Reader

/** Parser for compiled `FileDescriptorSet` (.desc) bytes — the reference's
  * DynamicSchema.parseFrom path (SchemaParser.java:69-70). descriptor.proto
  * is itself protobuf, so this walks the wire format directly with field
  * numbers from the public google/protobuf/descriptor.proto.
  */
object DescParser {

  def parseFileDescriptorSet(bytes: Array[Byte]): FileSet = {
    try {
      val r = new Reader(bytes)
      var files = Vector.empty[FileDesc]
      while (r.hasRemaining) {
        val (fn, wt) = r.readTag()
        if (fn == 1 && wt == Wire.WtLen) { // FileDescriptorSet.file
          val (p, len) = r.readSlice()
          files :+= parseFile(new Reader(r.buf, p, p + len))
        } else r.skip(wt, fn)
      }
      if (files.isEmpty) throw new SchemaLoadingException("empty FileDescriptorSet")
      fixTypeNameOnly(FileSet(files))
    } catch {
      case e: SchemaLoadingException => throw e
      case e: Exception => throw new SchemaLoadingException(s"cannot parse FileDescriptorSet: ${e.getMessage}", e)
    }
  }

  def parseFile(path: java.nio.file.Path): FileSet =
    parseFileDescriptorSet(java.nio.file.Files.readAllBytes(path))

  /** Post-pass for fields whose descriptor carried type_name without type:
    * they parsed as TYPE_MESSAGE; flip to TYPE_ENUM when the name resolves
    * only to an enum. */
  private def fixTypeNameOnly(fs: FileSet): FileSet = {
    def fixMsg(m: MessageDesc): MessageDesc = m.copy(
      fields = m.fields.map { f =>
        if (f.tpe == FType.TYPE_MESSAGE && f.typeName.nonEmpty &&
            fs.findMessage(f.typeName).isEmpty && fs.findEnum(f.typeName).isDefined)
          f.copy(tpe = FType.TYPE_ENUM)
        else f
      },
      nestedMessages = m.nestedMessages.map(fixMsg))
    FileSet(fs.files.map(fd => fd.copy(messages = fd.messages.map(fixMsg))))
  }

  // FileDescriptorProto: name=1 package=2 dependency=3 message_type=4
  //                      enum_type=5 syntax=12
  private def parseFile(r: Reader): FileDesc = {
    var name = ""; var pkg = ""; var syntax = "proto2"
    var messages = Vector.empty[RawMsg]; var enums = Vector.empty[EnumDesc]
    // enums at file scope need the package prefix; messages resolved below
    var rawEnums = Vector.empty[(String, Vector[(String, Int)])]
    while (r.hasRemaining) {
      val (fn, wt) = r.readTag()
      (fn, wt) match {
        case (1, Wire.WtLen) => name = str(r)
        case (2, Wire.WtLen) => pkg = str(r)
        case (4, Wire.WtLen) => val (p, len) = r.readSlice(); messages :+= parseMessage(new Reader(r.buf, p, p + len))
        case (5, Wire.WtLen) => val (p, len) = r.readSlice(); rawEnums :+= parseEnum(new Reader(r.buf, p, p + len))
        case (12, Wire.WtLen) => syntax = str(r)
        case _ => r.skip(wt, fn)
      }
    }
    val prefix = if (pkg.isEmpty) "" else pkg + "."
    enums = rawEnums.map { case (n, vs) => EnumDesc(n, prefix + n, vs) }
    applySyntax(FileDesc(name, pkg, messages.map(qualify(prefix, _)), enums, syntax))
  }

  /** message parsed before its full name is known. */
  private final case class RawMsg(
      name: String,
      fields: Vector[FieldDesc],
      nested: Vector[RawMsg],
      enums: Vector[(String, Vector[(String, Int)])],
      mapEntry: Boolean)

  private def qualify(prefix: String, m: RawMsg): MessageDesc = {
    val full = prefix + m.name
    MessageDesc(
      name = m.name,
      fullName = full,
      fields = m.fields,
      nestedMessages = m.nested.map(qualify(full + ".", _)),
      nestedEnums = m.enums.map { case (n, vs) => EnumDesc(n, full + "." + n, vs) },
      isMapEntry = m.mapEntry)
  }

  // DescriptorProto: name=1 field=2 nested_type=3 enum_type=4 options=7
  private def parseMessage(r: Reader): RawMsg = {
    var name = ""; var fields = Vector.empty[FieldDesc]
    var nested = Vector.empty[RawMsg]
    var enums = Vector.empty[(String, Vector[(String, Int)])]
    var mapEntry = false
    while (r.hasRemaining) {
      val (fn, wt) = r.readTag()
      (fn, wt) match {
        case (1, Wire.WtLen) => name = str(r)
        case (2, Wire.WtLen) => val (p, len) = r.readSlice(); fields :+= parseField(new Reader(r.buf, p, p + len))
        case (3, Wire.WtLen) => val (p, len) = r.readSlice(); nested :+= parseMessage(new Reader(r.buf, p, p + len))
        case (4, Wire.WtLen) => val (p, len) = r.readSlice(); enums :+= parseEnum(new Reader(r.buf, p, p + len))
        case (7, Wire.WtLen) => // MessageOptions: map_entry=7
          val (p, len) = r.readSlice()
          val opt = new Reader(r.buf, p, p + len)
          while (opt.hasRemaining) {
            val (ofn, owt) = opt.readTag()
            if (ofn == 7 && owt == Wire.WtVarint) mapEntry = opt.readVarint64() != 0L
            else opt.skip(owt, ofn)
          }
        case _ => r.skip(wt, fn)
      }
    }
    RawMsg(name, fields, nested, enums, mapEntry)
  }

  // FieldDescriptorProto: name=1 number=3 label=4 type=5 type_name=6
  //                       options=8 (FieldOptions.packed=2) json_name=10
  //                       proto3_optional=17
  private def parseField(r: Reader): FieldDesc = {
    var name = ""; var number = 0; var label = Label.OPTIONAL
    var tpe: FType = FType.TYPE_STRING; var sawType = false
    var typeName = ""; var jsonName = ""; var defaultVal: Option[String] = None
    var packedOpt: Option[Boolean] = None; var p3opt = false
    var oneofIdx: Option[Int] = None
    while (r.hasRemaining) {
      val (fn, wt) = r.readTag()
      (fn, wt) match {
        case (1, Wire.WtLen) => name = str(r)
        case (3, Wire.WtVarint) => number = r.readVarint64().toInt
        case (4, Wire.WtVarint) => label = Label(r.readVarint64().toInt)
        case (5, Wire.WtVarint) => tpe = FType(r.readVarint64().toInt); sawType = true
        case (6, Wire.WtLen) => typeName = str(r)
        case (7, Wire.WtLen) => defaultVal = Some(str(r)) // proto2 default_value
        case (8, Wire.WtLen) =>
          val (p, len) = r.readSlice()
          val opt = new Reader(r.buf, p, p + len)
          while (opt.hasRemaining) {
            val (ofn, owt) = opt.readTag()
            if (ofn == 2 && owt == Wire.WtVarint) packedOpt = Some(opt.readVarint64() != 0L)
            else opt.skip(owt, ofn)
          }
        case (9, Wire.WtVarint) => oneofIdx = Some(r.readVarint64().toInt)
        case (10, Wire.WtLen) => jsonName = str(r)
        case (17, Wire.WtVarint) => p3opt = r.readVarint64() != 0L
        case _ => r.skip(wt, fn)
      }
    }
    if (jsonName.isEmpty) jsonName = defaultJsonName(name)
    // descriptor.proto: "if type_name is set, [type] need not be set" —
    // default to MESSAGE; the post-pass flips it to ENUM when the name
    // resolves to an enum (the old TYPE_STRING fallback misdecoded the
    // embedded message bytes as UTF-8 garbage)
    if (!sawType && typeName.nonEmpty) tpe = FType.TYPE_MESSAGE
    FieldDesc(name, number, tpe, label, typeName, jsonName, packedOpt, p3opt,
      oneofIndex = oneofIdx, defaultValue = defaultVal)
  }

  // EnumDescriptorProto: name=1 value=2; EnumValueDescriptorProto: name=1 number=2
  private def parseEnum(r: Reader): (String, Vector[(String, Int)]) = {
    var name = ""; var values = Vector.empty[(String, Int)]
    while (r.hasRemaining) {
      val (fn, wt) = r.readTag()
      (fn, wt) match {
        case (1, Wire.WtLen) => name = str(r)
        case (2, Wire.WtLen) =>
          val (p, len) = r.readSlice()
          val vr = new Reader(r.buf, p, p + len)
          var vn = ""; var num = 0
          while (vr.hasRemaining) {
            val (vfn, vwt) = vr.readTag()
            (vfn, vwt) match {
              case (1, Wire.WtLen) => vn = str(vr)
              case (2, Wire.WtVarint) => num = vr.readVarint64().toInt
              case _ => vr.skip(vwt, vfn)
            }
          }
          values :+= (vn -> num)
        case _ => r.skip(wt, fn)
      }
    }
    (name, values)
  }

  private def str(r: Reader): String =
    new String(r.readBytes(), java.nio.charset.StandardCharsets.UTF_8)
}
