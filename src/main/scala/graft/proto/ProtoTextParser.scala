package graft.proto

import graft.proto.Descriptors._

/** Minimal proto3 text compiler — replaces the reference's shell-out to
  * protoc (SchemaParser.java:40-51, protoc-jar) which is unavailable in this
  * sandbox. Supported subset per SURVEY.md §2.1 op#8: syntax/package/import/
  * option(ignored)/message/enum/nested/repeated/optional/map/reserved(ignored)
  * plus the google.protobuf.Timestamp well-known type as a builtin.
  */
object ProtoTextParser {

  /** Builtin replacement for `import "google/protobuf/timestamp.proto"`. */
  val timestampFile: FileDesc = FileDesc(
    name = "google/protobuf/timestamp.proto",
    pkg = "google.protobuf",
    messages = Vector(MessageDesc(
      name = "Timestamp",
      fullName = "google.protobuf.Timestamp",
      fields = Vector(
        FieldDesc("seconds", 1, FType.TYPE_INT64, Label.OPTIONAL, "", "seconds"),
        FieldDesc("nanos", 2, FType.TYPE_INT32, Label.OPTIONAL, "", "nanos")),
      nestedMessages = Vector.empty,
      nestedEnums = Vector.empty)),
    enums = Vector.empty)

  /** Builtin replacement for `import "google/protobuf/any.proto"`. */
  val anyFile: FileDesc = FileDesc(
    name = "google/protobuf/any.proto",
    pkg = "google.protobuf",
    messages = Vector(MessageDesc(
      name = "Any",
      fullName = "google.protobuf.Any",
      fields = Vector(
        FieldDesc("type_url", 1, FType.TYPE_STRING, Label.OPTIONAL, "", "typeUrl"),
        FieldDesc("value", 2, FType.TYPE_BYTES, Label.OPTIONAL, "", "value")),
      nestedMessages = Vector.empty,
      nestedEnums = Vector.empty)),
    enums = Vector.empty)

  def parse(source: String, fileName: String = "inline.proto"): FileSet =
    parse(source, fileName, FileSet(Vector.empty))

  /** Compile with a pre-parsed import set: `imports`' types are visible to
    * this file's type references and its files are bundled into the result —
    * the in-JVM equivalent of the reference's
    * `protoc --include_imports -I <parent>` (SchemaParser.java:40-51). */
  def parse(source: String, fileName: String, imports: FileSet): FileSet = {
    val toks = tokenize(source)
    val p = new Parser(toks, fileName, imports.files)
    p.parseFile()
  }

  def parseFile(path: java.nio.file.Path): FileSet =
    parse(new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8), path.getFileName.toString)

  // ------------------------------------------------------------- tokenizer

  private def tokenize(src: String): Vector[String] = {
    val toks = Vector.newBuilder[String]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && src(i + 1) == '/') {
        while (i < n && src(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(src(i) == '*' && src(i + 1) == '/')) i += 1
        i += 2
      } else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && src(i) != quote) {
          if (src(i) == '\\' && i + 1 < n) { sb.append(src(i + 1)); i += 2 }
          else { sb.append(src(i)); i += 1 }
        }
        i += 1
        toks += ("\"" + sb.toString) // marker prefix distinguishes string literals
      } else if (c.isLetterOrDigit || c == '_' || c == '.' || c == '-') {
        val start = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_' || src(i) == '.' || src(i) == '-')) i += 1
        toks += src.substring(start, i)
      } else {
        toks += c.toString
        i += 1
      }
    }
    toks.result()
  }

  // ---------------------------------------------------------------- parser

  private val scalarTypes: Map[String, FType] = Map(
    "double" -> FType.TYPE_DOUBLE, "float" -> FType.TYPE_FLOAT,
    "int32" -> FType.TYPE_INT32, "int64" -> FType.TYPE_INT64,
    "uint32" -> FType.TYPE_UINT32, "uint64" -> FType.TYPE_UINT64,
    "sint32" -> FType.TYPE_SINT32, "sint64" -> FType.TYPE_SINT64,
    "fixed32" -> FType.TYPE_FIXED32, "fixed64" -> FType.TYPE_FIXED64,
    "sfixed32" -> FType.TYPE_SFIXED32, "sfixed64" -> FType.TYPE_SFIXED64,
    "bool" -> FType.TYPE_BOOL, "string" -> FType.TYPE_STRING,
    "bytes" -> FType.TYPE_BYTES)

  /** field before type-name resolution: (desc, unresolvedTypeName | ""). */
  private final case class RawField(f: FieldDesc, unresolved: String)
  private final case class RawMsg(name: String, fields: Vector[RawField],
      nested: Vector[RawMsg], enums: Vector[(String, Vector[(String, Int)])],
      mapEntries: Vector[RawMsg] = Vector.empty)

  private final class Parser(toks: Vector[String], fileName: String,
      importedFiles: Vector[FileDesc] = Vector.empty) {
    private var i = 0
    private def peek: String = if (i < toks.length) toks(i) else ""
    private def next(): String = { val t = peek; i += 1; t }
    private def expect(t: String): Unit = {
      val got = next()
      if (got != t) fail(s"expected '$t', got '$got'")
    }
    private def fail(msg: String): Nothing =
      throw new SchemaCompilationException(s"$fileName: $msg (near token $i)")

    def parseFile(): FileSet = {
      var pkg = ""
      var syntax = "proto3"
      var msgs = Vector.empty[RawMsg]
      var enums = Vector.empty[(String, Vector[(String, Int)])]
      var imports = Vector.empty[String]
      while (i < toks.length) {
        peek match {
          case "syntax" => next(); expect("="); syntax = strLit(next()); expect(";")
          case "package" => next(); pkg = next(); expect(";")
          case "import" =>
            next()
            if (peek == "public" || peek == "weak") next()
            imports :+= strLit(next()); expect(";")
          case "option" => skipOption()
          case "message" => msgs :+= parseMessage()
          case "enum" => val e = parseEnum(); enums :+= e
          case ";" => next()
          case other => fail(s"unexpected top-level token '$other'")
        }
      }
      val prefix = if (pkg.isEmpty) "" else pkg + "."
      val builtins = imports.collect {
        case imp if imp == "google/protobuf/timestamp.proto" => timestampFile
        case imp if imp == "google/protobuf/any.proto" => anyFile
      }
      val fileMsgs = msgs.map(qualify(prefix, _))
      val fileEnums = enums.map { case (n, vs) => EnumDesc(n, prefix + n, vs) }
      val fd = applySyntax(FileDesc(fileName, pkg, fileMsgs, fileEnums, syntax))
      val fs = FileSet(Vector(fd) ++ builtins ++ importedFiles)
      resolveTypes(fs)
    }

    private def strLit(t: String): String =
      if (t.startsWith("\"")) t.drop(1) else fail(s"expected string literal, got '$t'")

    private def skipOption(): Unit = {
      // option <name> = <value>; — value may be a string/ident/number or {...}
      next() // 'option'
      while (peek != "=" && peek != ";" && peek != "") next()
      if (peek == "=") {
        next()
        if (peek == "{") skipBraces() else next()
      }
      if (peek == ";") next()
    }

    private def skipBraces(): Unit = {
      expect("{")
      var depth = 1
      while (depth > 0 && i < toks.length) {
        next() match {
          case "{" => depth += 1
          case "}" => depth -= 1
          case _ =>
        }
      }
    }

    private def parseMessage(): RawMsg = {
      expect("message")
      val name = next()
      parseMsgBody(name)
    }

    /** `{ <message body> }` — shared by `message X` and proto2 `group X`
      * declarations (a group IS a nested message plus a field). */
    private def parseMsgBody(name: String): RawMsg = {
      expect("{")
      var fields = Vector.empty[RawField]
      var nested = Vector.empty[RawMsg]
      var enums = Vector.empty[(String, Vector[(String, Int)])]
      var mapEntries = Vector.empty[RawMsg]
      var oneofIdx = -1
      var done = false
      while (!done) {
        peek match {
          case "}" => next(); done = true
          case "" => fail(s"unterminated message $name")
          case "message" => nested :+= parseMessage()
          case "enum" => enums :+= parseEnum()
          case "option" => skipOption()
          case "reserved" => while (peek != ";" && peek != "") next(); next()
          case "oneof" =>
            // members become optional fields tagged with their group index:
            // explicit presence + last-member-wins clearing on decode
            next(); next(); expect("{")
            oneofIdx += 1
            while (peek != "}" && peek != "") {
              if (peek == "option") skipOption()
              else {
                val rf = parseField(Label.OPTIONAL, inOneof = true)
                fields :+= rf.copy(f = rf.f.copy(oneofIndex = Some(oneofIdx)))
              }
            }
            expect("}")
          case ";" => next()
          case _ =>
            val (rf, mapEntry, groupMsg) = parseFieldOrMap(name)
            fields :+= rf
            mapEntry.foreach(mapEntries :+= _)
            groupMsg.foreach(nested :+= _)
        }
      }
      RawMsg(name, fields, nested, enums, mapEntries)
    }

    /** handles `repeated T n = k;`, `optional T n = k;`, `T n = k;`,
      * `map<K,V> n = k;`, proto2 `optional group Name = k { ... }`.
      * Returns (field, synthesized map-entry message, synthesized group
      * message) — the latter two become nested messages of the owner. */
    private def parseFieldOrMap(ownerName: String): (RawField, Option[RawMsg], Option[RawMsg]) = {
      if (peek == "map") {
        next(); expect("<")
        val kt = next(); expect(",")
        val vt = next(); expect(">")
        val fname = next(); expect("=")
        val num = next().toInt
        skipFieldOptionsAndSemi()
        // synthesize the map-entry nested message, protoc-style
        val entryName = entryNameFor(fname)
        val keyF = scalarTypes.get(kt) match {
          case Some(t) => RawField(FieldDesc("key", 1, t, Label.OPTIONAL, "", "key"), "")
          case None => fail(s"map key must be scalar, got $kt")
        }
        val valF = scalarTypes.get(vt) match {
          case Some(t) => RawField(FieldDesc("value", 2, t, Label.OPTIONAL, "", "value"), "")
          case None => RawField(FieldDesc("value", 2, FType.TYPE_MESSAGE, Label.OPTIONAL, "", "value"), vt)
        }
        val entry = RawMsg(entryName, Vector(keyF, valF), Vector.empty, Vector.empty)
        val f = FieldDesc(fname, num, FType.TYPE_MESSAGE, Label.REPEATED, "", defaultJsonName(fname))
        (RawField(f, "?MAP:" + entryName), Some(entry), None)
      } else {
        val (label, explicitOpt) = peek match {
          case "repeated" => next(); (Label.REPEATED, false)
          case "optional" => next(); (Label.OPTIONAL, true)
          case "required" => next(); (Label.REQUIRED, false)
          case _ => (Label.OPTIONAL, false)
        }
        if (peek == "group") {
          // proto2: `optional group Meta = 1 { ... }` — protoc synthesizes a
          // nested message named like the group and a field named by its
          // LOWERCASED name, typed TYPE_GROUP
          next()
          val gname = next()
          expect("=")
          val num = next().toInt
          val body = parseMsgBody(gname)
          if (peek == ";") next()
          val fname = gname.toLowerCase(java.util.Locale.ROOT)
          val f = FieldDesc(fname, num, FType.TYPE_GROUP, label, "", defaultJsonName(fname))
          (RawField(f, gname), None, Some(body))
        } else
          (parseField(label, inOneof = false, explicitOpt = explicitOpt), None, None)
      }
    }

    private def parseField(label: Label, inOneof: Boolean, explicitOpt: Boolean = false): RawField = {
      val tpeTok = next()
      val fname = next()
      expect("=")
      val num = next().toInt
      val dflt = skipFieldOptionsAndSemi()
      // an explicit `optional` keyword in a proto3 file = explicit presence;
      // applySyntax clears this flag (and sets proto2 instead) for proto2 files
      scalarTypes.get(tpeTok) match {
        case Some(t) =>
          RawField(FieldDesc(fname, num, t, label, "", defaultJsonName(fname),
            proto3Optional = explicitOpt, defaultValue = dflt), "")
        case None =>
          // message or enum — resolved in a second pass
          RawField(FieldDesc(fname, num, FType.TYPE_MESSAGE, label, "", defaultJsonName(fname),
            proto3Optional = explicitOpt, defaultValue = dflt), tpeTok)
      }
    }

    /** Consume `[opt = v, ...]` (if present) and the trailing `;`.
      * Returns the proto2 `default = ...` value in DESCRIPTOR form (string
      * literals unquoted, numerics/bools/enum names verbatim — the same
      * text DescParser reads from default_value), so a schema compiled
      * from .proto text decodes absent fields identically to its compiled
      * .desc twin. Every other option is skipped as before. */
    private def skipFieldOptionsAndSemi(): Option[String] = {
      var dflt: Option[String] = None
      if (peek == "[") {
        next()
        while (peek != "]" && peek != "") {
          val name = next()
          if (peek == "=") {
            next()
            val v = next()
            if (name == "default")
              dflt = Some(if (v.startsWith("\"")) v.drop(1) else v)
          }
          if (peek == ",") next()
        }
        if (peek == "]") next()
      }
      if (peek == ";") next()
      dflt
    }

    private def parseEnum(): (String, Vector[(String, Int)]) = {
      expect("enum")
      val name = next()
      expect("{")
      var values = Vector.empty[(String, Int)]
      while (peek != "}" && peek != "") {
        if (peek == "option") skipOption()
        else if (peek == "reserved") { while (peek != ";" && peek != "") next(); next() }
        else {
          val vn = next(); expect("=")
          val num = next().toInt
          skipFieldOptionsAndSemi()
          values :+= (vn -> num)
        }
      }
      expect("}")
      (name, values)
    }

    // ------------------------------------------------------- qualification

    private def entryNameFor(fieldName: String): String = {
      // protoc: field name snake_case → CamelCase + "Entry"
      val camel = fieldName.split("_").filter(_.nonEmpty).map(s => s"${s.head.toUpper}${s.tail}").mkString
      camel + "Entry"
    }

    private def qualify(prefix: String, m: RawMsg): MessageDesc = {
      val full = prefix + m.name
      val entryDescs = m.mapEntries.map { e =>
        qualify(full + ".", e).copy(isMapEntry = true)
      }
      MessageDesc(
        name = m.name,
        fullName = full,
        fields = m.fields.map(rf => rf.f.copy(typeName =
          if (rf.unresolved.isEmpty) "" else "?" + rf.unresolved)), // marker: unresolved
        nestedMessages = m.nested.map(qualify(full + ".", _)) ++ entryDescs,
        nestedEnums = m.enums.map { case (n, vs) => EnumDesc(n, full + "." + n, vs) })
    }

    /** Second pass: resolve type names with protobuf scoping (innermost scope
      * outward), fix TYPE_MESSAGE → TYPE_ENUM where the target is an enum. */
    private def resolveTypes(fs: FileSet): FileSet = {
      val msgNames = fs.allMessages.map(_.fullName).toSet
      val enumNames = fs.allEnums.map(_.fullName).toSet

      def resolve(scope: String, name: String): (String, Boolean) = {
        if (name.startsWith("?MAP:")) {
          val entry = name.stripPrefix("?MAP:")
          return ("." + scope + "." + entry, false)
        }
        if (name.startsWith(".")) {
          val n = name.drop(1)
          if (msgNames(n)) return ("." + n, false)
          if (enumNames(n)) return ("." + n, true)
          throw new SchemaCompilationException(s"unresolved type $name")
        }
        var parts = scope.split('.').toVector
        while (true) {
          val cand = (parts :+ name).mkString(".")
          if (msgNames(cand)) return ("." + cand, false)
          if (enumNames(cand)) return ("." + cand, true)
          if (parts.isEmpty) throw new SchemaCompilationException(
            s"unresolved type '$name' in scope '$scope'")
          parts = parts.dropRight(1)
        }
        throw new IllegalStateException("unreachable")
      }

      def fixMsg(m: MessageDesc): MessageDesc = {
        val fixedFields = m.fields.map { f =>
          if (f.typeName.startsWith("?")) {
            val raw = f.typeName.drop(1)
            val (resolved, isEnum) = resolve(m.fullName, raw)
            if (isEnum && f.tpe == FType.TYPE_GROUP)
              throw new SchemaCompilationException(s"group field ${f.name} resolves to an enum")
            f.copy(typeName = resolved,
              tpe = if (isEnum) FType.TYPE_ENUM
                else if (f.tpe == FType.TYPE_GROUP) FType.TYPE_GROUP
                else FType.TYPE_MESSAGE)
          } else f
        }
        m.copy(fields = fixedFields, nestedMessages = m.nestedMessages.map(fixMsg))
      }

      FileSet(fs.files.map(fd => fd.copy(messages = fd.messages.map(fixMsg))))
    }
  }
}
