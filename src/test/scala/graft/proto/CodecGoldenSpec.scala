package graft.proto

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Ports the reference's golden round-trip suite (FIXTURES.md §A):
  * decode binary → JSON tree equality (ProtobufDecoderTest.java:81-87),
  * encode JSON → byte equality (ProtobufEncoderTest.java:85-88),
  * .proto text compile ≡ .desc descriptors (SchemaParserTest.java:37-42).
  */
class CodecGoldenSpec extends AnyFunSuite {

  private def res(p: String): Array[Byte] =
    Files.readAllBytes(Paths.get(getClass.getResource(p).toURI))
  private def resStr(p: String): String =
    new String(res(p), java.nio.charset.StandardCharsets.UTF_8)

  lazy val personSet = DescParser.parseFileDescriptorSet(res("/schemas/Person.desc"))
  lazy val bookSet = DescParser.parseFileDescriptorSet(res("/schemas/AddressBook.desc"))

  val pairs = Seq(
    ("Person", "/schemas/Person.desc", "/data/Person.data", "/data/Person.json"),
    ("AddressBook", "/schemas/AddressBook.desc", "/data/AddressBook_basic.data", "/data/AddressBook_basic.json"),
    ("AddressBook", "/schemas/AddressBook.desc", "/data/AddressBook_several.data", "/data/AddressBook_several.json"))

  for ((msgType, schema, dataPath, jsonPath) <- pairs) {
    test(s"decode golden: $dataPath") {
      val fs = DescParser.parseFileDescriptorSet(res(schema))
      val desc = fs.findMessage(msgType).getOrElse(fail(s"no $msgType in $schema"))
      val decoded = DynMsg.decode(fs, desc, res(dataPath))
      val json = ProtoJson.toJson(fs, decoded)
      assert(ProtoJson.jsonTreeEquals(json, resStr(jsonPath)),
        s"JSON mismatch:\n got: $json\nwant: ${resStr(jsonPath)}")
    }

    test(s"encode golden: $jsonPath") {
      val fs = DescParser.parseFileDescriptorSet(res(schema))
      val desc = fs.findMessage(msgType).getOrElse(fail(s"no $msgType in $schema"))
      val msg = ProtoJson.fromJson(fs, desc, resStr(jsonPath))
      val bytes = DynMsg.encode(fs, msg)
      assert(bytes.sameElements(res(dataPath)),
        s"byte mismatch: got ${bytes.map("%02x".format(_)).mkString(" ")} " +
          s"want ${res(dataPath).map("%02x".format(_)).mkString(" ")}")
    }
  }

  test("short-name lookup resolves Person in package tutorial") {
    // mirrors ProtobufDecoderTest.java:60 message-type resolution
    assert(personSet.findMessage("Person").exists(_.fullName == "tutorial.Person"))
    assert(personSet.findMessage("tutorial.Person").isDefined)
    assert(personSet.findMessage(".tutorial.Person").isDefined)
    assert(personSet.findMessage("NoSuchType").isEmpty)
  }

  test(".proto text compile ≡ .desc descriptors (SchemaParserTest parity)") {
    val fromText = ProtoTextParser.parse(resStr("/schemas/Person.proto"), "Person.proto")
    val fromDesc = personSet
    val mt = fromText.findMessage("tutorial.Person").get
    val md = fromDesc.findMessage("tutorial.Person").get
    assert(mt.fields.map(f => (f.name, f.number, f.tpe, f.label, f.typeName, f.jsonName)) ==
      md.fields.map(f => (f.name, f.number, f.tpe, f.label, f.typeName, f.jsonName)))
    val nt = fromText.findMessage("tutorial.Person.PhoneNumber").get
    val nd = fromDesc.findMessage("tutorial.Person.PhoneNumber").get
    assert(nt.fields.map(f => (f.name, f.number, f.tpe, f.typeName)) ==
      nd.fields.map(f => (f.name, f.number, f.tpe, f.typeName)))
    val et = fromText.findEnum("tutorial.Person.PhoneType").get
    val ed = fromDesc.findEnum("tutorial.Person.PhoneType").get
    assert(et.values == ed.values)
  }

  test("decode with .proto-compiled schema matches .desc-compiled schema") {
    val fs = ProtoTextParser.parse(resStr("/schemas/Person.proto"), "Person.proto")
    val desc = fs.findMessage("Person").get
    val decoded = DynMsg.decode(fs, desc, res("/data/Person.data"))
    assert(ProtoJson.jsonTreeEquals(ProtoJson.toJson(fs, decoded), resStr("/data/Person.json")))
  }

  test("malformed bytes raise (error route): truncated Person.data") {
    val desc = personSet.findMessage("Person").get
    val truncated = res("/data/Person.data").take(3) // cuts the varint field
    intercept[Exception] { DynMsg.decode(personSet, desc, truncated) }
  }

  test("malformed bytes raise: invalid wire type") {
    val desc = personSet.findMessage("Person").get
    intercept[Exception] { DynMsg.decode(personSet, desc, Array[Byte](0x0f, 0x01)) }
  }

  test("unknown message type yields None (UnknownMessageTypeException route)") {
    assert(personSet.findMessage("NotAMessage").isEmpty)
  }

  test("varint-delimited framing round-trip with good-prefix error semantics") {
    val fs = personSet
    val desc = fs.findMessage("Person").get
    val m1 = ProtoJson.fromJson(fs, desc, """{"name":"Me","id":666}""")
    val m2 = ProtoJson.fromJson(fs, desc, """{"name":"You","id":1,"email":"y@x.z"}""")
    val stream = DynMsg.encodeDelimited(fs, Seq(m1, m2))
    val (out, err) = DynMsg.decodeDelimited(fs, desc, stream)
    assert(out.size == 2 && err.isEmpty)
    assert(DynMsg.encode(fs, out(0)).sameElements(DynMsg.encode(fs, m1)))
    // truncated tail: good prefix survives, error reported
    val bad = stream.dropRight(3)
    val (out2, err2) = DynMsg.decodeDelimited(fs, desc, bad)
    assert(out2.size == 1 && err2.isDefined)
  }

  test("AddressBook with google.protobuf.Timestamp decodes via .desc") {
    // AddressBook.desc bundles timestamp.proto via --include_imports
    val desc = bookSet.findMessage("AddressBook").get
    assert(desc.fields.exists(_.name == "people"))
    val book = bookSet.findMessage("tutorial.AddressBook").get
    assert(bookSet.findMessage("google.protobuf.Timestamp").isDefined)
    // the fixture's actual shape: AddressBook{people}, Person{..., last_updated: Timestamp}
    assert(book.fieldByName.keySet == Set("people"))
    val person = bookSet.findMessage("tutorial.Person").get
    assert(person.fieldByName.contains("last_updated"))
    assert(person.fieldByName("last_updated").typeName.contains("Timestamp"))
  }
}
