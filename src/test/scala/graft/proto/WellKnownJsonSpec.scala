package graft.proto

import org.scalatest.funsuite.AnyFunSuite
import graft.proto.Descriptors._

/** Well-known-type JSON parity (VERDICT r2 gap #1): the reference delegates
  * to protobuf-java's JsonFormat (JSONMapper.java:44-60), which prints
  * Duration / the wrapper types / Struct/Value/ListValue / FieldMask in
  * special scalar/JSON forms rather than as message objects. These tests
  * pin our ProtoJson to those forms with schema-defined well-known
  * descriptors, and check byte-stable re-encode through the wire codec. */
class WellKnownJsonSpec extends AnyFunSuite {

  private val wktProto =
    """syntax = "proto3";
      |package google.protobuf;
      |message Duration { int64 seconds = 1; int32 nanos = 2; }
      |message Timestamp { int64 seconds = 1; int32 nanos = 2; }
      |message DoubleValue { double value = 1; }
      |message FloatValue { float value = 1; }
      |message Int64Value { int64 value = 1; }
      |message UInt64Value { uint64 value = 1; }
      |message Int32Value { int32 value = 1; }
      |message UInt32Value { uint32 value = 1; }
      |message BoolValue { bool value = 1; }
      |message StringValue { string value = 1; }
      |message BytesValue { bytes value = 1; }
      |message Struct { map<string, Value> fields = 1; }
      |message Value {
      |  oneof kind {
      |    NullValue null_value = 1;
      |    double number_value = 2;
      |    string string_value = 3;
      |    bool bool_value = 4;
      |    Struct struct_value = 5;
      |    ListValue list_value = 6;
      |  }
      |}
      |enum NullValue { NULL_VALUE = 0; }
      |message ListValue { repeated Value values = 1; }
      |message FieldMask { repeated string paths = 1; }
      |""".stripMargin

  private val demoProto =
    """syntax = "proto3";
      |package demo;
      |message Blob {
      |  google.protobuf.Duration ttl = 1;
      |  google.protobuf.Int32Value count = 2;
      |  google.protobuf.StringValue label = 3;
      |  google.protobuf.Struct meta = 4;
      |  google.protobuf.ListValue tags = 5;
      |  google.protobuf.FieldMask mask = 6;
      |  google.protobuf.BoolValue flag = 7;
      |  google.protobuf.BytesValue raw = 8;
      |  google.protobuf.UInt64Value big = 9;
      |}
      |""".stripMargin

  private val fs = ProtoTextParser.parse(demoProto, "demo.proto",
    imports = ProtoTextParser.parse(wktProto, "wkt.proto"))
  private val blob = fs.findMessage("demo.Blob").get

  private def roundTrip(json: String): (DynMsg, String) = {
    val m = ProtoJson.fromJson(fs, blob, json)
    (m, ProtoJson.toJson(fs, m))
  }

  test("Duration prints as decimal-seconds string (JsonFormat form), incl. negative and 9-digit nanos") {
    val durDesc = fs.findMessage("google.protobuf.Duration").get
    def str(s: Long, n: Int): String = {
      import scala.collection.immutable.TreeMap
      import PValue._
      var f = TreeMap.empty[Int, PValue]
      if (s != 0) f += (1 -> PLong(s))
      if (n != 0) f += (2 -> PLong(n.toLong))
      ProtoJson.durationToString(DynMsg(durDesc, f))
    }
    assert(str(3, 0) == "3s")
    assert(str(3, 500000000) == "3.500s")
    assert(str(3, 500000) == "3.000500s")
    assert(str(0, 1) == "0.000000001s")
    assert(str(-3, -500000000) == "-3.500s")
    assert(str(0, -1) == "-0.000000001s")
    // parse inverts print
    Seq("3s", "3.500s", "0.000000001s", "-3.500s", "-0.000000001s").foreach { d =>
      assert(ProtoJson.durationToString(ProtoJson.stringToDuration(durDesc, d)) == d)
    }
    // non-numeric bodies surface as the TYPED exception, not a raw
    // NumberFormatException escaping the JSON-parse error contract
    Seq("abcs", "1.2x3s", "s", "1..2s", "--3s").foreach { bad =>
      intercept[MessageEncodingException] { ProtoJson.stringToDuration(durDesc, bad) }
    }
  }

  test("wrappers / Struct / Value / ListValue / FieldMask round-trip through canonical JSON") {
    val json =
      """{
        |  "ttl": "2.250s",
        |  "count": 0,
        |  "label": "hello",
        |  "meta": {"a": 1.5, "b": {"c": [true, null, "s"]}, "empty": {}},
        |  "tags": [1.0, "two", false, null],
        |  "mask": "fooBar.bazQux,abc",
        |  "flag": false,
        |  "raw": "aGVsbG8=",
        |  "big": "18446744073709551615"
        |}""".stripMargin
    val (m, printed) = roundTrip(json)
    assert(ProtoJson.jsonTreeEquals(printed, json),
      s"canonical print diverged:\n$printed")
    // wire round-trip: decode(encode(m)) re-prints identically and re-encodes
    // byte-identically (canonical field-number order)
    val bytes = DynMsg.encode(fs, m)
    val decoded = DynMsg.decode(fs, blob, bytes)
    assert(ProtoJson.jsonTreeEquals(ProtoJson.toJson(fs, decoded), json))
    assert(java.util.Arrays.equals(DynMsg.encode(fs, decoded), bytes))
    // wrapper presence survives: count=0 (a SET Int32Value at its default)
    // must keep printing — message fields have explicit presence
    assert(printed.contains("\"count\": 0"))
    assert(printed.contains("\"flag\": false"))
    // FieldMask paths stored snake_case, printed camelCase
    import PValue._
    val mask = m.fields(6).asInstanceOf[PMsg].v
    assert(mask.fields(1).asInstanceOf[PList].vs ==
      Vector(PStr("foo_bar.baz_qux"), PStr("abc")))
  }

  test("a JSON null on a google.protobuf.Value field parses to NULL_VALUE, not an absent field") {
    val valProto =
      """syntax = "proto3";
        |package demo2;
        |message Holder { google.protobuf.Value v = 1; int32 other = 2; }
        |""".stripMargin
    val fs2 = ProtoTextParser.parse(valProto, "demo2.proto",
      imports = ProtoTextParser.parse(wktProto, "wkt.proto"))
    val holder = fs2.findMessage("demo2.Holder").get
    val m = ProtoJson.fromJson(fs2, holder, """{"v": null}""")
    // the field is SET (to Value{null_value}) — JsonFormat parity
    assert(m.fields.contains(1))
    assert(ProtoJson.jsonTreeEquals(ProtoJson.toJson(fs2, m), """{"v": null}"""))
    // but a null on an ordinary field still clears it
    val m2 = ProtoJson.fromJson(fs2, holder, """{"other": null}""")
    assert(m2.fields.isEmpty)
  }

  test("Struct parses arbitrary JSON into Value trees and back") {
    val structDesc = fs.findMessage("google.protobuf.Struct").get
    val json = """{"s": "x", "n": -2.5, "b": true, "nul": null, "o": {"k": [1.0, {"z": []}]}}"""
    val m = ProtoJson.fromJson(fs, structDesc, json)
    assert(ProtoJson.jsonTreeEquals(ProtoJson.toJson(fs, m), json))
    val bytes = DynMsg.encode(fs, m)
    assert(ProtoJson.jsonTreeEquals(
      ProtoJson.toJson(fs, DynMsg.decode(fs, structDesc, bytes)), json))
  }

  test("Any: ordinary payload prints inline with @type; WKT payload wraps in value; round-trips byte-stably") {
    val anyProto =
      """syntax = "proto3";
        |package demo3;
        |import "google/protobuf/any.proto";
        |message Inner { string s = 1; int64 n = 2; }
        |message Carrier {
        |  google.protobuf.Any payload = 1;
        |  repeated google.protobuf.Any extras = 2;
        |}
        |""".stripMargin
    val fs3 = ProtoTextParser.parse(anyProto, "demo3.proto",
      imports = ProtoTextParser.parse(wktProto, "wkt.proto"))
    val carrier = fs3.findMessage("demo3.Carrier").get
    val reg = ProtoJson.TypeRegistry.of(fs3)

    // ordinary payload: object form with @type first
    val json =
      """{
        |  "payload": {"@type": "type.googleapis.com/demo3.Inner", "s": "hi", "n": "42"},
        |  "extras": [
        |    {"@type": "type.googleapis.com/google.protobuf.Duration", "value": "3.500s"},
        |    {"@type": "type.googleapis.com/google.protobuf.Int32Value", "value": 7},
        |    {"@type": "type.googleapis.com/google.protobuf.Struct", "value": {"k": [1.5, null]}},
        |    {}
        |  ]
        |}""".stripMargin
    val m = ProtoJson.fromJson(fs3, carrier, json, reg)
    // the Any holds REAL wire bytes of the payload type
    import PValue._
    val payloadAny = m.fields(1).asInstanceOf[PMsg].v
    assert(payloadAny.fields(1) == PStr("type.googleapis.com/demo3.Inner"))
    val innerBytes = payloadAny.fields(2).asInstanceOf[PBytes].v
    val inner = DynMsg.decode(fs3, fs3.findMessage("demo3.Inner").get, innerBytes)
    assert(inner.getByName("s").contains(PStr("hi")))
    assert(inner.getByName("n").contains(PLong(42L)))
    // print is tree-equal to the input; wire round-trip is byte-stable
    val printed = ProtoJson.toJson(fs3, m, pretty = true, registry = reg)
    assert(ProtoJson.jsonTreeEquals(printed, json), s"diverged:\n$printed")
    val bytes = DynMsg.encode(fs3, m)
    val back = DynMsg.decode(fs3, carrier, bytes)
    assert(java.util.Arrays.equals(DynMsg.encode(fs3, back), bytes))
    assert(ProtoJson.jsonTreeEquals(ProtoJson.toJson(fs3, back, registry = reg), json))
    // compact mode too
    assert(ProtoJson.jsonTreeEquals(
      ProtoJson.toJson(fs3, m, pretty = false, registry = reg), json))
  }

  test("Any: Any-in-Any nests the @type/value wrapping one level per Any") {
    val anyProto =
      """syntax = "proto3";
        |package demo4;
        |import "google/protobuf/any.proto";
        |message Inner { string s = 1; }
        |message Carrier { google.protobuf.Any a = 1; }
        |""".stripMargin
    val fs4 = ProtoTextParser.parse(anyProto, "demo4.proto")
    val carrier = fs4.findMessage("demo4.Carrier").get
    val reg = ProtoJson.TypeRegistry.of(fs4)
    val json =
      """{"a": {"@type": "type.googleapis.com/google.protobuf.Any",
        |       "value": {"@type": "type.googleapis.com/demo4.Inner", "s": "deep"}}}""".stripMargin
    val m = ProtoJson.fromJson(fs4, carrier, json, reg)
    assert(ProtoJson.jsonTreeEquals(ProtoJson.toJson(fs4, m, registry = reg), json))
    // the outer Any's bytes decode to an inner Any whose bytes decode to Inner
    import PValue._
    val anyDesc = fs4.findMessage("google.protobuf.Any").get
    val outer = m.fields(1).asInstanceOf[PMsg].v
    val mid = DynMsg.decode(fs4, anyDesc, outer.fields(2).asInstanceOf[PBytes].v)
    val leaf = DynMsg.decode(fs4, fs4.findMessage("demo4.Inner").get,
      mid.fields(2).asInstanceOf[PBytes].v)
    assert(leaf.getByName("s").contains(PStr("deep")))
  }

  test("Any: no registry / unknown type / bad url all throw the typed exception") {
    val anyProto =
      """syntax = "proto3";
        |package demo5;
        |import "google/protobuf/any.proto";
        |message Carrier { google.protobuf.Any a = 1; }
        |""".stripMargin
    val fs5 = ProtoTextParser.parse(anyProto, "demo5.proto")
    val carrier = fs5.findMessage("demo5.Carrier").get
    val reg = ProtoJson.TypeRegistry.of(fs5)
    val okJson = """{"a": {"@type": "type.googleapis.com/demo5.Carrier", "a": {}}}"""
    // parses with a registry; throws without one (JsonFormat no-registry parity)
    ProtoJson.fromJson(fs5, carrier, okJson, reg)
    intercept[MessageEncodingException] { ProtoJson.fromJson(fs5, carrier, okJson) }
    intercept[MessageEncodingException] {
      ProtoJson.fromJson(fs5, carrier,
        """{"a": {"@type": "type.googleapis.com/no.such.Type", "x": 1}}""", reg)
    }
    intercept[MessageEncodingException] {
      ProtoJson.fromJson(fs5, carrier, """{"a": {"@type": "noslash", "x": 1}}""", reg)
    }
    intercept[MessageEncodingException] {
      ProtoJson.fromJson(fs5, carrier, """{"a": {"x": 1}}""", reg) // no @type
    }
    // print without a registry throws too (non-empty Any)
    val m = ProtoJson.fromJson(fs5, carrier, okJson, reg)
    intercept[MessageEncodingException] { ProtoJson.toJson(fs5, m) }
    // an EMPTY Any prints {} and needs no registry
    val empty = ProtoJson.fromJson(fs5, carrier, """{"a": {}}""", reg)
    assert(ProtoJson.jsonTreeEquals(ProtoJson.toJson(fs5, empty), """{"a": {}}"""))
  }

  test("unknown field in a well-known context still errors (strict parser parity)") {
    intercept[MessageEncodingException] {
      ProtoJson.fromJson(fs, blob, """{"nosuch": 1}""")
    }
    // malformed Duration string
    intercept[MessageEncodingException] {
      ProtoJson.fromJson(fs, blob, """{"ttl": "3.5"}""")
    }
  }
}
