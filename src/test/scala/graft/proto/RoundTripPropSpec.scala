package graft.proto

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import scala.collection.immutable.TreeMap
import graft.proto.Descriptors._
import PValue._

/** Property-based round-trips (SURVEY.md §5.2 item 2):
  * ∀ messages under a fixed kitchen-sink descriptor,
  * decode(encode(m)) == m, and JSON parse(print(m)) == m. */
class RoundTripPropSpec extends AnyFunSuite {

  /** deterministic forAll over 200 samples (scalatestplus bridge is not in
    * the offline cache, so we drive Gen directly). */
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < 200) {
      gen.apply(Gen.Parameters.default.withSize(1 + i % 50), seed).foreach(body)
      seed = seed.next
      i += 1
    }
  }

  val schema: FileSet = ProtoTextParser.parse(
    """syntax = "proto3";
      |package graft.test;
      |message Inner { string s = 1; sint64 z = 2; }
      |enum Color { RED = 0; GREEN = 1; BLUE = 2; }
      |message Sink {
      |  double d = 1;
      |  float f = 2;
      |  int32 i32 = 3;
      |  int64 i64 = 4;
      |  uint32 u32 = 5;
      |  uint64 u64 = 6;
      |  sint32 s32 = 7;
      |  sint64 s64 = 8;
      |  fixed32 fx32 = 9;
      |  fixed64 fx64 = 10;
      |  sfixed32 sfx32 = 11;
      |  sfixed64 sfx64 = 12;
      |  bool b = 13;
      |  string str = 14;
      |  bytes by = 15;
      |  Color color = 16;
      |  Inner inner = 17;
      |  repeated int64 rep_i64 = 18;
      |  repeated string rep_str = 19;
      |  repeated Inner rep_inner = 20;
      |  map<string, int64> m = 21;
      |}""".stripMargin, "sink.proto")

  val sinkDesc: MessageDesc = schema.findMessage("Sink").get
  val innerDesc: MessageDesc = schema.findMessage("Inner").get

  val genInner: Gen[PValue] = for {
    s <- Gen.asciiPrintableStr
    z <- Gen.long
  } yield {
    var f = TreeMap.empty[Int, PValue]
    if (s.nonEmpty) f += (1 -> PStr(s))
    if (z != 0) f += (2 -> PLong(z))
    PMsg(DynMsg(innerDesc, f))
  }

  // boundary-heavy integer gen: zigzag/varint edges
  val edgeLongs: Gen[Long] = Gen.oneOf(
    Gen.const(0L), Gen.const(1L), Gen.const(-1L), Gen.const(Long.MaxValue),
    Gen.const(Long.MinValue), Gen.const(127L), Gen.const(128L),
    Gen.const(-128L), Gen.const(Int.MaxValue.toLong), Gen.const(Int.MinValue.toLong),
    Gen.long)

  val genSink: Gen[DynMsg] = for {
    d <- Gen.oneOf(Gen.const(0.0), Gen.const(-0.0), Gen.const(Double.MaxValue), Gen.double)
    fl <- Gen.oneOf(Gen.const(0.0f), Gen.const(Float.MinPositiveValue), Gen.chooseNum(-1e9f, 1e9f))
    i32 <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    i64 <- edgeLongs
    u32 <- Gen.chooseNum(0L, 0xffffffffL)
    u64 <- edgeLongs
    s32 <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    s64 <- edgeLongs
    fx32 <- Gen.chooseNum(0L, 0xffffffffL)
    fx64 <- edgeLongs
    sfx32 <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    sfx64 <- edgeLongs
    b <- Gen.oneOf(true, false)
    str <- Gen.oneOf(Gen.asciiPrintableStr, Gen.const("héllo ✓ — 漢字"))
    by <- Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    color <- Gen.chooseNum(0, 2)
    inner <- genInner
    repI64 <- Gen.listOf(edgeLongs)
    repStr <- Gen.listOf(Gen.asciiPrintableStr)
    repInner <- Gen.listOf(genInner)
    mapKVs <- Gen.mapOf(Gen.zip(Gen.identifier, Gen.long))
  } yield {
    var fields = TreeMap.empty[Int, PValue]
    def put(n: Int, v: PValue): Unit =
      // proto3 implicit presence: only non-default singular fields survive a
      // round-trip, so generate canonical messages (defaults absent).
      if (!DynMsg.isDefault(sinkDesc.fieldByNumber(n), v)) fields += (n -> v)
    put(1, PDouble(d)); put(2, PFloat(fl)); put(3, PLong(i32.toLong))
    put(4, PLong(i64)); put(5, PLong(u32)); put(6, PLong(u64))
    put(7, PLong(s32.toLong)); put(8, PLong(s64)); put(9, PLong(fx32))
    put(10, PLong(fx64)); put(11, PLong(sfx32.toLong)); put(12, PLong(sfx64))
    put(13, PBool(b)); put(14, PStr(str))
    if (by.nonEmpty) fields += (15 -> PBytes(by))
    put(16, PEnum(color)); fields += (17 -> inner)
    if (repI64.nonEmpty) fields += (18 -> PList(repI64.map(PLong).toVector))
    if (repStr.nonEmpty) fields += (19 -> PList(repStr.map(PStr).toVector))
    if (repInner.nonEmpty) fields += (20 -> PList(repInner.toVector))
    if (mapKVs.nonEmpty) fields += (21 -> PList(
      mapKVs.toVector.sortBy(_._1).map { case (k, v) =>
        PMsg(DynMsg(schema.findMessage("Sink.MEntry").get, TreeMap(1 -> PStr(k), 2 -> PLong(v))))
      }))
    DynMsg(sinkDesc, fields)
  }

  private def norm(m: DynMsg): String = ProtoJson.toJson(schema, m, pretty = false)

  test("wire round-trip: decode(encode(m)) == m") {
    forAll(genSink) { m =>
      val bytes = DynMsg.encode(schema, m)
      val back = DynMsg.decode(schema, sinkDesc, bytes)
      assert(norm(back) == norm(m))
      // re-encode must be byte-identical (canonical order)
      assert(DynMsg.encode(schema, back).sameElements(bytes))
    }
  }

  test("JSON round-trip: fromJson(toJson(m)) == m") {
    forAll(genSink) { m =>
      val json = ProtoJson.toJson(schema, m)
      val back = ProtoJson.fromJson(schema, sinkDesc, json)
      assert(DynMsg.encode(schema, back).sameElements(DynMsg.encode(schema, m)),
        s"json was: $json")
    }
  }

  test("packed repeated decodes from both packed and unpacked encodings") {
    val f = sinkDesc.fieldByName("rep_i64")
    assert(f.packed)
    // unpacked encoding of [1, 300]: tag(18,varint) each
    val w = new Wire.Writer
    w.writeTag(18, Wire.WtVarint); w.writeVarint64(1L)
    w.writeTag(18, Wire.WtVarint); w.writeVarint64(300L)
    val m = DynMsg.decode(schema, sinkDesc, w.toBytes)
    assert(m.fields(18) == PList(Vector(PLong(1L), PLong(300L))))
    // canonical re-encode is packed
    val re = DynMsg.encode(schema, m)
    val m2 = DynMsg.decode(schema, sinkDesc, re)
    assert(m2.fields(18) == m.fields(18))
    assert(re.length < w.toBytes.length)
  }

  test("unknown fields are tolerated and dropped") {
    val w = new Wire.Writer
    w.writeTag(99, Wire.WtVarint); w.writeVarint64(42L)
    w.writeTag(14, Wire.WtLen); w.writeVarint64(2L); w.writeRaw("ok".getBytes)
    val m = DynMsg.decode(schema, sinkDesc, w.toBytes)
    assert(m.getByName("str").contains(PStr("ok")))
    assert(!m.fields.contains(99))
  }

  test("map field JSON prints as object and parses back") {
    val json = """{"m":{"a":"1","b":"-2"}}"""
    val m = ProtoJson.fromJson(schema, sinkDesc, json)
    val printed = ProtoJson.toJson(schema, m, pretty = false)
    assert(ProtoJson.jsonTreeEquals(printed, json), printed)
    val back = DynMsg.decode(schema, sinkDesc, DynMsg.encode(schema, m))
    assert(ProtoJson.jsonTreeEquals(ProtoJson.toJson(schema, back, pretty = false), json))
  }
}
