package graft.proto

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.proto.Descriptors._
import graft.proto.Wire.ProtoParseException

/** Fuzz the decode surface: ARBITRARY bytes (pure-random and mutations of a
  * valid message) through all three decoder paths must either decode or
  * throw one of OUR typed parse exceptions — never a foreign Throwable.
  * This is the contract the pipeline's dead-letter route relies on
  * (Decode catches `Exception`; an escaping `Error` — StackOverflowError,
  * NegativeArraySizeException-as-Error, OOM from a hostile declared length —
  * would kill the executor instead of routing the event to `error`).
  *
  * Reference behavior being matched: the reference delegates to
  * protobuf-java, whose parser is similarly total over byte inputs
  * (InvalidProtocolBufferException or success) — see
  * /root/reference/src/main/java/com/github/whiver/nifi/processor/
  * ProtobufDecoder.java (parse errors surface as routed failures).
  */
class DecodeFuzzSpec extends AnyFunSuite {

  private val schema: FileSet = ProtoTextParser.parse(
    """syntax = "proto3";
      |package graft.fuzz;
      |message Leaf { string t = 1; }
      |message Inner { string s = 1; sint64 z = 2; repeated Leaf kids = 3; }
      |enum Color { RED = 0; GREEN = 1; BLUE = 2; }
      |message Sink {
      |  double d = 1;
      |  float f = 2;
      |  int32 i32 = 3;
      |  sint64 s64 = 8;
      |  fixed32 fx32 = 9;
      |  fixed64 fx64 = 10;
      |  bool b = 13;
      |  string str = 14;
      |  bytes by = 15;
      |  Color color = 16;
      |  Inner inner = 17;
      |  repeated int64 rep_i64 = 18;
      |  repeated string rep_str = 19;
      |  repeated Inner rep_inner = 20;
      |  map<string, int64> m = 21;
      |}""".stripMargin, "fuzz.proto")
  private val sink = schema.findMessage("graft.fuzz.Sink").get

  private val rowDec = new graft.decode.RowDecoder(schema, sink)
  private val catDec = new graft.decode.CatalystRowDecoder(schema, sink)

  /** The only throwables a decoder may emit. */
  private def allowed(t: Throwable): Boolean = t match {
    case _: ProtoParseException => true
    case _: MessageDecodingException => true
    case _ => false
  }

  /** Run one input through all three decoders; fail loudly on any foreign
    * throwable; return whether DynMsg accepted it. */
  private def probe(bytes: Array[Byte], tag: String): Boolean = {
    def hex = bytes.take(64).map(b => f"$b%02x").mkString
    var dynOk = false
    try { DynMsg.decode(schema, sink, bytes); dynOk = true }
    catch { case t: Throwable if !allowed(t) => fail(s"DynMsg [$tag] threw ${t.getClass.getName}: ${t.getMessage} on $hex", t)
            case _: Throwable => () }
    try rowDec.decode(bytes)
    catch { case t: Throwable if !allowed(t) => fail(s"RowDecoder [$tag] threw ${t.getClass.getName}: ${t.getMessage} on $hex", t)
            case _: Throwable => () }
    try catDec.decode(bytes)
    catch { case t: Throwable if !allowed(t) => fail(s"CatalystRowDecoder [$tag] threw ${t.getClass.getName}: ${t.getMessage} on $hex", t)
            case _: Throwable => () }
    dynOk
  }

  /** deterministic sample stream (scalatestplus bridge absent offline). */
  private def samples[A](gen: Gen[A], n: Int, size: Int => Int = i => 1 + i % 64): Iterator[A] = {
    var seed = Seed(20260816L)
    Iterator.range(0, n).flatMap { i =>
      val a = gen.apply(Gen.Parameters.default.withSize(size(i)), seed)
      seed = seed.next
      a
    }
  }

  test("pure-random byte arrays: decoders are total (typed exception or value)") {
    val gen = Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    var accepted = 0
    samples(gen, 1500).foreach { bytes => if (probe(bytes, "rand")) accepted += 1 }
    // sanity that the fuzz isn't vacuous: some random inputs should parse
    // (empty arrays and lucky tags) and some should be rejected
    assert(accepted > 0)
  }

  test("mutated valid messages: flip/truncate/splice never desync into a foreign throwable") {
    // a dense valid message exercising every field
    val json =
      """{"d":1.5,"f":2.25,"i32":-7,"s64":"-99","fx32":4000000000,"fx64":"123456789012",
        |"b":true,"str":"héllo — 漢字","by":"AQIDBA==","color":"BLUE",
        |"inner":{"s":"x","z":"-1","kids":[{"t":"k"}]},
        |"rep_i64":["1","300","-5"],"rep_str":["a","bb"],
        |"rep_inner":[{"s":"p"},{"z":"9"}],"m":{"k1":"1","k2":"-2"}}""".stripMargin
    val valid = DynMsg.encode(schema, ProtoJson.fromJson(schema, sink, json))
    assert(probe(valid, "valid"), "the seed message itself must decode")

    final case class Mut(kind: Int, pos: Int, b: Byte, len: Int)
    val gen = for {
      kind <- Gen.chooseNum(0, 4)
      pos <- Gen.chooseNum(0, valid.length - 1)
      b <- Gen.chooseNum(Byte.MinValue, Byte.MaxValue)
      len <- Gen.chooseNum(1, 16)
    } yield Mut(kind, pos, b, len)

    samples(gen, 3000, _ => 50).foreach { m =>
      val bytes: Array[Byte] = m.kind match {
        case 0 => // overwrite one byte
          val c = valid.clone(); c(m.pos) = m.b; c
        case 1 => // bit flip
          val c = valid.clone(); c(m.pos) = (c(m.pos) ^ (1 << (m.len % 8))).toByte; c
        case 2 => // truncate
          valid.take(m.pos)
        case 3 => // insert junk
          valid.take(m.pos) ++ Array.fill(m.len)(m.b) ++ valid.drop(m.pos)
        case _ => // duplicate a slice (repeated/merged fields, stray tags)
          valid ++ valid.slice(m.pos, math.min(valid.length, m.pos + m.len))
      }
      probe(bytes, s"mut${m.kind}@${m.pos}")
    }
  }

  test("hostile declared lengths don't pre-allocate: huge LEN header on a 20-byte buffer") {
    for (declared <- Seq(Int.MaxValue.toLong, (1L << 40), 0x7fffffffffffffffL)) {
      val w = new Wire.Writer
      w.writeTag(15, Wire.WtLen) // bytes field
      w.writeVarint64(declared)
      w.writeRaw(Array.fill(20)(0x41.toByte))
      val t0 = System.nanoTime()
      probe(w.toBytes, s"len=$declared")
      // a pre-allocating decoder would OOM or stall; parsing must stay instant
      assert((System.nanoTime() - t0) < 2e9, s"declared=$declared took too long")
    }
  }

  test("deep nesting inside an UNKNOWN group field skips without stack growth") {
    // 600 nested unknown groups around a real field — tag-balancing skip is
    // iterative with a depth cap, so this must parse-or-reject, not overflow
    val w = new Wire.Writer
    for (_ <- 1 to 600) w.writeTag(999, Wire.WtStartGroup)
    w.writeTag(3, Wire.WtVarint); w.writeVarint64(1L)
    for (_ <- 1 to 600) w.writeTag(999, Wire.WtEndGroup)
    w.writeTag(13, Wire.WtVarint); w.writeVarint64(1L)
    probe(w.toBytes, "deep-group")
  }

  test("decode is idempotent-normalizing: decode(encode(decode(x))) == decode(x)") {
    val gen = Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    var checked = 0
    samples(gen, 800).foreach { bytes =>
      val first = try Some(DynMsg.decode(schema, sink, bytes)) catch { case _: Exception => None }
      first.foreach { m =>
        // anything decode accepted must re-encode, and the re-encoded form
        // must decode to the SAME normalized message (stable fixpoint —
        // e.g. invalid UTF-8 replaced once, stable thereafter)
        val re = DynMsg.encode(schema, m)
        val again = DynMsg.decode(schema, sink, re)
        assert(ProtoJson.toJson(schema, again, pretty = false) ==
          ProtoJson.toJson(schema, m, pretty = false))
        checked += 1
      }
    }
    assert(checked > 0, "fixpoint property never exercised")
  }
}
