package graft.proto

import org.scalatest.funsuite.AnyFunSuite
import graft.proto.ProtoTextParser
import graft.registry.{Compat, DescriptorRegistry, SchemaKey}

/** Schema-registry compatibility gate: sanctioned evolutions pass (add
  * field, remove field, rename in place, widen int32→int64); identity- or
  * wire-breaking ones are refused with every violation named. */
class CompatSpec extends AnyFunSuite {

  private def fs(body: String) = ProtoTextParser.parse(
    s"""syntax = "proto3";
       |package t;
       |message M {
       |$body
       |}""".stripMargin, "m.proto")

  private val base = fs(
    """  string repo   = 1;
      |  int32  size   = 2;
      |  string commit = 3;
      |  Op     op     = 4;
      |  enum Op { A = 0; B = 1; }""".stripMargin)

  test("add / remove / rename-in-place / widen are compatible") {
    val ok = fs(
      """  string repo_name = 1;
        |  int64  size      = 2;
        |  Op     op        = 4;
        |  string author    = 9;
        |  enum Op { A = 0; B = 1; }""".stripMargin)
    assert(Compat.check(base, ok, "M").isEmpty)
  }

  test("wire-type change, non-widening type change, label flip are refused") {
    val bad = fs(
      """  int64  repo   = 1;
        |  double size   = 2;
        |  repeated string commit = 3;
        |  Op     op     = 4;
        |  enum Op { A = 0; B = 1; }""".stripMargin)
    val v = Compat.check(base, bad, "M")
    assert(v.map(x => (x.number, x.kind)).toSet ==
      Set((1, "wire_type"), (2, "wire_type"), (3, "label")))
  }

  test("same-wire non-widening change is a type_change; enum->int64 widens") {
    val bad = fs(
      """  string repo   = 1;
        |  bool   size   = 2;
        |  string commit = 3;
        |  int64  op     = 4;""".stripMargin)
    val v = Compat.check(base, bad, "M")
    assert(v.map(x => (x.number, x.kind)) == Vector((2, "type_change")))
  }

  test("a field name moved to a different number forks the column: refused") {
    val moved = fs(
      """  string repo   = 1;
        |  int32  size   = 2;
        |  string commit = 7;
        |  Op     op     = 4;
        |  enum Op { A = 0; B = 1; }""".stripMargin)
    val v = Compat.check(base, moved, "M")
    assert(v.map(x => (x.field, x.kind)) == Vector(("commit", "name_moved")))
  }

  test("nested message fields are checked recursively") {
    def withNested(metaBody: String) = ProtoTextParser.parse(
      s"""syntax = "proto3";
         |package t;
         |message Meta {
         |$metaBody
         |}
         |message M {
         |  string repo = 1;
         |  Meta   meta = 2;
         |}""".stripMargin, "m.proto")
    val o = withNested("  string k = 1;")
    val good = withNested("  string k = 1;\n  int64 extra = 2;")
    val bad = withNested("  fixed64 k = 1;")
    assert(Compat.check(o, good, "M").isEmpty)
    val v = Compat.check(o, bad, "M")
    assert(v.map(x => (x.message, x.kind)) == Vector(("t.Meta", "wire_type")))
  }

  test("registerChecked refuses an incompatible head and accepts a fresh id") {
    val reg0 = DescriptorRegistry(SchemaKey("s", 1) -> base)
    val bad = fs("  int64 repo = 1;")
    val e = intercept[IllegalArgumentException] {
      Compat.registerChecked(reg0, SchemaKey("s", 2), bad, "M")
    }
    assert(e.getMessage.contains("wire_type"))
    // first registration of a NEW schemaId is always accepted
    val reg1 = Compat.registerChecked(reg0, SchemaKey("other", 1), bad, "M")
    assert(reg1.fileSet(SchemaKey("other", 1)).isDefined)
    // a sanctioned upgrade is accepted and becomes the new latest
    val ok = fs(
      """  string repo = 1;
        |  int64  size = 2;
        |  string author = 9;""".stripMargin)
    val reg2 = Compat.registerChecked(reg0, SchemaKey("s", 2), ok, "M")
    assert(reg2.resolveKey(SchemaKey("s", -1)) == SchemaKey("s", 2))
  }

  test("the shipped v1->v2 CDC evolution passes the gate") {
    import graft.cdc.Cdc
    assert(Compat.check(Cdc.fsV1, Cdc.fsV2, Cdc.MessageType).isEmpty)
  }
}
