package graft.cdc

import graft.proto.Descriptors.FileSet
import graft.proto.ProtoTextParser
import graft.registry.{DescriptorRegistry, SchemaKey}

/** The CDC change-event envelope (FIXTURES.md §B): one protobuf message per
  * row mutation of the source-code repo table (BASELINE.json input_hint:
  * repo, path, commit, lang, content; key = (repo, path)).
  *
  * v1 → v2 evolution fixture: v2 adds `author` (field 8, same numbers keep
  * field identity — descriptor-version-aware resolution maps onto IceLite
  * field-ID schema evolution).
  */
object Cdc {

  val SchemaId = "repo_change"
  val MessageType = "RepoChange"

  val protoV1: String =
    """syntax = "proto3";
      |package graft.cdc;
      |message RepoChange {
      |  string repo    = 1;
      |  string path    = 2;
      |  string commit  = 3;
      |  string lang    = 4;
      |  string content = 5;
      |  int64  seq     = 6;
      |  Op     op      = 7;
      |  enum Op { UPSERT = 0; DELETE = 1; }
      |}""".stripMargin

  val protoV2: String =
    """syntax = "proto3";
      |package graft.cdc;
      |message RepoChange {
      |  string repo    = 1;
      |  string path    = 2;
      |  string commit  = 3;
      |  string lang    = 4;
      |  string content = 5;
      |  int64  seq     = 6;
      |  Op     op      = 7;
      |  string author  = 8;
      |  enum Op { UPSERT = 0; DELETE = 1; }
      |}""".stripMargin

  /** v3/v4: the TYPE-WIDENING fixture (q105) — v3 adds `size_bytes` as
    * int32 (field 9); v4 widens the SAME field number to int64, the
    * protobuf-sanctioned wire-compatible widening (varint either way).
    * The table column must evolve INT → BIGINT in place, with v3-origin
    * files widened on read. */
  val protoV3: String = protoV2.replace(
    "string author  = 8;", "string author  = 8;\n  int32  size_bytes = 9;")
  val protoV4: String = protoV2.replace(
    "string author  = 8;", "string author  = 8;\n  int64  size_bytes = 9;")

  /** v5: the PARTIAL-UPDATE fixture (q108) — the Debezium/DMS-style changed-
    * columns contract. A PATCH event carries the key + seq + ONLY the
    * changed data fields, plus an explicit `changed_fields` mask of their
    * field numbers. The mask (not proto3 value presence) decides which
    * columns the patch sets: proto3 scalars can't distinguish "absent" from
    * "set to the default", so an explicit mask is the only wire-faithful
    * way to express "set lang to ''" vs "leave lang alone". Both additions
    * (an enum value, a new repeated field) are sanctioned by the q88
    * Compat gate. */
  val protoV5: String = protoV2
    .replace("string author  = 8;",
      "string author  = 8;\n  repeated int32 changed_fields = 10;")
    .replace("enum Op { UPSERT = 0; DELETE = 1; }",
      "enum Op { UPSERT = 0; DELETE = 1; PATCH = 2; }")

  lazy val fsV1: FileSet = ProtoTextParser.parse(protoV1, "repo_change_v1.proto")
  lazy val fsV2: FileSet = ProtoTextParser.parse(protoV2, "repo_change_v2.proto")
  lazy val fsV3: FileSet = ProtoTextParser.parse(protoV3, "repo_change_v3.proto")
  lazy val fsV4: FileSet = ProtoTextParser.parse(protoV4, "repo_change_v4.proto")
  lazy val fsV5: FileSet = ProtoTextParser.parse(protoV5, "repo_change_v5.proto")

  val KeyV1: SchemaKey = SchemaKey(SchemaId, 1)
  val KeyV2: SchemaKey = SchemaKey(SchemaId, 2)
  val KeyV3: SchemaKey = SchemaKey(SchemaId, 3)
  val KeyV4: SchemaKey = SchemaKey(SchemaId, 4)
  val KeyV5: SchemaKey = SchemaKey(SchemaId, 5)

  def registry: DescriptorRegistry = DescriptorRegistry(KeyV1 -> fsV1, KeyV2 -> fsV2)
  def registryV1Only: DescriptorRegistry = DescriptorRegistry(KeyV1 -> fsV1)
  def registryV3: DescriptorRegistry =
    DescriptorRegistry(KeyV1 -> fsV1, KeyV2 -> fsV2, KeyV3 -> fsV3)
  def registryV4: DescriptorRegistry =
    DescriptorRegistry(KeyV1 -> fsV1, KeyV2 -> fsV2, KeyV3 -> fsV3, KeyV4 -> fsV4)
  def registryV5: DescriptorRegistry =
    DescriptorRegistry(KeyV1 -> fsV1, KeyV2 -> fsV2, KeyV5 -> fsV5)
}
