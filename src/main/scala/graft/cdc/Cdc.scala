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

  lazy val fsV1: FileSet = ProtoTextParser.parse(protoV1, "repo_change_v1.proto")
  lazy val fsV2: FileSet = ProtoTextParser.parse(protoV2, "repo_change_v2.proto")

  val KeyV1: SchemaKey = SchemaKey(SchemaId, 1)
  val KeyV2: SchemaKey = SchemaKey(SchemaId, 2)

  def registry: DescriptorRegistry = DescriptorRegistry(KeyV1 -> fsV1, KeyV2 -> fsV2)
  def registryV1Only: DescriptorRegistry = DescriptorRegistry(KeyV1 -> fsV1)
}
