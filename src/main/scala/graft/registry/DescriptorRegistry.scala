package graft.registry

import graft.proto.Descriptors._
import graft.proto.{DescParser, ProtoTextParser}

/** (schemaId, version) key — per-event schema references carry one of these;
  * version -1 means "use the job default", mirroring the reference's
  * flowfile-attribute-over-processor-property precedence
  * (ProtobufDecoder.java:61,77-81). */
final case class SchemaKey(schemaId: String, version: Int) extends Serializable

/** Versioned descriptor registry, built once on the driver and broadcast to
  * executors (SURVEY.md §1.2). Fixes the reference's per-record schema
  * re-parse anti-pattern (ProtobufService.java:85-87): descriptors are parsed
  * exactly once, lookups are memoized per JVM.
  */
final class DescriptorRegistry private (
    val schemas: Map[SchemaKey, FileSet]) extends Serializable {

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[(SchemaKey, String), Option[(FileSet, MessageDesc)]]()

  @transient lazy val latestVersion: Map[String, Int] =
    schemas.keys.groupBy(_.schemaId).map { case (id, ks) => id -> ks.map(_.version).max }

  def resolveKey(key: SchemaKey): SchemaKey =
    if (key.version >= 0) key
    else SchemaKey(key.schemaId, latestVersion.getOrElse(key.schemaId, -1))

  def fileSet(key: SchemaKey): Option[FileSet] = schemas.get(resolveKey(key))

  /** Memoized (FileSet, MessageDesc) lookup — the per-partition hot path. */
  def descriptor(key: SchemaKey, messageType: String): Option[(FileSet, MessageDesc)] = {
    val k = (resolveKey(key), messageType)
    memo.computeIfAbsent(k, { kk =>
      schemas.get(kk._1).flatMap(fs => fs.findMessage(kk._2).map(fs -> _))
    })
  }

  def withSchema(key: SchemaKey, fs: FileSet): DescriptorRegistry =
    new DescriptorRegistry(schemas + (key -> fs))

  /** Get-or-load escape hatch: for every `key` not yet registered, look for
    * `<schemaId>-v<version>.desc` or `.proto` under `dir` and load it. Runs
    * on the DRIVER between epochs (the rebuilt registry is re-broadcast) —
    * the reference resolves previously-unseen schema files named per record
    * at process time (ProtobufService.java:85-87); this gives the same
    * capability without per-record filesystem I/O on executors. Keys with
    * no matching file stay unregistered (their events route invalid_schema,
    * the dead-letter contract). */
  def withLoadedFrom(dir: java.nio.file.Path, keys: Iterable[SchemaKey]): DescriptorRegistry =
    keys.filter(k => k.version >= 0 && !schemas.contains(k)).foldLeft(this) { (reg, k) =>
      Seq("desc", "proto")
        .map(ext => dir.resolve(s"${k.schemaId}-v${k.version}.$ext"))
        .find(java.nio.file.Files.isRegularFile(_)) match {
        case Some(p) =>
          val fs =
            if (p.toString.endsWith(".proto")) ProtoTextParser.parseFile(p)
            else DescParser.parseFile(p)
          reg.withSchema(k, fs)
        case None => reg
      }
    }
}

object DescriptorRegistry {
  def empty: DescriptorRegistry = new DescriptorRegistry(Map.empty)

  def apply(entries: (SchemaKey, FileSet)*): DescriptorRegistry =
    new DescriptorRegistry(entries.toMap)

  /** Load from a schema file path — `.desc` FileDescriptorSet or raw `.proto`
    * text (compiled in-JVM; the reference shells out to protoc here,
    * SchemaParser.java:40-51). */
  def load(schemaId: String, version: Int, path: java.nio.file.Path): DescriptorRegistry = {
    val fs =
      if (path.toString.endsWith(".proto")) ProtoTextParser.parseFile(path)
      else DescParser.parseFile(path)
    new DescriptorRegistry(Map(SchemaKey(schemaId, version) -> fs))
  }
}
