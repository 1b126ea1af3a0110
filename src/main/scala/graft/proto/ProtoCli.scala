package graft.proto

import java.nio.file.{Files, Paths}
import graft.proto.Descriptors.FileSet

/** Command-line decode/encode — the library's standalone surface, mirroring
  * the reference's two processors (ProtobufDecoder/ProtobufEncoder) as a CLI:
  *
  *   runMain graft.proto.ProtoCli decode <schema.desc|.proto> <messageType> <in.bin> [--delimited]
  *   runMain graft.proto.ProtoCli encode <schema.desc|.proto> <messageType> <in.json>
  *
  * decode prints canonical proto3 JSON to stdout; encode writes binary to
  * stdout as hex (safe for terminals) or to a file via --out <path>.
  * `--any-types <schema>` registers an extra schema file as the
  * google.protobuf.Any type registry (the loaded schema itself is always
  * registered) — the CLI analogue of configuring JsonFormat.TypeRegistry.
  */
object ProtoCli {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println("usage: ProtoCli decode|encode <schema.desc|.proto> <messageType> <in> [--delimited] [--out <path>]")
      sys.exit(2)
    }
    val Array(mode, schemaPath, messageType, inPath) = args.take(4)
    val rest = args.drop(4)
    val delimited = rest.contains("--delimited")
    val outPath = rest.sliding(2).collectFirst { case Array("--out", p) => p }

    def load(p: String): FileSet =
      if (p.endsWith(".proto")) ProtoTextParser.parseFile(Paths.get(p))
      else DescParser.parseFile(Paths.get(p))
    val fs = load(schemaPath)
    val registry = ProtoJson.TypeRegistry(fs +:
      rest.sliding(2).collect { case Array("--any-types", p) => load(p) }.toVector)
    val desc = fs.findMessage(messageType).getOrElse {
      System.err.println(s"error: message type '$messageType' not found in $schemaPath")
      sys.exit(3)
    }

    mode match {
      case "decode" =>
        val bytes = Files.readAllBytes(Paths.get(inPath))
        if (delimited) {
          val (msgs, err) = DynMsg.decodeDelimited(fs, desc, bytes)
          msgs.foreach(m => println(ProtoJson.toJson(fs, m, pretty = false, registry = registry)))
          err.foreach { e => System.err.println(s"error: malformed tail: $e"); sys.exit(4) }
        } else {
          println(ProtoJson.toJson(fs, DynMsg.decode(fs, desc, bytes), registry = registry))
        }
      case "encode" =>
        val json = new String(Files.readAllBytes(Paths.get(inPath)), "UTF-8")
        val bytes = DynMsg.encode(fs, ProtoJson.fromJson(fs, desc, json, registry))
        outPath match {
          case Some(p) => Files.write(Paths.get(p), bytes); System.err.println(s"wrote ${bytes.length} bytes to $p")
          case None => println(bytes.map("%02x".format(_)).mkString(" "))
        }
      case other =>
        System.err.println(s"error: unknown mode '$other'"); sys.exit(2)
    }
  }
}
