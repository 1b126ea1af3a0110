package graft.proto

import java.nio.file.{Files, Paths}

/** Command-line decode/encode — the library's standalone surface, mirroring
  * the reference's two processors (ProtobufDecoder/ProtobufEncoder) as a CLI:
  *
  *   runMain graft.proto.ProtoCli decode <schema.desc|.proto> <messageType> <in.bin> [--delimited]
  *   runMain graft.proto.ProtoCli encode <schema.desc|.proto> <messageType> <in.json>
  *
  * decode prints canonical proto3 JSON to stdout; encode writes binary to
  * stdout as hex (safe for terminals) or to a file via --out <path>.
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

    val fs =
      if (schemaPath.endsWith(".proto")) ProtoTextParser.parseFile(Paths.get(schemaPath))
      else DescParser.parseFile(Paths.get(schemaPath))
    val desc = fs.findMessage(messageType).getOrElse {
      System.err.println(s"error: message type '$messageType' not found in $schemaPath")
      sys.exit(3)
    }

    mode match {
      case "decode" =>
        val bytes = Files.readAllBytes(Paths.get(inPath))
        if (delimited) {
          val (msgs, err) = DynMsg.decodeDelimited(fs, desc, bytes)
          msgs.foreach(m => println(ProtoJson.toJson(fs, m, pretty = false)))
          err.foreach { e => System.err.println(s"error: malformed tail: $e"); sys.exit(4) }
        } else {
          println(ProtoJson.toJson(fs, DynMsg.decode(fs, desc, bytes)))
        }
      case "encode" =>
        val json = new String(Files.readAllBytes(Paths.get(inPath)), "UTF-8")
        val bytes = DynMsg.encode(fs, ProtoJson.fromJson(fs, desc, json))
        outPath match {
          case Some(p) => Files.write(Paths.get(p), bytes); System.err.println(s"wrote ${bytes.length} bytes to $p")
          case None => println(bytes.map("%02x".format(_)).mkString(" "))
        }
      case other =>
        System.err.println(s"error: unknown mode '$other'"); sys.exit(2)
    }
  }
}
