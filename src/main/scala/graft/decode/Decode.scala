package graft.decode

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.proto.{DynMsg, Descriptors}
import graft.registry.{DescriptorRegistry, SchemaKey}

/** One change event off the log tail — the Spark-native FlowFile
  * (payload bytes + metadata; SURVEY.md §1.2 mapping table).
  * schemaId/schemaVersion/messageType play the role of the reference's
  * `protobuf.schemaPath` / `protobuf.messageType` attributes
  * (ProtobufDecoder.java:61-63); schemaVersion = -1 defers to the job
  * default (attribute-over-property precedence, ProtobufDecoder.java:77-81).
  */
final case class ChangeEvent(
    payload: Array[Byte],
    schemaId: String,
    schemaVersion: Int,
    messageType: String,
    partition: Int,
    offset: Long)

object Framing extends Enumeration {
  /** one raw message per event payload (reference behavior,
    * ProtobufService.java:64). */
  val Raw = Value
  /** many varint-length-prefixed messages per payload (log segments). */
  val VarintDelimited = Value
}

/** Routes, mirroring the reference's three relationships
  * (ProtobufProcessor.java:93-106). */
object Route {
  val Success = "success"
  val InvalidSchema = "invalid_schema"
  val Error = "error"
}

/** Per-(source partition, route) counters that RIDE the decode pass of
  * whatever action consumes it — lineage metrics cost zero extra jobs.
  * Spark accumulator semantics in transformations: task retries can
  * over-count; these are operational metrics, never data. */
final class RouteStatsAccumulator
    extends org.apache.spark.util.AccumulatorV2[(Int, String), Map[(Int, String), Long]] {
  private val m = new java.util.concurrent.ConcurrentHashMap[(Int, String), Long]()
  override def isZero: Boolean = m.isEmpty
  override def copy(): RouteStatsAccumulator = {
    val c = new RouteStatsAccumulator
    m.forEach((k, v) => c.m.put(k, v))
    c
  }
  override def reset(): Unit = m.clear()
  override def add(kv: (Int, String)): Unit =
    m.merge(kv, 1L, (a, b) => a + b)
  override def merge(other: org.apache.spark.util.AccumulatorV2[(Int, String), Map[(Int, String), Long]]): Unit =
    other.value.foreach { case (k, v) => m.merge(k, v, (a, b) => a + b) }
  override def value: Map[(Int, String), Long] = {
    val b = Map.newBuilder[(Int, String), Long]
    m.forEach((k, v) => b += (k -> v))
    b.result()
  }
  def byRoute: Map[String, Long] =
    value.groupMapReduce(_._1._2)(_._2)(_ + _)
  def byPartition: Map[Int, Long] =
    value.groupMapReduce(_._1._1)(_._2)(_ + _)
}

/** The decode operator: Dataset[ChangeEvent] → routed DataFrame, descriptor
  * resolved once per partition from a broadcast registry inside a
  * Catalyst-typed mapPartitions — never a per-row UDF (SURVEY.md §2.1 #1).
  */
object Decode {

  /** Metadata columns preceding the decoded message struct. */
  val metaSchema: StructType = StructType(Seq(
    StructField("route", StringType, nullable = false),
    StructField("error", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Output schema: meta columns + `msg` struct derived from the descriptor
    * of (defaultSchema, messageType) in the registry. */
  def outputSchema(registry: DescriptorRegistry, defaultKey: SchemaKey, messageType: String): StructType = {
    val (fs, desc) = registry.descriptor(defaultKey, messageType).getOrElse(
      throw new Descriptors.UnknownMessageTypeException(messageType))
    StructType(metaSchema.fields :+ StructField("msg", SparkSchema.structFor(fs, desc), nullable = true))
  }

  /** Generic decode. Error rows keep the ORIGINAL payload (dead-letter
    * contract, ProtobufDecoder.java:99-100); success rows drop it (saves the
    * shuffle width downstream). */
  def decode(
      events: Dataset[ChangeEvent],
      registry: Broadcast[DescriptorRegistry],
      defaultKey: SchemaKey,
      messageType: String,
      framing: Framing.Value = Framing.Raw,
      /** when set, every emitted row also bumps (source partition, route) —
        * per-partition lineage metrics riding the same pass. */
      stats: Option[RouteStatsAccumulator] = None): DataFrame = {

    val schema = outputSchema(registry.value, defaultKey, messageType)
    val msgOrdinal = schema.fieldIndex("msg")

    events.mapPartitions { iter =>
      val reg = registry.value // one broadcast deref per partition
      // reader-side (output) descriptor: rows are projected into THIS shape
      // by field number, whatever descriptor version wrote the event
      val (fsOut, descOut) = reg.descriptor(defaultKey, messageType).get
      // row-compiled decoders, one per writer schema version seen (memoized)
      val decoders = new java.util.HashMap[(SchemaKey, String), RowDecoder]()
      def decoderFor(key: SchemaKey, mt: String, writerDesc: graft.proto.Descriptors.MessageDesc): RowDecoder = {
        val k = (reg.resolveKey(key), mt)
        var dec = decoders.get(k)
        if (dec == null) {
          dec =
            if (writerDesc eq descOut) new RowDecoder(fsOut, descOut)
            else new RowDecoder(fsOut, descOut, Some(writerDesc.fields.map(_.number).toSet))
          decoders.put(k, dec)
        }
        dec
      }
      iter.flatMap { ev =>
        val key =
          if (ev.schemaId == null || ev.schemaId.isEmpty) defaultKey
          else SchemaKey(ev.schemaId, ev.schemaVersion)
        val mt = if (ev.messageType == null || ev.messageType.isEmpty) messageType else ev.messageType
        if (mt == null || mt.isEmpty) {
          Iterator.single(routedRow(Route.Error, "no message type", ev, null, msgOrdinal, stats = stats))
        } else reg.descriptor(key, mt) match {
          case None =>
            val route =
              if (reg.fileSet(key).isEmpty) Route.InvalidSchema // schema missing (ProtobufDecoder.java:65-68)
              else Route.Error // unknown message type (ProtobufService.java:59-61)
            Iterator.single(routedRow(route, s"schema=$key type=$mt unresolved", ev, null, msgOrdinal, stats = stats))
          case Some((fs, desc)) =>
            val dec = decoderFor(key, mt, desc)
            framing match {
              case Framing.Raw =>
                try {
                  val row = dec.decode(ev.payload)
                  Iterator.single(routedRow(Route.Success, null, ev, row, msgOrdinal, keepPayload = false, stats = stats))
                } catch {
                  case e: Exception =>
                    Iterator.single(routedRow(Route.Error, e.getMessage, ev, null, msgOrdinal, stats = stats))
                }
              case Framing.VarintDelimited =>
                // good-prefix semantics: decode until the first malformed frame
                val r = new graft.proto.Wire.Reader(ev.payload)
                var err: String = null
                val out = Vector.newBuilder[Row]
                while (r.hasRemaining && err == null) {
                  try {
                    val (p, len) = r.readSlice()
                    out += dec.decode(new graft.proto.Wire.Reader(r.buf, p, p + len))
                  } catch { case e: Exception => err = e.getMessage }
                }
                val good = out.result().iterator.map(row =>
                  routedRow(Route.Success, null, ev, row, msgOrdinal, keepPayload = false, stats = stats))
                val bad = Option(err).iterator.map(e =>
                  routedRow(Route.Error, s"malformed tail: $e", ev, null, msgOrdinal, stats = stats))
                good ++ bad
            }
        }
      }
    }(Encoders.row(schema))
  }

  private def routedRow(route: String, error: String, ev: ChangeEvent,
      msg: Row, msgOrdinal: Int, keepPayload: Boolean = true,
      stats: Option[RouteStatsAccumulator] = None): Row = {
    stats.foreach(_.add((ev.partition, route)))
    val vals = new Array[Any](msgOrdinal + 1)
    vals(0) = route
    vals(1) = error
    vals(2) = ev.partition
    vals(3) = ev.offset
    vals(4) = if (keepPayload) ev.payload else null
    vals(msgOrdinal) = msg
    Row.fromSeq(vals.toIndexedSeq)
  }

  /** Keys-only decode: a reduced descriptor keeps just `keyFields`, so every
    * other field is wire-SKIPPED (length-delimited skip is an O(1) jump —
    * the payload body is never materialized). Used for touched-bucket
    * discovery before a MERGE; errors yield no row. */
  def decodeKeys(
      events: Dataset[ChangeEvent],
      registry: Broadcast[DescriptorRegistry],
      defaultKey: SchemaKey,
      messageType: String,
      keyFields: Seq[String],
      framing: Framing.Value = Framing.Raw): DataFrame = {

    val (fsOut, descOut) = registry.value.descriptor(defaultKey, messageType).getOrElse(
      throw new Descriptors.UnknownMessageTypeException(messageType))
    val reduced = descOut.copy(fields = descOut.fields.filter(f => keyFields.contains(f.name)))
    val schema = SparkSchema.structFor(fsOut, reduced)

    events.mapPartitions { iter =>
      val reg = registry.value
      val fs = reg.fileSet(defaultKey).get
      val dec = new RowDecoder(fs, reduced)
      iter.flatMap { ev =>
        try {
          framing match {
            case Framing.Raw => Iterator.single(dec.decode(ev.payload))
            case Framing.VarintDelimited =>
              val r = new graft.proto.Wire.Reader(ev.payload)
              val out = Vector.newBuilder[Row]
              var ok = true
              while (r.hasRemaining && ok) {
                try {
                  val (p, len) = r.readSlice()
                  out += dec.decode(new graft.proto.Wire.Reader(r.buf, p, p + len))
                } catch { case _: Exception => ok = false }
              }
              out.result().iterator
          }
        } catch { case _: Exception => Iterator.empty }
      }
    }(Encoders.row(schema))
  }

  /** Route splits (filter on the computed column → 3 sinks). */
  def success(decoded: DataFrame): DataFrame =
    decoded.filter(decoded("route") === Route.Success).select("partition", "offset", "msg.*")
  def deadLetter(decoded: DataFrame): DataFrame =
    decoded.filter(decoded("route") =!= Route.Success)
      .select("route", "error", "partition", "offset", "payload")
}
