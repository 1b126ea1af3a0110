package graft.cdc

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.TreeMap
import graft.decode.ChangeEvent
import graft.proto.{DynMsg, PValue}
import graft.proto.Descriptors.MessageDesc
import PValue._

/** Deterministic seeded CDC-log generator (FIXTURES.md §C): a stream of
  * protobuf-encoded RepoChange mutations over a synthetic source-code repo
  * table. Zipfian repo popularity (hot repos) makes skew handling
  * load-bearing in the bench (SURVEY.md §7.5). No wall-clock anywhere —
  * event identity is a pure function of (seed, event id).
  */
object LogGen {

  final case class Params(
      nEvents: Long,
      nRepos: Int = 500,
      pathsPerRepo: Int = 200,
      zipfS: Double = 1.1,
      deleteEvery: Int = 50, // 1-in-N events is a DELETE
      seed: Long = 42L,
      /** fraction of the log (from the start) encoded with descriptor v1;
        * the rest uses v2 (adds `author`) — the evolution fixture. */
      v1Fraction: Double = 1.0,
      /** first event id (= seq). A SECOND log generated with
        * `idOffset = <first log's nEvents>` continues the same stream:
        * its events carry strictly higher sequence numbers, so its
        * updates deterministically win the LWW fold over the first log's
        * — the "tail keeps flowing" fixture for gates that do work
        * between two replay waves. */
      idOffset: Long = 0L)

  private val langs = Array("scala", "java", "py", "rs", "go", "md")
  private val codeWords = Array(
    "def", "val", "var", "class", "object", "import", "return", "match",
    "case", "if", "else", "for", "while", "try", "catch", "new", "extends",
    "override", "private", "public", "static", "final", "void", "int",
    "string", "bool", "let", "fn", "impl", "struct", "trait", "enum")

  // splitmix64 — public-domain seeded PRNG step
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Zipf CDF over repo ranks — computed once on the driver, captured in the
    * generator closure (tiny array, no broadcast ceremony needed). */
  def zipfCdf(n: Int, s: Double): Array[Double] = {
    val w = Array.tabulate(n)(i => 1.0 / math.pow(i + 1.0, s))
    val total = w.sum
    val cdf = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf(n - 1) = 1.0
    cdf
  }

  private def pickZipf(cdf: Array[Double], u: Double): Int = {
    val i = java.util.Arrays.binarySearch(cdf, u)
    if (i >= 0) i else math.min(-i - 1, cdf.length - 1)
  }

  def repoName(i: Int): String = f"org$i%03d/repo$i%03d"
  def pathName(i: Int, lang: String): String = {
    val ext = lang match {
      case "scala" => "scala"; case "java" => "java"; case "py" => "py"
      case "rs" => "rs"; case "go" => "go"; case _ => "md"
    }
    s"src/dir${i % 17}/file$i.$ext"
  }

  /** Deterministic pseudo-code content for (repo, path, seq). */
  def content(repoI: Int, pathI: Int, seq: Long, seed: Long): String = {
    var h = mix(seed ^ mix(repoI.toLong << 40 ^ pathI.toLong << 20 ^ seq))
    val nWords = 40 + (Math.floorMod(h, 120L)).toInt // 40..159 words
    val sb = new StringBuilder(nWords * 7)
    var i = 0
    while (i < nWords) {
      h = mix(h)
      sb.append(codeWords(Math.floorMod(h, codeWords.length.toLong).toInt))
      sb.append(if (i % 8 == 7) '\n' else ' ')
      i += 1
    }
    sb.append("// rev ").append(seq)
    sb.toString
  }

  /** One event as a typed tuple (before protobuf encoding) — used by tests
    * and by the oracle fold. */
  final case class RawChange(repo: String, path: String, commit: String,
      lang: String, content: String, seq: Long, op: String, author: String)

  def rawChange(id: Long, p: Params): RawChange = {
    val r0 = mix(p.seed ^ id)
    val cdf = cdfCache.computeIfAbsent((p.nRepos, p.zipfS),
      { k: (Int, Double) => zipfCdf(k._1, k._2) })
    val u = (r0 >>> 11).toDouble / (1L << 53).toDouble
    val repoI = pickZipf(cdf, u)
    val r1 = mix(r0)
    val pathI = Math.floorMod(r1, p.pathsPerRepo.toLong).toInt
    val lang = langs(Math.floorMod(mix(r1), langs.length.toLong).toInt)
    val isDelete = p.deleteEvery > 0 && Math.floorMod(mix(r0 + 7), p.deleteEvery.toLong) == 0L
    val commit = f"${mix(r1 ^ id)}%016x"
    val author = s"dev${Math.floorMod(mix(r0 + 13), 97L)}"
    RawChange(
      repo = repoName(repoI),
      path = pathName(pathI, lang),
      commit = commit,
      lang = lang,
      content = if (isDelete) "" else content(repoI, pathI, id, p.seed),
      seq = id,
      op = if (isDelete) "DELETE" else "UPSERT",
      author = author)
  }

  private val cdfCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Double), Array[Double]]()

  /** Encode one RawChange with the given descriptor (v1 drops `author`).
    * `sizeBytes` (field 9) is the v3/v4 widening fixture — varint either
    * way, which is exactly why int32 → int64 is a sanctioned widening;
    * leave 0 for v1/v2 writers whose descriptor lacks the field. */
  def encodeChange(c: RawChange, desc: MessageDesc, fs: graft.proto.Descriptors.FileSet,
      includeAuthor: Boolean, sizeBytes: Long = 0L): Array[Byte] = {
    var fields = TreeMap.empty[Int, PValue]
    if (c.repo.nonEmpty) fields += (1 -> PStr(c.repo))
    if (c.path.nonEmpty) fields += (2 -> PStr(c.path))
    if (c.commit.nonEmpty) fields += (3 -> PStr(c.commit))
    if (c.lang.nonEmpty) fields += (4 -> PStr(c.lang))
    if (c.content.nonEmpty) fields += (5 -> PStr(c.content))
    if (c.seq != 0) fields += (6 -> PLong(c.seq))
    if (c.op == "DELETE") fields += (7 -> PEnum(1))
    if (includeAuthor && c.author.nonEmpty) fields += (8 -> PStr(c.author))
    if (sizeBytes != 0) fields += (9 -> PLong(sizeBytes))
    DynMsg.encode(fs, DynMsg(desc, fields))
  }

  /** Encode one PARTIAL-UPDATE event (v5, q108): the key + seq + op=PATCH +
    * ONLY the masked data fields, plus the `changed_fields` mask itself
    * (field 10) naming the field numbers this patch sets. A masked field
    * whose value is the proto3 default ("") is still "set" — the mask, not
    * wire presence, is the contract. */
  def encodePatch(c: RawChange, mask: Seq[Int], fs: graft.proto.Descriptors.FileSet,
      desc: MessageDesc): Array[Byte] = {
    var fields = TreeMap.empty[Int, PValue]
    if (c.repo.nonEmpty) fields += (1 -> PStr(c.repo))
    if (c.path.nonEmpty) fields += (2 -> PStr(c.path))
    mask.foreach { fid =>
      val v = fid match {
        case 3 => c.commit
        case 4 => c.lang
        case 5 => c.content
        case 8 => c.author
        case _ => ""
      }
      if (v.nonEmpty) fields += (fid -> PStr(v))
    }
    if (c.seq != 0) fields += (6 -> PLong(c.seq))
    fields += (7 -> PEnum(2)) // PATCH
    fields += (10 -> PList(mask.toVector.map(i => PLong(i.toLong))))
    DynMsg.encode(fs, DynMsg(desc, fields))
  }

  /** Distributed generation of the event log as Dataset[ChangeEvent]. */
  def events(spark: SparkSession, p: Params, partitions: Int = 0): Dataset[ChangeEvent] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    val v1Cut = p.idOffset + (p.nEvents * p.v1Fraction).toLong
    spark.range(p.idOffset, p.idOffset + p.nEvents, 1, parts).mapPartitions { it =>
      // resolve descriptors once per partition
      val fs1 = Cdc.fsV1; val d1 = fs1.findMessage(Cdc.MessageType).get
      val fs2 = Cdc.fsV2; val d2 = fs2.findMessage(Cdc.MessageType).get
      val pid = org.apache.spark.TaskContext.getPartitionId()
      it.map { id =>
        val c = rawChange(id, p)
        val v1 = id < v1Cut
        val payload =
          if (v1) encodeChange(c, d1, fs1, includeAuthor = false)
          else encodeChange(c, d2, fs2, includeAuthor = true)
        ChangeEvent(payload, Cdc.SchemaId, if (v1) 1 else 2, Cdc.MessageType, pid, id)
      }
    }
  }

  /** Varint-delimited segment log: many messages per payload (the log-segment
    * framing from SURVEY.md §2.1). Each segment is one ChangeEvent whose
    * payload is writeDelimitedTo-style concatenation of `msgsPerSegment`
    * messages; offset = first seq in the segment. */
  def segmentEvents(spark: SparkSession, p: Params, msgsPerSegment: Int,
      partitions: Int = 0): Dataset[ChangeEvent] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val v1Cut = p.idOffset + (p.nEvents * p.v1Fraction).toLong
    val nSegments = (p.nEvents + msgsPerSegment - 1) / msgsPerSegment
    spark.range(0, nSegments, 1, parts).mapPartitions { it =>
      val fs1 = Cdc.fsV1; val d1 = fs1.findMessage(Cdc.MessageType).get
      val fs2 = Cdc.fsV2; val d2 = fs2.findMessage(Cdc.MessageType).get
      val pid = org.apache.spark.TaskContext.getPartitionId()
      it.map { seg =>
        val first = p.idOffset + seg * msgsPerSegment
        val last = math.min(first + msgsPerSegment, p.idOffset + p.nEvents)
        val v1 = first < v1Cut
        val w = new graft.proto.Wire.Writer
        var id = first
        while (id < last) {
          val c = rawChange(id, p)
          val bytes =
            if (v1) encodeChange(c, d1, fs1, includeAuthor = false)
            else encodeChange(c, d2, fs2, includeAuthor = true)
          w.writeVarint64(bytes.length.toLong)
          w.writeRaw(bytes)
          id += 1
        }
        ChangeEvent(w.toBytes, Cdc.SchemaId, if (v1) 1 else 2, Cdc.MessageType, pid, first)
      }
    }
  }

  /** Write a delimited-segment log partitioned by epoch. */
  def writeSegmentLog(spark: SparkSession, p: Params, dir: String, epochs: Int,
      msgsPerSegment: Int = 100): Unit = {
    val perEpoch = math.max(1L, (p.nEvents + epochs - 1) / epochs)
    segmentEvents(spark, p, msgsPerSegment)
      .withColumn("epoch", ((col("offset") - p.idOffset) / perEpoch).cast("long"))
      .write.option("parquet.block.size", 16 * 1024 * 1024)
      .partitionBy("epoch").mode("overwrite").parquet(dir)
  }

  /** Write the log to parquet partitioned by epoch (offset-range buckets) —
    * the replayable binlog. Epoch pruning on read is a partition-dir prune. */
  def writeLog(spark: SparkSession, p: Params, dir: String, epochs: Int): Unit = {
    val perEpoch = math.max(1L, (p.nEvents + epochs - 1) / epochs)
    events(spark, p)
      .withColumn("epoch", ((col("offset") - p.idOffset) / perEpoch).cast("long"))
      // small row groups: parquet splits align to row groups, so 128MB
      // groups would cap replay read-parallelism at ~size/128MB tasks
      .write.option("parquet.block.size", 16 * 1024 * 1024)
      .partitionBy("epoch").mode("overwrite").parquet(dir)
  }
}
