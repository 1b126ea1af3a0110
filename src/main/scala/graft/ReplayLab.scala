package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cdc.{Cdc, Replay}
import graft.lake.IceLite

/** Scratch decomposition of the phase-B replay cost (guide §1.1 empirical
  * loop): times the headline epoch pipeline in slices — decode-only, then
  * +shuffle+sort, then +dedup — against the staged 24M-event log, so the
  * optimization target inside Merge.mergeEpoch is chosen from evidence.
  * Measurement scratch only; not part of the bench contract. */
object ReplayLab {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(32)
    val mode = if (args.length > 1) args(1) else "slices"
    val logDir = "/dev/shm/graft-bench-24000000/log"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.shuffle.compress", sys.env.getOrElse("LAB_SHUFFLE_COMPRESS", "true"))
      .config("spark.io.compression.codec", sys.env.getOrElse("LAB_IO_CODEC", "lz4"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/tmp/graft-spark"))
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"LAB $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    if (mode == "band") {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val e = graft.operators.Tables.ld(spark, sfDir, "embeddings")
      time("band-cand-warm") {
        graft.operators.SimilarityOps.bandedCandidates(spark, e).count()
      }
      time("band-cand") {
        graft.operators.SimilarityOps.bandedCandidates(spark, e).count()
      }
      (1 to 2).foreach { i =>
        time(s"band-full-$i") {
          graft.operators.SimilarityOps.neardupPairs(spark, sfDir,
            blockCap = 0, bandPrefilter = true).count()
        }
      }
    } else if (mode == "replay") {
      // full replay, same as bench level
      val tableDir = "/dev/shm/graft-lab-table"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      time("replay-full") {
        Replay.replayLog(spark, logDir, tableDir, buckets = 64, pruneBuckets = false)
      }
    } else {
      val registry = spark.sparkContext.broadcast(Cdc.registry)
      val log = spark.read.parquet(logDir)
      val e = 0L
      val ev = log.filter(col("epoch") === e)
        .select("payload", "schemaId", "schemaVersion", "messageType", "partition", "offset")
        .as[graft.decode.ChangeEvent]
      def updates = Replay.decodeForMerge(ev, registry, None).updates

      // slice 0: parquet scan of the payload bytes only (no decode)
      time("scan-only") {
        log.filter(col("epoch") === e).select("payload", "schemaId", "schemaVersion",
          "messageType", "partition", "offset")
          .write.format("noop").mode("overwrite").save()
      }
      // slice 0b: keys-only decode (wire-skip everything but repo/path)
      time("keys-only-decode") {
        graft.decode.Decode.decodeKeys(ev, registry,
          graft.registry.SchemaKey(Cdc.SchemaId, -1), Cdc.MessageType,
          Seq("repo", "path")).write.format("noop").mode("overwrite").save()
      }
      // slice 1: decode only (map-only job, noop sink)
      time("decode-only") {
        Replay.decodeForMerge(ev, registry, None).updates
          .write.format("noop").mode("overwrite").save()
      }
      time("decode-only-2nd") {
        Replay.decodeForMerge(ev, registry, None).updates
          .write.format("noop").mode("overwrite").save()
      }
      // slice 2: decode + bucket + repartition(128) + sort (noop)
      val keyCols = Seq("repo", "path")
      def shaped = updates
        .withColumn("__bucket", pmod(xxhash64(lit(42) +: keyCols.map(col): _*), lit(64L)).cast("int"))
        .withColumn("__sub", pmod(xxhash64(lit("__graft_sub") +: keyCols.map(col): _*), lit(2L)).cast("int"))
        .withColumn("__origin", lit(0))
      time("decode+shuffle-nosort") {
        shaped.repartition(128, col("__bucket"), col("__sub"))
          .write.format("noop").mode("overwrite").save()
      }
      time("decode+shuffle+hashsort") {
        shaped.repartition(128, col("__bucket"), col("__sub"))
          .sortWithinPartitions(col("__bucket"), col("__origin"),
            xxhash64(col("repo"), col("path")), col("repo"), col("path"), col("seq").desc)
          .write.format("noop").mode("overwrite").save()
      }
      time("decode+shuffle+sort") {
        shaped.repartition(128, col("__bucket"), col("__sub"))
          .sortWithinPartitions(col("__bucket"), col("__origin"), col("repo"), col("path"), col("seq").desc)
          .write.format("noop").mode("overwrite").save()
      }
      // slice 3: + the Encoders.row mapPartitions dedup (the codec round trip)
      time("decode+shuffle+sort+dedup") {
        val df = shaped.repartition(128, col("__bucket"), col("__sub"))
          .sortWithinPartitions(col("__bucket"), col("__origin"), col("repo"), col("path"), col("seq").desc)
        val outSchema = df.schema
        val keyIdx = keyCols.map(outSchema.fieldIndex)
        val bucketIdx = outSchema.fieldIndex("__bucket")
        val originIdx = outSchema.fieldIndex("__origin")
        df.mapPartitions { it =>
          var prev: Array[Any] = null
          it.flatMap { row =>
            val k = (keyIdx.map(row.get) :+ row.get(bucketIdx)) :+ row.get(originIdx)
            if (prev != null && java.util.Arrays.equals(
                prev.asInstanceOf[Array[AnyRef]], k.toArray.asInstanceOf[Array[AnyRef]])) None
            else { prev = k.toArray; Some(row) }
          }
        }(org.apache.spark.sql.Encoders.row(outSchema))
          .write.format("noop").mode("overwrite").save()
      }
      // slice 3b: HASH-AGG LWW instead of repartition+sort+mapPartitions:
      // partial max_by(struct) reduces map-side, one exchange on the group
      // keys, tiny second exchange to the bucket layout, cheap final sort
      time("agg-dedup+write") {
        val df = shaped
        val allCols = df.columns
        val grouped = df.groupBy(col("__bucket"), col("__sub"), col("repo"), col("path"), col("__origin"))
          .agg(max_by(struct(allCols.toIndexedSeq.map(col): _*), col("seq")).as("__w"))
          .select(allCols.toIndexedSeq.map(c => col(s"__w.$c").as(c)): _*)
        val outDir2 = "/dev/shm/graft-lab-epoch2"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir2))
        grouped.repartition(128, col("__bucket"), col("__sub"))
          .sortWithinPartitions(col("__bucket"), col("__origin"), col("repo"), col("path"), col("seq").desc)
          .drop("__sub")
          .write.option("parquet.block.size", 16 * 1024 * 1024)
          .partitionBy("__bucket", "__origin").mode("overwrite").parquet(outDir2)
      }
      // slice 4: + parquet write (real sink, dynamic partitions)
      val outDir = "/dev/shm/graft-lab-epoch"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
      time("decode+shuffle+sort+dedup+write") {
        val df = shaped.repartition(128, col("__bucket"), col("__sub"))
          .sortWithinPartitions(col("__bucket"), col("__origin"), col("repo"), col("path"), col("seq").desc)
        val outSchema = df.schema
        val keyIdx = keyCols.map(outSchema.fieldIndex)
        val bucketIdx = outSchema.fieldIndex("__bucket")
        val originIdx = outSchema.fieldIndex("__origin")
        df.mapPartitions { it =>
          var prev: Array[Any] = null
          it.flatMap { row =>
            val k = (keyIdx.map(row.get) :+ row.get(bucketIdx)) :+ row.get(originIdx)
            if (prev != null && java.util.Arrays.equals(
                prev.asInstanceOf[Array[AnyRef]], k.toArray.asInstanceOf[Array[AnyRef]])) None
            else { prev = k.toArray; Some(row) }
          }
        }(org.apache.spark.sql.Encoders.row(outSchema))
          .drop("__sub")
          .write.option("parquet.block.size", 16 * 1024 * 1024)
          .partitionBy("__bucket", "__origin").mode("overwrite").parquet(outDir)
      }
    }
    spark.stop()
  }
}
