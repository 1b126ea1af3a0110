package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming KMV ≡ batch KMV bit-for-bit: the k-min set is an order
  * statistic, so wave cuts, duplication, and restarts are invisible. */
class KmvStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def feed(chunks: Int) = {
    import spark.implicits._
    // group "big": 300 distinct keys (saturates k=64); "small": 9 distinct;
    // every key delivered twice (duplication must be invisible)
    val rows = (0 until 2).flatMap { rep =>
      (0L until 300L).map(i => ("big", i, i + rep * 1000)) ++
        (0L until 9L).map(i => ("small", i + 5000, i + rep * 1000))
    }
    rows.toDF("grp", "key", "ord")
      .withColumn("h", xxhash64(col("key")))
      .withColumn("band", (col("ord") % chunks).cast("int"))
  }

  private def batchReadout(chunks: Int): Map[String, (Double, Option[Long], Int)] = {
    val df = feed(chunks).select("grp", "h").distinct()
    val ranked = df.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("grp").orderBy("h")))
      .filter(col("rn") <= 64)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    ranked.map { case (g, mins) =>
      val kth = if (mins.length == 64) Some(mins.last) else None
      val est = kth match {
        case None => mins.length.toDouble
        case Some(h) =>
          63.0 / ((h.toDouble + 9.223372036854775808e18) / 1.8446744073709551616e19)
      }
      g -> (est, kth, mins.length)
    }
  }

  for (chunks <- Seq(2, 3)) {
    test(s"streamed sketch == batch sketch over $chunks waves with restarts") {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft-kmv-spec-$chunks"
      val fin = KmvStream.finalSketch(
        KmvStream.sketchToCompletion(spark, feed(chunks), root, chunks, k = 64))
        .collect().map { r =>
          r.getString(0) -> (r.getDouble(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getInt(3))
        }.toMap
      assert(fin == batchReadout(chunks))
      assert(fin("big")._2.isDefined, "big group must saturate")
      assert(fin("small") == (9.0, None, 9), "small group exact readout")
    }
  }
}
