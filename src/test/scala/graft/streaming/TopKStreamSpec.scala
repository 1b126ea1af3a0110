package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming top-k ≡ batch window top-k: truncation is union-mergeable, so
  * wave cuts, re-deliveries, and restarts are invisible. */
class TopKStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def feed(chunks: Int) = {
    import spark.implicits._
    // 2 groups × 200 rows, seeded values; 40 rows re-delivered verbatim
    val base = (0L until 400L).map { i =>
      (s"g${i % 2}", i, (graft.cdc.LogGen.mix(i) >>> 11).toDouble % 10000)
    }
    (base ++ base.filter(_._2 % 10 == 0)).toDF("grp", "id", "value")
      .withColumn("band", (col("id") % chunks).cast("int"))
  }

  for (chunks <- Seq(2, 3)) {
    test(s"final leaderboard == batch top-k over $chunks waves with restarts") {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft-topk-spec-$chunks"
      val fin = TopKStream.finalTopK(
        TopKStream.topKToCompletion(spark, feed(chunks), root, chunks, k = 7))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val want = feed(chunks).select("grp", "id", "value").distinct()
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
          rows.sortBy(r => (-r._3, r._2)).take(7).zipWithIndex
            .map { case ((_, id, v), i) => (g, i + 1, id, v) }.toSeq
        }.toSet
      assert(fin == want)
    }
  }
}
