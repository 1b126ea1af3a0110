package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Resequencer: out-of-order arrivals (including cross-wave late rows that
  * must survive a full stop/restart in buffered state) come out in exact
  * per-key event-time order, each exactly once. */
class ResequenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("scrambled feed re-emerges in (ts, event_id) order, exactly once") {
    import spark.implicits._
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-reseq-spec"
    // 4 users × 50 events, 1 s apart; ids interleaved so event_id order
    // disagrees with ts order inside a user (the sort axis is (ts, id))
    val rows = for (u <- 0 until 4; i <- 0 until 50) yield {
      val tsUs = 1700000000000000L + (i * 4 + u) * 1000000L
      (u.toLong, (u * 1000 + (49 - i)).toLong, new java.sql.Timestamp(tsUs / 1000))
    }
    val ev = rows.toDF("user_id", "event_id", "ts")
    val out = Resequence.resequenceToCompletion(spark, ev, root, chunks = 4)
      .orderBy("user_id", "emit_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.length == 200, s"exactly once: got ${out.length}")
    val want = ev.select(col("user_id"), col("event_id"),
      unix_micros(col("ts").cast("timestamp")).as("ts_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (u, es) =>
        es.sortBy(e => (e._3, e._2)).zipWithIndex
          .map { case (e, i) => (u, e._2, i + 1L) }
      }.sortBy(e => (e._1, e._3))
    assert(out.toSeq == want, "emission must equal the batch event-time order")
  }
}
