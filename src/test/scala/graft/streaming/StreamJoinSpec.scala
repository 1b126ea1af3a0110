package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Stream-stream interval join ≡ the batch join, including pairs whose two
  * sides arrive in DIFFERENT waves (buffered join state must survive the
  * wave-boundary stop/restart to emit them). */
class StreamJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val t0 = 1700000000L // epoch seconds, fixed

  private def mkLeft(rows: Seq[(Long, Long, Long)]): DataFrame = { // (key, sec, id)
    import spark.implicits._
    rows.toDF("user_id", "sec", "l_id")
      .select(col("user_id"), timestamp_seconds(col("sec") + t0).as("l_ts"), col("l_id"))
  }
  private def mkRight(rows: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "sec", "r_id")
      .select(col("user_id"), timestamp_seconds(col("sec") + t0).as("r_ts"), col("r_id"))
  }

  test("3-wave stream ≡ batch join; cross-wave pairs survive the restarts") {
    // 3 bands of ~10000 s. Pairs: within-band, PLUS a left at the very end
    // of band 0 matching a right at the start of band 1 (left state must
    // survive restart), and a right at the end of band 1 matching a left
    // at the start of band 2 is impossible (rts >= lts), so instead a left
    // just before the band-1/2 boundary pairs a right just after it.
    // time span 100..29999 s → band boundaries ≈ 10066 s and 20033 s
    val left = Seq(
      (1L, 100L, 10L), (1L, 9990L, 11L),       // 11 pairs across the 0/1 boundary
      (2L, 12000L, 20L), (2L, 19995L, 21L),    // 21 pairs across the 1/2 boundary
      (3L, 25000L, 30L),
      (4L, 5000L, 40L))                        // no matching right at all
    val right = Seq(
      (1L, 130L, 510L),                        // same-band match for 10
      (1L, 10150L, 511L),                      // band 1: cross-boundary match for 11
      (2L, 12010L, 520L),                      // same-band match for 20
      (2L, 20040L, 521L),                      // band 2: cross-boundary match for 21
      (3L, 25050L, 530L),
      (3L, 29999L, 531L),                      // outside tol of 200 → no pair
      (5L, 100L, 550L))                        // no matching left
    val (l, r) = (mkLeft(left), mkRight(right))
    val root = s"${Files.createTempDirectory("graft-ssj")}/work"
    val got = StreamJoin.intervalJoinStreamToCompletion(
        spark, l, r, root, chunks = 3,
        key = "user_id", lTime = "l_ts", rTime = "r_ts", tolSeconds = 200)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = Set((10L, 510L), (11L, 511L), (20L, 520L), (21L, 521L), (30L, 530L))
    assert(got == want)
    // the two cross-boundary pairs are the state-recovery evidence
    assert(got.contains((11L, 511L)) && got.contains((21L, 521L)))

    // batch equivalence via the same join expression
    val batch = StreamJoin.intervalJoin(l, r.withColumnRenamed("user_id", "__r_user_id"),
        "user_id", "__r_user_id", "l_ts", "r_ts", 200)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(batch == want)
  }

  test("duplicate-free across an idle wave (no new files on one side)") {
    // all rights in band 0; lefts span all bands — later waves append only
    // left files, and already-emitted pairs must not re-emit
    val left = Seq((1L, 50L, 1L), (1L, 15000L, 2L), (1L, 25000L, 3L))
    val right = Seq((1L, 60L, 9L))
    val root = s"${Files.createTempDirectory("graft-ssj2")}/work"
    val got = StreamJoin.intervalJoinStreamToCompletion(
        spark, mkLeft(left), mkRight(right), root, chunks = 3,
        key = "user_id", lTime = "l_ts", rTime = "r_ts", tolSeconds = 60)
      .select("l_id", "r_id").collect().toSeq
    assert(got.map(x => (x.getLong(0), x.getLong(1))) == Seq((1L, 9L)))
  }
}
