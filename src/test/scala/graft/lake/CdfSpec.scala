package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Change feed with row images: pre/post pairing, insert-vs-update
  * classification against the window-start state, delete images,
  * dead-predecessor re-inserts, and multi-epoch chaining. */
class CdfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fid(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("graft.fieldId", n).build()

  private def batch(rows: Seq[(Long, String, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v", "seq", "op")
      .select(col("id").as("id", fid(1)), col("v").as("v", fid(2)),
        col("seq"), col("op"))
  }

  private def fresh(tag: String): String = {
    val src = s"${Files.createTempDirectory(s"graft-$tag")}/src"
    IceLite.create(src, IceLite.withCdcCols(Vector(
      IceLite.ColDef(1, "id", "BIGINT"), IceLite.ColDef(2, "v", "STRING"))),
      Vector("id"), buckets = 8)
    src
  }

  private def images(src: String, from: Int, to: Int): Set[(String, Long, String, Long)] = {
    import spark.implicits._
    Cdf.changesWithImages(spark, src, from, to)
      .select(col("change_type"), col("id"), col("v"), col("seq"))
      .as[(String, Long, String, Long)].collect().toSet
  }

  test("insert / update pre+post / delete / redundant-delete / re-insert") {
    val src = fresh("cdf")
    Merge.mergeEpoch(spark, src, batch(Seq(
      (1L, "a", 1L, "UPSERT"), (2L, "b", 2L, "UPSERT"), (3L, "c", 3L, "UPSERT"),
      (9L, "", 4L, "DELETE") // tombstone on a never-live key, in the BASE
    )), "seq", "op", "e-1")
    Merge.mergeEpoch(spark, src, batch(Seq(
      (1L, "a2", 10L, "UPSERT"),  // update → pre+post
      (2L, "", 11L, "DELETE"),    // delete → preimage only
      (4L, "d", 12L, "UPSERT"),   // brand-new key → insert
      (9L, "z", 13L, "UPSERT")    // re-insert over a dead key → insert
    )), "seq", "op", "e-2")
    assert(images(src, 1, 2) == Set(
      ("update_preimage", 1L, "a", 10L), ("update_postimage", 1L, "a2", 10L),
      ("delete", 2L, "b", 11L),
      ("insert", 4L, "d", 12L),
      ("insert", 9L, "z", 13L)))
  }

  test("multi-epoch window chains: epoch N's preimage is epoch N-1's postimage") {
    val src = fresh("cdf-chain")
    Merge.mergeEpoch(spark, src, batch(Seq((1L, "a", 1L, "UPSERT"))), "seq", "op", "e-1")
    Merge.mergeEpoch(spark, src, batch(Seq((1L, "b", 10L, "UPSERT"))), "seq", "op", "e-2")
    Merge.mergeEpoch(spark, src, batch(Seq((1L, "", 20L, "DELETE"))), "seq", "op", "e-3")
    Merge.mergeEpoch(spark, src, batch(Seq((1L, "c", 30L, "UPSERT"))), "seq", "op", "e-4")
    assert(images(src, 1, 4) == Set(
      ("update_preimage", 1L, "a", 10L), ("update_postimage", 1L, "b", 10L),
      ("delete", 1L, "b", 20L),
      ("insert", 1L, "c", 30L)))
    // narrower window: base state is v2 ("b"), so the delete's image is "b"
    assert(images(src, 2, 4) == Set(
      ("delete", 1L, "b", 20L), ("insert", 1L, "c", 30L)))
  }

  test("redundant delete in the window emits nothing") {
    val src = fresh("cdf-rdel")
    Merge.mergeEpoch(spark, src, batch(Seq((1L, "a", 1L, "UPSERT"))), "seq", "op", "e-1")
    Merge.mergeEpoch(spark, src, batch(Seq(
      (1L, "", 10L, "DELETE"), (7L, "", 11L, "DELETE"))), "seq", "op", "e-2")
    assert(images(src, 1, 2) == Set(("delete", 1L, "a", 10L)))
  }

  test("a LATE LWW-losing event emits no image (absorbed without a state transition)") {
    val src = fresh("cdf-late")
    Merge.mergeEpoch(spark, src, batch(Seq(
      (1L, "a", 10L, "UPSERT"), (2L, "b", 11L, "UPSERT"),
      (3L, "c", 12L, "UPSERT"))), "seq", "op", "e-1")
    Merge.mergeEpoch(spark, src, batch(Seq(
      (3L, "", 13L, "DELETE"))), "seq", "op", "e-2")
    // late epoch: a seq-5 duplicate of key 1 (loses to stored seq 10), a
    // seq-6 upsert of key 3 (loses to its seq-13 tombstone), and ONE real
    // change (key 2 updated at seq 20)
    Merge.mergeEpoch(spark, src, batch(Seq(
      (1L, "stale", 5L, "UPSERT"), (3L, "zombie", 6L, "UPSERT"),
      (2L, "b2", 20L, "UPSERT"))), "seq", "op", "e-3")
    assert(images(src, 2, 3) == Set(
      ("update_preimage", 2L, "b", 20L), ("update_postimage", 2L, "b2", 20L)),
      "late losers must not fabricate inserts of never-live values")
  }
}
