package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crypto-shredding invariants: full-keyring decrypt round-trips every
  * byte; a shredded principal reads NULL while everyone else is verbatim;
  * ciphertext never contains the plaintext; per-row IVs make equal
  * plaintexts encrypt differently; erasure touches ONLY the keyring. */
class CryptoShredSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixture() = {
    import spark.implicits._
    val rows = (0L until 200L).map(i => (i, i % 7, s"""{"secret": $i}"""))
    val df = rows.toDF("row_id", "principal", "v")
    val ring = CryptoShred.keyring(spark, "spec-master",
      df.select(col("principal")).distinct())
    val enc = CryptoShred.encrypt(spark, df, ring, "row_id", "principal", "v")
    (df, ring, enc)
  }

  test("full-keyring decrypt round-trips; ciphertext differs per row and hides plaintext") {
    val (df, ring, enc) = fixture()
    val back = CryptoShred.decrypt(spark, enc, ring)
    val orig = df.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val got = back.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == orig)
    val cts = enc.collect().map(r => r.getAs[Array[Byte]]("ct").toSeq)
    assert(cts.distinct.length == cts.length, "per-row IVs must differ")
    // same plaintext, same principal, different row → different ciphertext
    import spark.implicits._
    val twice = Seq((1L, 0L, "same"), (2L, 0L, "same")).toDF("row_id", "principal", "v")
    val encTwice = CryptoShred.encrypt(spark, twice, ring, "row_id", "principal", "v")
      .collect().map(_.getAs[Array[Byte]]("ct").toSeq)
    assert(encTwice(0) != encTwice(1))
    assert(!cts.exists(ct => new String(ct.toArray, java.nio.charset.StandardCharsets.ISO_8859_1)
      .contains("secret")), "ciphertext leaked plaintext")
  }

  test("shred erases exactly the named principals; data files untouched") {
    val (df, ring, enc) = fixture()
    import spark.implicits._
    val erased = Seq(3L, 5L).toDF("principal")
    val ring2 = CryptoShred.shred(ring, erased)
    assert(ring2.count() == ring.count() - 2)
    val back = CryptoShred.decrypt(spark, enc, ring2).collect()
    back.foreach { r =>
      val p = r.getLong(1)
      if (p == 3L || p == 5L) assert(r.isNullAt(2), s"principal $p not erased")
      else assert(r.getString(2) == s"""{"secret": ${r.getLong(0)}}""")
    }
    // the erased rows are exactly the principals' rows — no collateral
    assert(back.count(_.isNullAt(2)) ==
      df.filter(col("principal").isin(3L, 5L)).count())
  }

  test("in-place string-column flavor: round-trip, metadata preserved, missing key fails loudly") {
    import spark.implicits._
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.fieldId", 5L).build()
    val df = Seq((1L, "repoA", "hello"), (2L, "repoB", "world"))
      .toDF("seq", "repo", "content")
      .select(col("seq"), col("repo"), col("content").as("content", meta))
    val ring = CryptoShred.keyringS(spark, "m",
      Seq("repoA", "repoB").toDF("principal"))
    val enc = CryptoShred.encryptInPlace(df, ring, "seq", "repo", "content")
    // schema (incl. field-id metadata) preserved — the ingest-path contract
    assert(enc.schema("content").dataType.typeName == "string")
    assert(enc.schema("content").metadata.getLong("graft.fieldId") == 5L)
    assert(enc.columns.toSeq == df.columns.toSeq)
    assert(!enc.collect().map(_.getString(2)).contains("hello"))
    val back = CryptoShred.decryptInPlace(enc, ring, "repo", "content")
    assert(back.orderBy("seq").collect().map(_.getString(2)).toSeq ==
      Seq("hello", "world"))
    // shredded principal reads NULL; others verbatim
    val half = CryptoShred.decryptInPlace(enc,
      ring.filter(col("principal") =!= "repoA"), "repo", "content")
      .orderBy("seq").collect()
    assert(half(0).isNullAt(2) && half(1).getString(2) == "world")
    // a principal missing from the encrypt-side ring must fail, not leak
    val err = intercept[org.apache.spark.SparkException] {
      CryptoShred.encryptInPlace(df,
        ring.filter(col("principal") === "repoA"), "seq", "repo", "content")
        .collect()
    }
    assert(err.getMessage.contains("refusing to pass plaintext") ||
      Option(err.getCause).exists(_.getMessage.contains("refusing to pass plaintext")))
    // deterministic: same (principal, seq) → same ciphertext across runs
    val enc2 = CryptoShred.encryptInPlace(df, ring, "seq", "repo", "content")
    assert(enc2.orderBy("seq").collect().map(_.getString(2)).toSeq ==
      enc.orderBy("seq").collect().map(_.getString(2)).toSeq)
  }

  test("encrypt fails loudly on a principal missing from the keyring") {
    import spark.implicits._
    val df = Seq((1L, 0L, "a"), (2L, 99L, "b")).toDF("row_id", "principal", "v")
    val ring = CryptoShred.keyring(spark, "spec-master",
      Seq(0L).toDF("principal")) // stale ring: principal 99 absent
    val err = intercept[org.apache.spark.SparkException] {
      CryptoShred.encrypt(spark, df, ring, "row_id", "principal", "v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(err).exists(m => m != null && m.contains("no data key for principal 99")),
      s"must refuse, not silently drop: ${err.getMessage}")
  }

  test("key derivation is deterministic and per-principal") {
    val k1 = CryptoShred.deriveKey("m", 1L)
    val k2 = CryptoShred.deriveKey("m", 1L)
    val k3 = CryptoShred.deriveKey("m", 2L)
    val k4 = CryptoShred.deriveKey("m2", 1L)
    assert(k1.toSeq == k2.toSeq)
    assert(k1.toSeq != k3.toSeq && k1.toSeq != k4.toSeq)
    assert(k1.length == 16)
  }
}
