package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Host-side XXH64 ≡ Spark's `xxhash64` expression, property-tested: the
  * lake derives point-lookup buckets driver-side (IceLite.lookup /
  * lookupFiles) and any divergence would silently read the WRONG bucket —
  * a lookup miss, not an error. Covers strings (ascii, unicode incl.
  * surrogates, empty, long), longs, ints, booleans, and multi-column
  * seed-chaining, plus pmod bucket parity with IceLite.bucketExpr. */
class XxHash64HostSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("xxhash64-host-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def forAll[A](gen: Gen[A], n: Int = 200)(body: A => Unit): Unit = {
    var seed = Seed(4242L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default.withSize(1 + i % 60), seed).foreach(body)
      seed = seed.next
      i += 1
    }
  }

  private val strGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.chooseNum(0, 0x10FFFF).suchThat(c => c < 0xD800 || c > 0xDFFF)
      .map(Character.toChars(_).mkString)).map(_.mkString),
    Gen.const(""),
    Gen.listOfN(100, Gen.alphaNumChar).map(_.mkString))

  test("single string column: host hash == Spark xxhash64") {
    val samples = scala.collection.mutable.ArrayBuffer.empty[String]
    forAll(strGen, n = 60)(samples += _)
    // batch into ONE Spark job: a DataFrame of the samples, hash the column
    import spark.implicits._
    val got = samples.toSeq.toDF("s").select(col("s"), xxhash64(col("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(XxHash64Host.hashString(s, XxHash64Host.SparkSeed) == got(s),
        s"host xxhash64 diverged on ${s.take(40).map(_.toInt)}")
    }
  }

  test("longs, ints, booleans and multi-column chains match Spark") {
    val tupleGen = for {
      s <- strGen
      l <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      i <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      b <- Gen.oneOf(true, false)
    } yield (s, l, i, b)
    val samples = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Int, Boolean)]
    forAll(tupleGen, n = 40)(samples += _)
    import spark.implicits._
    val df = samples.toSeq.toDF("s", "l", "i", "b")
    val got = df.select(col("s"), col("l"), col("i"), col("b"),
      xxhash64(col("l")).as("hl"),
      xxhash64(col("i")).as("hi"),
      xxhash64(col("b")).as("hb"),
      xxhash64(col("s"), col("l"), col("i"), col("b")).as("hc")).collect()
    got.foreach { r =>
      val (s, l, i, b) = (r.getString(0), r.getLong(1), r.getInt(2), r.getBoolean(3))
      assert(XxHash64Host.hashLong(l, XxHash64Host.SparkSeed) == r.getLong(4))
      assert(XxHash64Host.hashInt(i, XxHash64Host.SparkSeed) == r.getLong(5))
      assert(XxHash64Host.hashInt(if (b) 1 else 0, XxHash64Host.SparkSeed) == r.getLong(6))
      assert(XxHash64Host.hashColumns(Seq(s, l, i, b)) == r.getLong(7),
        s"chained hash diverged on ($s, $l, $i, $b)")
    }
  }

  test("bucketOf == pmod(xxhash64(keys), B) — the IceLite bucket expression") {
    val keyGen = for { r <- strGen; p <- strGen } yield (r, p)
    val samples = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    forAll(keyGen, n = 50)(samples += _)
    import spark.implicits._
    val df = samples.toSeq.toDF("repo", "path")
    for (buckets <- Seq(8, 64, 1000)) {
      val got = df.select(col("repo"), col("path"),
        graft.lake.IceLite.bucketExpr(Seq("repo", "path"), buckets))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
      samples.foreach { case (r, p) =>
        assert(XxHash64Host.bucketOf(Seq(r, p), buckets) == got((r, p)),
          s"bucket diverged for ($r, $p) at B=$buckets")
      }
    }
  }

  test("lookupFiles bucket-prunes host-side: only the key's bucket survives") {
    import graft.lake.IceLite
    val files = (0 until 16).map(b =>
      IceLite.DataFile(s"f$b.parquet", b, 10, 0)).toVector
    val snap = IceLite.Snapshot(1, IceLite.EpochLedger.empty,
      Vector(Vector(IceLite.ColDef(1, "repo", "STRING"), IceLite.ColDef(2, "path", "STRING"))),
      Vector("repo", "path"), buckets = 16, files = files)
    val key = Map[String, Any]("repo" -> "r7", "path" -> "a/b.scala")
    val expect = XxHash64Host.bucketOf(Seq("r7", "a/b.scala"), 16)
    val pruned = IceLite.lookupFiles(snap, key)
    assert(pruned.map(_.bucket) == Vector(expect),
      s"expected only bucket $expect, got ${pruned.map(_.bucket)}")
  }
}
