package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import Tables.ld

/** Explicit skew handling (north rule: "salted repartitioning for hot-repo
  * skew handled explicitly").
  *
  * Two tools:
  *  - [[saltedAgg]]: two-phase aggregation — partial agg on (key, salt),
  *    final agg on key. A Zipf-hot key is spread over `salt` reducers in
  *    phase 1, so no single task owns the hot key's whole partition.
  *  - [[saltedJoinSkewedLeft]]: replicate the small/right side `salt` ways,
  *    salt the skewed left side — every hot-key row lands on a different
  *    reducer. (The CDC merge join itself avoids repo-skew structurally by
  *    keying on (repo, path); these helpers are for repo-level operations.)
  */
object SkewOps {

  /** DETERMINISTIC salt from the whole row's content. Not
    * monotonically_increasing_id(): that is nondeterministic across task
    * retries (it depends on intra-partition order), so after a fetch
    * failure a rerun map task would re-salt the same rows differently and
    * the phase-1 partial agg could double-count or drop rows — the classic
    * nondeterministic-repartition hazard (cf. SPARK-23207). Content-derived
    * hashing re-produces identical salts on any rerun; fully-identical
    * duplicate rows share a salt (they carry no distinguishing bytes),
    * which only matters for a hot key made of byte-identical rows. */
  def withSalt(df: DataFrame, salt: Int, cols: Seq[String]): DataFrame = {
    // map columns are excluded: Spark's hash functions refuse MapType
    // (unordered — no canonical hash), and any other column set already
    // distinguishes rows for salting purposes
    val hashable = df.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toIndexedSeq
    df.withColumn("__salt",
      pmod(xxhash64(hashable: _*), lit(salt.toLong)).cast("int"))
  }

  /** count + sum-style metrics per key via salted two-phase aggregation. */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], salt: Int,
      partials: Seq[(String, Column)], finals: Seq[(String, Column => Column)]): DataFrame = {
    val salted = withSalt(df, salt, keyCols)
    val phase1 = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(finals.head._2(col(finals.head._1)).as(finals.head._1),
        finals.tail.map { case (n, f) => f(col(n)).as(n) }: _*)
  }

  /** Join a skewed fact to a dim: dim replicated `salt` ways (explode), fact
    * salted — hot join keys spread across `salt` reducers. */
  def saltedJoinSkewedLeft(fact: DataFrame, dim: DataFrame, keys: Seq[String], salt: Int): DataFrame = {
    val saltedFact = withSalt(fact, salt, keys)
    val repDim = dim.withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    saltedFact.join(repDim, keys :+ "__salt").drop("__salt")
  }

  val queries: Seq[OpQuery] = Seq(
    OpQuery("q24_salted_user_stats",
      // Zipf-ish hot users: two-phase salted agg; result identical to a
      // plain GROUP BY (the oracle) — salting changes the plan, not the math
      (s, d) => {
        val ev = ld(s, d, "events")
        saltedAgg(ev, Seq("user_id"), salt = 8,
          partials = Seq(
            "n" -> count(lit(1)),
            "sum_value" -> sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))),
          finals = Seq(
            "n" -> ((c: Column) => sum(c)),
            "sum_value" -> ((c: Column) => sum(c))))
          .select(col("user_id"), col("n"),
            col("sum_value").cast("double").as("sum_value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY user_id ORDER BY user_id""")),

    OpQuery("q25_salted_join_topcustomers",
      // orders (fact) salted-joined to customer (dim): equals the plain join
      (s, d) => {
        val o = ld(s, d, "orders")
        val c = ld(s, d, "customer").select("c_custkey", "c_mktsegment")
          .withColumnRenamed("c_custkey", "o_custkey")
        saltedJoinSkewedLeft(o, c, Seq("o_custkey"), salt = 8)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
              .cast("double").as("sum_price"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""))
  )
}
