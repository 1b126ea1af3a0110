package graft.operators

import org.apache.spark.sql.functions._
import Tables.ld

/** Deduplication operators for a training-data pipeline: exact (hash
  * groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
  * SimHash, n-gram Jaccard. All deterministic: hash functions are
  * md5-derived 60-bit ints reproduced verbatim in the DuckDB oracle.
  *
  * Scale shape: exact dedup is one hash aggregate; MinHash/LSH turns the
  * O(n²) pair problem into per-band hash-bucket joins (shuffles keyed on
  * band value — no cross join anywhere).
  */
object DedupOps {

  import TextOps.{wordsSpark, wordsDuck}

  // 60-bit hash from md5 hex — identical in Spark and DuckDB
  private def hSpark(e: String) = s"CAST(conv(substring(md5(CAST($e AS BINARY)), 1, 15), 16, 10) AS BIGINT)"
  private def hDuck(e: String) = s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  // K=8 universal-hash params over p = 2^31-1 (products stay < 2^62)
  private val P = 2147483647L
  private val hashParams = Seq(
    (1103515245L, 12345L), (1229782938L, 94906265L), (1664525L, 1013904223L),
    (22695477L, 1L), (134775813L, 2531011L), (214013L, 2531011L),
    (69069L, 12345L), (1566083941L, 362436069L))

  private val shinglesSpark =
    "CASE WHEN size(ws) >= 3 THEN transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])) ELSE array() END"
  private val shinglesDuck =
    "list_transform(range(len(ws) - 2), i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])"

  private def minhashSpark(k: Int): String = {
    val (a, b) = hashParams(k)
    s"array_min(transform(shingles, s -> ($a * (${hSpark("s")} % $P) + $b) % $P))"
  }
  private def minhashDuck(k: Int): String = {
    val (a, b) = hashParams(k)
    s"list_aggregate(list_transform(shingles, s -> ($a * (${hDuck("s")} % $P) + $b) % $P), 'min')"
  }

  val queries: Seq[OpQuery] = Seq(

    OpQuery("q12_exact_dedup",
      (s, d) => {
        ld(s, d, "documents")
          .groupBy(sha2(col("text").cast("binary"), 256).as("content_hash"))
          .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
          .orderBy("canonical_id")
      },
      Some("""SELECT sha256(text) AS content_hash, min(doc_id) AS canonical_id,
        count(*) AS n_copies FROM documents GROUP BY sha256(text)
        ORDER BY canonical_id""")),

    OpQuery("q17_minhash_sig",
      (s, d) => {
        val base = ld(s, d, "documents")
          .withColumn("ws", expr(wordsSpark))
          .withColumn("shingles", expr(shinglesSpark))
          .filter(size(col("shingles")) > 0)
        val withSig = (0 until 8).foldLeft(base) { (df, k) =>
          df.withColumn(s"mh$k", expr(minhashSpark(k)))
        }
        withSig.select((col("doc_id") +: (0 until 8).map(k => col(s"mh$k"))): _*)
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, ${(0 until 8).map(k => s"${minhashDuck(k)} AS mh$k").mkString(", ")}
        FROM (SELECT doc_id, $shinglesDuck AS shingles
          FROM (SELECT doc_id, $wordsDuck AS ws FROM documents) w) t
        WHERE len(shingles) > 0 ORDER BY doc_id""")),

    OpQuery("q18_lsh_candidate_pairs",
      // 4 bands × 2 rows: docs sharing any band are candidates; verified
      // with exact Jaccard on distinct shingle sets, threshold 0.2
      (s, d) => {
        val sig = ld(s, d, "documents")
          .withColumn("ws", expr(wordsSpark))
          .withColumn("shingles", expr(shinglesSpark))
          .filter(size(col("shingles")) > 0)
        val withMh = (0 until 8).foldLeft(sig) { (df, k) =>
          df.withColumn(s"mh$k", expr(minhashSpark(k)))
        }
        val banded = withMh.select(col("doc_id"), col("shingles"),
          array((0 until 4).map(b =>
            struct(lit(b).as("band"), concat_ws(":", col(s"mh${2 * b}"), col(s"mh${2 * b + 1}")).as("sig"))): _*).as("bands"))
          .select(col("doc_id"), col("shingles"), explode(col("bands")).as("b"))
          .select(col("doc_id"), col("shingles"), col("b.band"), col("b.sig"))
        val l = banded.select(col("band"), col("sig"), col("doc_id").as("a"), col("shingles").as("sa"))
        val r = banded.select(col("band"), col("sig"), col("doc_id").as("b"), col("shingles").as("sb"))
        l.join(r, Seq("band", "sig")).filter(col("a") < col("b"))
          .select(col("a"), col("b"),
            (size(array_intersect(expr("array_distinct(sa)"), expr("array_distinct(sb)"))).cast("double") /
              size(array_union(col("sa"), col("sb"))).cast("double")).as("jaccard"))
          .distinct()
          .filter(col("jaccard") >= 0.2)
          .orderBy("a", "b")
      },
      Some(s"""WITH sig AS (
          SELECT doc_id, shingles,
            ${(0 until 8).map(k => s"${minhashDuck(k)} AS mh$k").mkString(", ")}
          FROM (SELECT doc_id, $shinglesDuck AS shingles
            FROM (SELECT doc_id, $wordsDuck AS ws FROM documents) w) t
          WHERE len(shingles) > 0),
        banded AS (
          SELECT doc_id, shingles, unnest([0,1,2,3]) AS band,
            unnest([mh0 || ':' || mh1, mh2 || ':' || mh3, mh4 || ':' || mh5, mh6 || ':' || mh7]) AS sig2
          FROM sig)
        SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
          CAST(len(list_filter(list_distinct(l.shingles), x -> list_contains(list_distinct(r.shingles), x))) AS DOUBLE) /
          CAST(len(list_distinct(l.shingles || r.shingles)) AS DOUBLE) AS jaccard
        FROM banded l JOIN banded r ON l.band = r.band AND l.sig2 = r.sig2 AND l.doc_id < r.doc_id
        WHERE CAST(len(list_filter(list_distinct(l.shingles), x -> list_contains(list_distinct(r.shingles), x))) AS DOUBLE) /
          CAST(len(list_distinct(l.shingles || r.shingles)) AS DOUBLE) >= 0.2
        ORDER BY a, b""")),

    OpQuery("q19_simhash",
      // 16-bit SimHash over word multiset: bit b set iff sum of ±1 votes
      // (by bit b of each word hash) is positive
      (s, d) => {
        val bits = (0 until 16).map { b =>
          expr(s"CAST(aggregate(ws, 0L, (acc, w) -> acc + CASE WHEN (${hSpark("w")} >> $b) % 2 = 1 THEN 1 ELSE -1 END) > 0 AS INT) * ${1 << b}")
        }.reduce(_ + _)
        ld(s, d, "documents")
          .withColumn("ws", expr(wordsSpark))
          .filter(size(col("ws")) > 0)
          .withColumn("simhash", bits.cast("long"))
          .withColumn("bucket", (col("simhash") / 256).cast("long"))
          .select("doc_id", "simhash", "bucket")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, simhash, simhash // 256 AS bucket FROM (
        SELECT doc_id, CAST(${(0 until 16).map(b =>
          s"(CASE WHEN list_sum(list_transform(ws, w -> CASE WHEN (${hDuck("w")} >> $b) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END) * ${1 << b}").mkString(" + ")} AS BIGINT) AS simhash
        FROM (SELECT doc_id, $wordsDuck AS ws FROM documents) t WHERE len(ws) > 0) q
        ORDER BY doc_id"""))
  )
}
