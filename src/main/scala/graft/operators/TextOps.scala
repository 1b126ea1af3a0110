package graft.operators

import org.apache.spark.sql.functions._
import Tables.ld

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  * All run on the `documents` table; every output is integer or
  * identically-computed double so the DuckDB oracle hash-matches.
  */
object TextOps {

  /** tokenization shared by Spark and the oracle: lowercase [a-z0-9]+ runs. */
  val wordsSpark = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
  val wordsDuck = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")
  private[operators] val stopIn = stopwords.map(w => s"'$w'").mkString(", ")

  /** Repetition signals per document (q45's engine; also the curation
    * pipeline's repetition gate, q44): one typed pass — tokenize once,
    * word counts + 2-gram/3-gram distinct sets in the same loop. */
  def repetitionStats(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions { it =>
        val re = java.util.regex.Pattern.compile("[a-z0-9]+")
        it.flatMap { case (id, text) =>
          val m = re.matcher(text.toLowerCase(java.util.Locale.ROOT))
          val ws = scala.collection.mutable.ArrayBuffer.empty[String]
          while (m.find()) ws += m.group()
          val n = ws.length
          if (n == 0) None
          else {
            val wc = new java.util.HashMap[String, Int]()
            var i = 0
            while (i < n) { wc.merge(ws(i), 1, Integer.sum); i += 1 }
            var top = 0
            wc.values.forEach(v => if (v > top) top = v)
            def repFrac(k: Int): Double = {
              val cnt = n - (k - 1)
              if (cnt <= 0) 0.0
              else {
                val seen = new java.util.HashSet[String]()
                var j = 0
                while (j < cnt) {
                  val sb = new StringBuilder(ws(j))
                  var t = 1
                  while (t < k) { sb.append(' ').append(ws(j + t)); t += 1 }
                  seen.add(sb.toString); j += 1
                }
                1.0 - seen.size.toDouble / cnt.toDouble
              }
            }
            val topFrac = top.toDouble / n.toDouble
            val r2 = repFrac(2); val r3 = repFrac(3)
            Some((id, n.toLong, topFrac, r2, r3, r2 > 0.2 || topFrac > 0.2))
          }
        }
      }.toDF("doc_id", "n_words", "top_word_frac", "rep_2gram_frac",
        "rep_3gram_frac", "is_repetitive")
  }

  /** The q45 repetition CTE body (everything after `WITH rep AS`) — shared
    * with q44's composed oracle so the two gates use one definition. */
  private[operators] val repetitionDuckSelect: String =
    s"""SELECT doc_id, n_words, top_word_frac, rep_2gram_frac, rep_3gram_frac,
          (rep_2gram_frac > 0.2 OR top_word_frac > 0.2) AS is_repetitive
        FROM (
          SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
            CAST(list_aggregate(list_transform(list_distinct(ws),
              w -> len(list_filter(ws, x -> x = w))), 'max') AS DOUBLE)
              / CAST(len(ws) AS DOUBLE) AS top_word_frac,
            CASE WHEN len(g2) <= 0 THEN 0.0 ELSE
              1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / CAST(len(g2) AS DOUBLE) END AS rep_2gram_frac,
            CASE WHEN len(g3) <= 0 THEN 0.0 ELSE
              1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / CAST(len(g3) AS DOUBLE) END AS rep_3gram_frac
          FROM (
            SELECT doc_id, ws,
              list_transform(range(len(ws) - 1), i -> ws[i+1] || ' ' || ws[i+2]) AS g2,
              list_transform(range(len(ws) - 2), i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) AS g3
            FROM (SELECT doc_id, $wordsDuck AS ws FROM documents) t) u
          WHERE len(ws) > 0) q""".stripMargin.replace("\n", " ")

  /** All whitespace-delimited word n-grams of each document, one row per
    * (doc_id, gram) — the unit of benchmark-decontamination overlap.
    * One projection pass: tokenize once, slide an n-window via
    * transform(sequence(...)) (codegen'd higher-order functions, no UDF). */
  def wordNgrams(docs: org.apache.spark.sql.DataFrame, n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(1, size(toks) - ${n - 1}), i -> array_join(slice(toks, i, $n), ' '))"))
          .as("gram"))
  }

  /** Benchmark DECONTAMINATION (the GPT-3/Pile 13-gram rule): flag every
    * corpus document sharing at least one word n-gram with the evaluation
    * set. Returns (doc_id, n_hit = distinct benchmark grams matched,
    * contaminated) for EVERY corpus doc — the caller filters or joins.
    *
    * Scale: the benchmark gram set is small and static (a few million
    * grams for every public eval suite combined), so it is broadcast —
    * the corpus side never shuffles; per-doc gram explosion is ~n_words
    * rows wide and collapses immediately in a partial (map-side)
    * countDistinct. At 100 TB this is one broadcast-hash-semi pass over
    * the corpus. */
  def decontaminate(corpus: org.apache.spark.sql.DataFrame,
      benchGrams: org.apache.spark.sql.DataFrame, n: Int): org.apache.spark.sql.DataFrame = {
    val hits = wordNgrams(corpus, n)
      .join(broadcast(benchGrams.select("gram").distinct()), Seq("gram"))
      .groupBy("doc_id").agg(countDistinct("gram").as("n_hit"))
    corpus.select("doc_id").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) > 0).as("contaminated"))
  }

  /** EXACT SUBSTRING (SPAN) DEDUP — the Lee et al. ("Deduplicating
    * Training Data Makes Language Models Better", ACL 2022) intra-corpus
    * rule: any word n-gram occurring more than once in the corpus keeps
    * its FIRST occurrence (smallest (doc_id, pos)) and every later
    * occurrence's n-token span is REMOVED from its document. Unlike the
    * doc-level dedup family (q12/q18/q32) this edits inside documents —
    * the boilerplate/license-header/quoted-reply channel that whole-doc
    * near-dup misses. Single pass (spans are not re-mined after removal),
    * matching the paper's construction.
    *
    * Shape: tokens = split(text, ' ') with 1-based positions; grams slide
    * via transform(sequence(...)) (codegen'd HOFs, one projection — the
    * token array is never duplicated per gram); one shuffle groups
    * occurrences per gram (row_number over (doc_id, pos)); removed spans
    * explode to ≤ n positions each and anti-join the token table; the
    * surviving tokens re-join order-deterministically via
    * array_sort(collect_list(struct(pos, tok))). At 100 TB the gram
    * column would be a 128-bit hash instead of the string (noted, not
    * done here — the gate wants exactness) and the occurrence shuffle is
    * the one unavoidable global stage; everything else is narrow.
    *
    * Returns (doc_id, n_tokens, kept_tokens, removed_tokens, new_text)
    * for EVERY document (fully-deduped docs keep an empty new_text). */
  def dedupSpans(docs: org.apache.spark.sql.DataFrame, n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("l"))
    val toks = base.select(col("doc_id"),
      posexplode(col("l")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tok"))
    val grams = base
      .where(size(col("l")) >= n)
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(1, size(l) - ${n - 1}), i -> struct(i AS pos, array_join(slice(l, i, $n), ' ') AS gram))"))
          .as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gram").as("gram"))
    val wOcc = org.apache.spark.sql.expressions.Window
      .partitionBy("gram").orderBy("doc_id", "pos")
    val removedPos = grams.withColumn("rk", row_number().over(wOcc))
      .filter(col("rk") > 1)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("pos"))
      .distinct()
    val kept = toks.join(removedPos, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_tokens"),
        array_join(expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"), " ")
          .as("new_text"))
    base.select(col("doc_id"), size(col("l")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        (col("n_tokens") - coalesce(col("kept_tokens"), lit(0L))).as("removed_tokens"),
        coalesce(col("new_text"), lit("")).as("new_text"))
  }

  /** Content-defined chunking shared by q178/q179: boundaries where the
    * rolling 3-token-shingle hash60 hits 0 mod 8 — edits shift only the
    * chunks around them. Returns (doc_id, chunk_idx, chunk: array<string>). */
  def cdcChunks(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    graft.functions.Hash60.register(s)
    docs
      .withColumn("ws", expr(wordsSpark))
      .withColumn("n", size(col("ws")))
      .withColumn("cuts", expr(
        """CASE WHEN n >= 3 THEN
             filter(sequence(0, n - 3),
               i -> hash60(concat_ws(' ', ws[i], ws[i+1], ws[i+2])) % 8 = 0)
           ELSE array() END"""))
      .withColumn("bounds", expr(
        "concat(array(0), filter(transform(cuts, i -> i + 3), b -> b < n), array(n))"))
      .withColumn("chunk_idx", explode(expr("sequence(0, size(bounds) - 2)")))
      .withColumn("chunk", expr(
        "slice(ws, bounds[chunk_idx] + 1, bounds[chunk_idx + 1] - bounds[chunk_idx])"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"))
  }

  val queries: Seq[OpQuery] = Seq(

    OpQuery("q13_token_stats",
      (s, d) => {
        ld(s, d, "documents")
          .withColumn("ws", expr(wordsSpark))
          .select(
            col("doc_id"),
            size(col("ws")).cast("long").as("n_tokens"),
            size(array_distinct(col("ws"))).cast("long").as("n_uniq"),
            expr("aggregate(ws, 0L, (acc, w) -> acc + length(w))").as("total_chars"),
            (expr("aggregate(ws, 0L, (acc, w) -> acc + length(w))").cast("double") /
              size(col("ws")).cast("double")).as("avg_token_len"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
        CAST(len(ws) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq,
        CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS total_chars,
        CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS avg_token_len
        FROM (SELECT doc_id, $wordsDuck AS ws FROM documents) t ORDER BY doc_id""")),

    OpQuery("q14_quality_score",
      (s, d) => {
        ld(s, d, "documents")
          .withColumn("ws", expr(wordsSpark))
          .withColumn("n_words", size(col("ws")).cast("long"))
          .withColumn("stop_cnt", expr(s"CAST(size(filter(ws, w -> w IN ($stopIn))) AS BIGINT)"))
          .withColumn("stop_ratio", col("stop_cnt").cast("double") / col("n_words").cast("double"))
          .withColumn("mean_wlen", expr("aggregate(ws, 0L, (acc, w) -> acc + length(w))").cast("double") /
            col("n_words").cast("double"))
          .withColumn("is_quality",
            (col("n_words") >= 20 && col("n_words") <= 2000 &&
              col("mean_wlen") >= 2.0 && col("mean_wlen") <= 12.0).cast("int").cast("long"))
          .select("doc_id", "n_words", "stop_cnt", "stop_ratio", "mean_wlen", "is_quality")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, n_words, stop_cnt,
        CAST(stop_cnt AS DOUBLE) / CAST(n_words AS DOUBLE) AS stop_ratio,
        mean_wlen,
        CAST(CASE WHEN n_words >= 20 AND n_words <= 2000
          AND mean_wlen >= 2.0 AND mean_wlen <= 12.0 THEN 1 ELSE 0 END AS BIGINT) AS is_quality
        FROM (SELECT doc_id,
          CAST(len(ws) AS BIGINT) AS n_words,
          CAST(len(list_filter(ws, w -> w IN ($stopIn))) AS BIGINT) AS stop_cnt,
          CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS mean_wlen
          FROM (SELECT doc_id, $wordsDuck AS ws FROM documents) t) q
        ORDER BY doc_id""")),

    OpQuery("q15_lang_id",
      // n-gram/stopword language-ID heuristic: hit counts per language
      // profile, deterministic argmax with fixed precedence en > de > fr
      (s, d) => {
        val en = Seq("the", "and", "of", "to", "is", "in", "that", "it")
        val de = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu")
        val fr = Seq("le", "la", "les", "et", "est", "un", "une", "que")
        def hits(set: Seq[String]) =
          expr(s"CAST(size(filter(ws, w -> w IN (${set.map(w => s"'$w'").mkString(",")}))) AS BIGINT)")
        ld(s, d, "documents")
          .withColumn("ws", expr(wordsSpark))
          .withColumn("en_hits", hits(en))
          .withColumn("de_hits", hits(de))
          .withColumn("fr_hits", hits(fr))
          .withColumn("lang_guess",
            when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits"), "en")
              .when(col("de_hits") >= col("fr_hits"), "de")
              .otherwise("fr"))
          .select("doc_id", "en_hits", "de_hits", "fr_hits", "lang_guess")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, en_hits, de_hits, fr_hits,
        CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
             WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS lang_guess
        FROM (SELECT doc_id,
          CAST(len(list_filter(ws, w -> w IN ('the','and','of','to','is','in','that','it'))) AS BIGINT) AS en_hits,
          CAST(len(list_filter(ws, w -> w IN ('der','die','das','und','ist','nicht','ein','zu'))) AS BIGINT) AS de_hits,
          CAST(len(list_filter(ws, w -> w IN ('le','la','les','et','est','un','une','que'))) AS BIGINT) AS fr_hits
          FROM (SELECT doc_id, $wordsDuck AS ws FROM documents) t) q
        ORDER BY doc_id""")),

    OpQuery("q38_bpe_token_count",
      // BPE-ish token counting: a GPT-2-style pre-tokenizer regex
      // (contraction suffixes / space-prefixed letter runs / digit runs /
      // punctuation runs — kept RE2-safe, no lookaheads, so the identical
      // pattern runs in Spark's java.util.regex and DuckDB's RE2) plus a
      // per-pretoken subword estimate (ceil(len/4), the standard chars-per-
      // token heuristic — a real BPE merge table slots in per pre-token).
      // Reported next to the naive whitespace count for calibration.
      (s, d) => {
        // NB: this pattern is embedded in a double-quoted SQL string, whose
        // unescaping eats one backslash level — `\\\\s` here reaches the
        // regex engine as `\s` (a single `\\s` silently became `[^a-z0-9s]`,
        // counting whitespace runs as punctuation pretokens; TokenizeSpec
        // pins the tab/double-space behavior the oracle gate can't see)
        val pat = "'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\\\s]+"
        ld(s, d, "documents")
          .withColumn("toks", expr(s"regexp_extract_all(lower(text), \"$pat\", 0)"))
          .select(
            col("doc_id"),
            expr("size(split(trim(text), '\\\\s+'))").cast("long").as("n_ws_tokens"),
            size(col("toks")).cast("long").as("n_pretokens"),
            expr("aggregate(toks, 0L, (acc, t) -> acc + greatest(1L, CAST((length(trim(t)) + 3) div 4 AS LONG)))")
              .as("n_subword_est"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
        CAST(len(toks) AS BIGINT) AS n_pretokens,
        CAST(list_sum(list_transform(toks,
          t -> greatest(1, (length(trim(t)) + 3) // 4))) AS BIGINT) AS n_subword_est
        FROM (SELECT doc_id, text,
          regexp_extract_all(lower(text), '''[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+') AS toks
          FROM documents) q
        ORDER BY doc_id""")),

    OpQuery("q16_fingerprint",
      // exact fingerprint (md5 of normalized text) + rolling 3-shingle
      // min-hash fingerprint (md5-derived 60-bit ints, min over shingles)
      (s, d) => {
        graft.functions.Hash60.register(s)
        ld(s, d, "documents")
          .withColumn("ws", expr(wordsSpark))
          .withColumn("norm", concat_ws(" ", col("ws")))
          .withColumn("exact_fp", md5(col("norm").cast("binary")))
          .withColumn("shingles",
            expr("CASE WHEN size(ws) >= 3 THEN transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])) ELSE array() END"))
          .withColumn("min_fp",
            expr("array_min(transform(shingles, s -> hash60(s)))"))
          .select("doc_id", "exact_fp", "min_fp")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, md5(norm) AS exact_fp,
        list_aggregate(list_transform(shingles,
          s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)), 'min') AS min_fp
        FROM (SELECT doc_id, norm,
          list_transform(range(len(ws) - 2),
            i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) AS shingles
          FROM (SELECT doc_id, $wordsDuck AS ws,
            array_to_string($wordsDuck, ' ') AS norm FROM documents) t) q
        ORDER BY doc_id""")),

    OpQuery("q45_repetition_stats",
      // Gopher/C4-style REPETITION quality signals — the filters real
      // LLM-data pipelines cut boilerplate and spam with: top-word mass,
      // duplicate 2-gram / 3-gram fraction, and the composite
      // is_repetitive flag. ONE typed pass per document (the q17/q19
      // mapPartitions pattern: tokenize once, count words and n-grams in
      // the same loop — not an O(n²) HOF chain); every fraction is an
      // int/int double division so the oracle's values are bit-identical.
      (s, d) => repetitionStats(s, ld(s, d, "documents")).orderBy("doc_id"),
      Some(s"""$repetitionDuckSelect ORDER BY doc_id""")),

    OpQuery("q53_decontaminate",
      // Benchmark decontamination: docs with doc_id % 5 == 0 stand in for
      // the held-out eval set; every remaining doc is scored by how many
      // distinct eval 13-grams it contains (whitespace tokens — the
      // GPT-3/Pile overlap rule). The eval gram set is BROADCAST: the
      // corpus side is one shuffle-free semi pass however big it gets.
      (s, d) => {
        val docs = ld(s, d, "documents")
        val bench = wordNgrams(docs.filter(col("doc_id") % 5 === 0), 13)
        decontaminate(docs.filter(col("doc_id") % 5 =!= 0), bench, 13)
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
          FROM documents),
        grams AS (
          SELECT doc_id, array_to_string(t[i:i+12], ' ') AS gram
          FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 12)) AS i) g
          WHERE len(t) >= 13),
        bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 5 = 0),
        hits AS (
          SELECT g.doc_id, count(DISTINCT g.gram) AS n_hit
          FROM grams g JOIN bench b USING (gram)
          WHERE g.doc_id % 5 <> 0 GROUP BY g.doc_id)
        SELECT d.doc_id, coalesce(h.n_hit, 0) AS n_hit,
               coalesce(h.n_hit, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % 5 <> 0 ORDER BY d.doc_id""")),

    OpQuery("q60_fuzzy_topk",
      // Edit-distance fuzzy matching: top-3 nearest docs per query doc by
      // levenshtein over a 32-char prefix (both engines implement the same
      // integer DP). Deliberately the O(Q×N) brute-force contrast — the
      // scale path for fuzzy dedup is the q17/q18 signature pipeline; this
      // is the exact verifier one runs on candidate pairs.
      (s, d) => {
        val docs = ld(s, d, "documents")
          .select(col("doc_id"), substring(col("text"), 1, 32).as("pfx"))
        val q = docs.filter(col("doc_id") < 5)
          .select(col("doc_id").as("qid"), col("pfx").as("qpfx"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("dist"), col("doc_id"))
        broadcast(q).join(docs, col("qid") =!= col("doc_id"))
          .withColumn("dist", levenshtein(col("qpfx"), col("pfx")).cast("long"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("qid"), col("rank"), col("doc_id").as("cand"), col("dist"))
          .orderBy("qid", "rank")
      },
      Some("""SELECT qid, rank, cand, dist FROM (
          SELECT q.doc_id AS qid, c.doc_id AS cand,
            CAST(levenshtein(substr(q.text, 1, 32), substr(c.text, 1, 32)) AS BIGINT) AS dist,
            row_number() OVER (PARTITION BY q.doc_id
              ORDER BY levenshtein(substr(q.text, 1, 32), substr(c.text, 1, 32)), c.doc_id) AS rank
          FROM (SELECT doc_id, text FROM documents WHERE doc_id < 5) q
          JOIN documents c ON q.doc_id <> c.doc_id) t
        WHERE rank <= 3 ORDER BY qid, rank""")),

    OpQuery("q98_editdist_join",
      // Edit-distance similarity SELF-JOIN with lossless pigeonhole
      // blocking (Pass-Join, Li/Deng/Feng PVLDB'11 — public algorithm):
      // all pairs with levenshtein ≤ k over a fixed 40-char prefix,
      // WITHOUT the O(n²) cross join q60 deliberately demonstrates.
      // Pigeonhole: partition one string into k+1 segments — any pair
      // within distance k must match at least one segment EXACTLY, at a
      // position shifted by ≤ k. So the seg side emits k+1=3 segment keys
      // per doc, the probe side emits each segment window at the 2k+1
      // shifted positions (≤15 keys/doc), candidates come from one
      // (segment_index, content) equi-join — an inverted index, never a
      // cross product — and only candidates pay the exact levenshtein.
      // Both sides grow O(n): at sf0.1 the join yields 6.2k candidate
      // pairs out of 12.5M possible (0.05%); the 4-gram count-filter
      // alternative was measured at 7.5% on this small-vocabulary corpus
      // and rejected. Out-of-window probes at the string edges are
      // truncated by substring() and simply never match — harmless,
      // because an equal-length match can't shift past either edge.
      (s, d) => {
        val k = 2
        // fixed-length keys only: a short string would collapse its tail
        // segments to "" and every short doc would pairwise join on the
        // empty segment — the quadratic blowup the blocking exists to
        // avoid. This corpus's min doc length is 44, so nothing is
        // dropped; a general-corpus variant needs length-banded segment
        // homes instead of this guard.
        val docs = ld(s, d, "documents")
          .select(col("doc_id"), substring(col("text"), 1, 40).as("s"))
          .filter(length(col("s")) === 40)
        // (segment index, 1-based home position, length): 13+13+14 = 40
        val segDefs = Seq((0, 1, 13), (1, 14, 13), (2, 27, 14))
        val segs = segDefs.map { case (si, home, len) =>
          docs.select(col("doc_id"), lit(si).as("si"),
            substring(col("s"), home, len).as("seg"))
        }.reduce(_ unionAll _)
        val probes = segDefs.flatMap { case (si, home, len) =>
          (-k to k).filter(dl => home + dl >= 1).map(dl =>
            docs.select(col("doc_id"), lit(si).as("si"),
              substring(col("s"), home + dl, len).as("seg")))
        }.reduce(_ unionAll _)
        val cand = probes.as("a").join(segs.as("b"),
            col("a.seg") === col("b.seg") && col("a.si") === col("b.si") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a"), col("b.doc_id").as("b")).distinct()
        cand.join(docs.select(col("doc_id").as("a"), col("s").as("sa")), Seq("a"))
          .join(docs.select(col("doc_id").as("b"), col("s").as("sb")), Seq("b"))
          .withColumn("dist", levenshtein(col("sa"), col("sb")).cast("long"))
          .filter(col("dist") <= k)
          .select(col("a"), col("b"), col("dist"))
          .orderBy("a", "b")
      },
      Some("""WITH d AS (SELECT doc_id, substr(text, 1, 40) AS s FROM documents
                WHERE length(substr(text, 1, 40)) = 40)
        SELECT a.doc_id AS a, b.doc_id AS b,
               CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        FROM d a JOIN d b ON a.doc_id < b.doc_id AND levenshtein(a.s, b.s) <= 2
        ORDER BY a, b""")),

    OpQuery("q97_tfidf_topterms",
      // TF-IDF-weighted distinctive terms per document — the relevance /
      // keyword-extraction primitive a corpus pipeline needs beside raw
      // counts (q13). Score = tf × N / df kept INTEGER-EXACT until one
      // final IEEE division (tf×N as BIGINT, then /df — one multiply and
      // one divide, both exactly rounded, so Spark and DuckDB produce the
      // identical double; a log-based idf would hostage the gate to libm
      // differences). Top-3 terms per doc, ties broken by term.
      //
      // Scale shape: two partial-aggregated shuffles (doc×term tf, then
      // term df over the tf table — already one row per (doc,term), never
      // the raw token stream twice: tf feeds BOTH the df aggregation and
      // the join, so it is localCheckpointed as a reduced 3-column
      // projection, the q18 pattern for a stage consumed twice) + one
      // term-keyed join; the per-doc top-k is a bounded window per doc_id
      // (Spark 4 pushes the rank<=3 into the sort as WindowGroupLimit).
      // No driver collects except the corpus count.
      (s, d) => {
        val docs = ld(s, d, "documents")
        val n = docs.count()
        val tf = docs
          .select(col("doc_id"), explode(expr(wordsSpark)).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
          .localCheckpoint()
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
        tf.join(dfreq, Seq("term"))
          .withColumn("score",
            (col("tf") * n).cast("double") / col("df").cast("double"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("term"), col("tf"),
            col("df"), col("score"))
          .orderBy("doc_id", "rank")
      },
      Some(s"""WITH tf AS (
          SELECT doc_id, t.term, count(*) AS tf
          FROM (SELECT doc_id, unnest($wordsDuck) AS term FROM documents) t
          GROUP BY doc_id, t.term),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
            CAST(tf.tf * n.n AS DOUBLE) / CAST(dfreq.df AS DOUBLE) AS score
          FROM tf JOIN dfreq USING (term), n)
        SELECT doc_id, rank, term, tf, df, score FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term) AS rank FROM scored) r
        WHERE rank <= 3 ORDER BY doc_id, rank""")),

    // DOCUMENT CHUNKING WITH OVERLAP — the training-window op: long
    // documents split into fixed-size token windows (64) advanced by a
    // stride (48 → 16-token overlap), the shape every context-window
    // training/RAG pipeline feeds downstream. One narrow projection, no
    // shuffle, all builtin HOFs (regexp tokenize → sequence → explode →
    // slice); chunk identity = sha256 of the space-joined tokens so the
    // oracle certifies every chunk's CONTENT, not just its count. Chunk
    // count = 1 + ceil((n - w)/s) in INTEGER arithmetic on both engines
    // (no float-ceil drift); the final short chunk is kept (slice clamps).
    OpQuery("q177_doc_chunking",
      (s, d) => {
        val w = 64; val st = 48
        ld(s, d, "documents")
          .withColumn("ws", expr(wordsSpark))
          .withColumn("n", size(col("ws")).cast("long"))
          .withColumn("n_chunks",
            when(col("n") <= w, lit(1L)).otherwise(
              lit(1L) + floor((col("n") - w + st - 1) / st).cast("long")))
          .withColumn("chunk_idx", explode(expr("sequence(0L, n_chunks - 1)")))
          .withColumn("chunk",
            expr(s"slice(ws, CAST(chunk_idx * $st + 1 AS INT), $w)"))
          .select(col("doc_id"), col("chunk_idx"),
            size(col("chunk")).cast("long").as("chunk_tokens"),
            sha2(array_join(col("chunk"), " "), 256).as("chunk_sha"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some(s"""WITH t AS (SELECT doc_id, $wordsDuck AS ws FROM documents),
        c AS (SELECT doc_id, ws, len(ws) AS n,
                CASE WHEN len(ws) <= 64 THEN 1
                     ELSE 1 + (len(ws) - 64 + 47) // 48 END AS n_chunks
              FROM t),
        e AS (SELECT doc_id, ws, n,
                unnest(range(0, CAST(n_chunks AS BIGINT))) AS chunk_idx
              FROM c),
        ch AS (SELECT doc_id, chunk_idx,
                 ws[(chunk_idx * 48 + 1):least(chunk_idx * 48 + 64, n)] AS chunk
               FROM e)
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
          CAST(len(chunk) AS BIGINT) AS chunk_tokens,
          sha256(array_to_string(chunk, ' ')) AS chunk_sha
        FROM ch ORDER BY doc_id, chunk_idx""")),

    // CONTENT-DEFINED CHUNKING — the storage-dedup primitive (rsync/LBFS/
    // backup dedup): chunk boundaries cut where a rolling fingerprint of
    // the local content (hash60 of the 3-token shingle, mod 8) hits zero,
    // so INSERTING text into a document shifts only the chunks around the
    // edit — fixed-size chunking (q177) would re-cut everything
    // downstream. Near-dup documents therefore share byte-identical
    // chunks, detectable by a plain GROUP BY chunk_sha. One narrow
    // projection, all builtin HOFs + the codegen'd hash60; the oracle
    // re-derives every boundary and every chunk's content hash.
    OpQuery("q178_cdc_chunking",
      (s, d) => {
        cdcChunks(s, ld(s, d, "documents"))
          .select(col("doc_id"), col("chunk_idx"),
            size(col("chunk")).cast("long").as("chunk_tokens"),
            sha2(array_join(col("chunk"), " "), 256).as("chunk_sha"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some(s"""WITH t AS (SELECT doc_id, $wordsDuck AS ws FROM documents),
        h AS (SELECT doc_id, ws, len(ws) AS n,
                CASE WHEN len(ws) >= 3 THEN
                  list_filter(range(len(ws) - 2),
                    i -> CAST('0x' || substr(md5(ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]), 1, 15) AS BIGINT) % 8 = 0)
                ELSE [] END AS cuts
              FROM t),
        b AS (SELECT doc_id, ws, n,
                [0] || list_filter(list_transform(cuts, i -> i + 3), x -> x < n) || [n] AS bounds
              FROM h),
        e AS (SELECT doc_id, ws, bounds,
                unnest(range(0, CAST(len(bounds) - 1 AS BIGINT))) AS chunk_idx
              FROM b),
        ch AS (SELECT doc_id, chunk_idx,
                 ws[(bounds[CAST(chunk_idx + 1 AS INT)] + 1):bounds[CAST(chunk_idx + 2 AS INT)]] AS chunk
               FROM e)
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
          CAST(len(chunk) AS BIGINT) AS chunk_tokens,
          sha256(array_to_string(chunk, ' ')) AS chunk_sha
        FROM ch ORDER BY doc_id, chunk_idx""")),

    // CONTENT-ADDRESSED CHUNK STORE ROUND-TRIP — the full storage-dedup
    // pipeline over q178's chunks (what a backup system / artifact store /
    // dataset-versioning layer actually does): unique chunks are stored
    // ONCE keyed by their content hash, documents become ref lists
    // (doc_id, chunk_idx, sha), and every document must RECONSTRUCT
    // byte-identically by joining its refs back through the store. Hard
    // asserts: the store is strictly smaller than the ref count (the
    // near-dup plants share chunks — real dedup, not a copy), and the
    // output's doc_sha comes from the STORE-joined reconstruction, never
    // the original text — a lost chunk, a hash collision mishandled, or a
    // misordered ref hash-diverges against the oracle's direct
    // normalization of the source documents.
    OpQuery("q179_chunk_store",
      (s, d) => {
        val chunks = cdcChunks(s, ld(s, d, "documents"))
          .withColumn("chunk_text", array_join(col("chunk"), " "))
          .withColumn("sha", sha2(col("chunk_text"), 256))
        val refs = chunks.select("doc_id", "chunk_idx", "sha").localCheckpoint()
        // the store: each distinct content stored once
        val store = chunks.select("sha", "chunk_text").distinct().localCheckpoint()
        val nRefs = refs.count()
        val nStored = store.count()
        require(nStored < nRefs,
          s"store must dedup shared chunks ($nStored stored of $nRefs refs)")
        CdcQueries.putMetric("q179", "refs", nRefs.toDouble)
        CdcQueries.putMetric("q179", "stored", nStored.toDouble)
        // reconstruction: refs → store join → ordered reassembly
        refs.join(broadcast(store), Seq("sha"))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).cast("long").as("n_chunks"),
            array_join(expr(
              "transform(array_sort(collect_list(struct(chunk_idx, chunk_text))), x -> x.chunk_text)"),
              " ").as("doc_text"))
          .select(col("doc_id"), col("n_chunks"),
            sha2(col("doc_text"), 256).as("doc_sha"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $wordsDuck AS ws FROM documents),
        h AS (SELECT doc_id, ws, len(ws) AS n,
                CASE WHEN len(ws) >= 3 THEN
                  list_filter(range(len(ws) - 2),
                    i -> CAST('0x' || substr(md5(ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]), 1, 15) AS BIGINT) % 8 = 0)
                ELSE [] END AS cuts
              FROM t)
        SELECT doc_id,
          CAST(1 + len(list_filter(list_transform(cuts, i -> i + 3), x -> x < n)) AS BIGINT) AS n_chunks,
          sha256(array_to_string(ws, ' ')) AS doc_sha
        FROM h ORDER BY doc_id""")),

    // EXACT SUBSTRING DEDUP (q181): the Lee et al. intra-corpus span rule
    // over 13-word grams — every duplicated gram keeps its first
    // occurrence, later occurrences' spans are cut from their docs. The
    // oracle re-derives the whole chain (tokenize → slide grams → global
    // first-occurrence rank → span union → surviving-token reassembly) in
    // DuckDB list SQL, so a drifted tokenization, a wrong rank tie-break,
    // an off-by-one span bound, or a misordered reassembly all
    // hash-diverge. new_text rides the compare verbatim.
    OpQuery("q181_span_dedup",
      (s, d) => dedupSpans(ld(s, d, "documents"), n = 13).orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        toks AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM d),
        g AS (SELECT doc_id, pos, array_to_string(l[pos:pos+12], ' ') AS gram
              FROM (SELECT doc_id, l, generate_subscripts(l, 1) AS pos, len(l) AS nn FROM d) t
              WHERE pos + 12 <= nn),
        occ AS (SELECT doc_id, pos,
                  row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rk FROM g),
        rem AS (SELECT DISTINCT doc_id, pos + gs.o AS p
                FROM (SELECT doc_id, pos FROM occ WHERE rk > 1) sp,
                LATERAL (SELECT unnest(generate_series(0, 12)) AS o) gs),
        kept AS (SELECT t.doc_id, t.pos, t.tok
                 FROM toks t LEFT JOIN rem r ON t.doc_id = r.doc_id AND t.pos = r.p
                 WHERE r.doc_id IS NULL),
        agg AS (SELECT doc_id, count(*) AS kept_tokens,
                  string_agg(tok, ' ' ORDER BY pos) AS new_text
                FROM kept GROUP BY doc_id),
        nt AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens FROM d)
        SELECT nt.doc_id, nt.n_tokens,
          coalesce(agg.kept_tokens, 0) AS kept_tokens,
          nt.n_tokens - coalesce(agg.kept_tokens, 0) AS removed_tokens,
          coalesce(agg.new_text, '') AS new_text
        FROM nt LEFT JOIN agg ON nt.doc_id = agg.doc_id
        ORDER BY nt.doc_id"""))
  )
}
