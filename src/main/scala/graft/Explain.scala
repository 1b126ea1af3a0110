package graft

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for representative queries → PLANS.md.
  * The scale checklist each plan is reviewed against: filters/projection
  * pushed to the parquet scan (PushedFilters / ReadSchema), small dims
  * broadcast, WholeStageCodegen spans wide, no stray exchanges. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q03_region_nation_revenue", "q12_exact_dedup",
        "q18_lsh_candidate_pairs", "q21_ann_bruteforce_topk")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans (review artifact)\n\n")
    sb.append("Checklist per plan: parquet scan shows PushedFilters + pruned ReadSchema;\n")
    sb.append("dims broadcast; WholeStageCodegen spans; exchanges only where keyed ops need them.\n\n")
    names.foreach { n =>
      // gates that return a materialized checkpoint explain as a bare RDD
      // scan — substitute the reviewable un-checkpointed plan
      val df = n match {
        case "q36_ann_ivf_topk" => graft.operators.SimilarityOps.q36ProbePlan(spark, sfDir)
        case "q77_stream_stream_join" =>
          // the streaming gate's output plan is just a sink read; the
          // reviewable plan is the per-microbatch join shape, identical to
          // the batch interval join over the same two sides
          import org.apache.spark.sql.functions._
          val ev = graft.operators.Tables.ld(spark, sfDir, "events")
          val left = ev.filter(pmod(col("event_id"), lit(2)) === 0).select(
            col("user_id"), col("event_id").as("l_event_id"),
            col("ts").cast("timestamp").as("l_ts"))
          val right = ev.filter(pmod(col("event_id"), lit(2)) === 1).select(
            col("user_id").as("__r_user_id"), col("event_id").as("r_event_id"),
            col("ts").cast("timestamp").as("r_ts"))
          graft.streaming.StreamJoin.intervalJoin(
            left, right, "user_id", "__r_user_id", "l_ts", "r_ts", 6L * 3600)
        case "q84_log_compaction" =>
          // the gate's returned DF is the replayed table read; the
          // reviewable plan is the compaction SELECTION itself (decode →
          // per-key argmax → identity join back to the raw events)
          val root = s"${System.getProperty("java.io.tmpdir")}/graft-explain-q84"
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
          graft.cdc.LogGen.writeLog(spark, graft.cdc.LogGen.Params(
            nEvents = 1000, nRepos = 10, pathsPerRepo = 8), s"$root/log", epochs = 2)
          graft.cdc.LogCompact.selectionPlan(spark, s"$root/log")
        case "q108_partial_update" =>
          // the gate's returned DF is the table read; the reviewable plan
          // is the patch FOLD itself: bucket-pruned pre-image read →
          // broadcast key semi-join → ONE aggregate over O(patched keys)
          import org.apache.spark.sql.functions._
          import spark.implicits._
          val base = s"${System.getProperty("java.io.tmpdir")}/graft-explain-q108"
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
          val root = s"$base/t"
          def fidm(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
            .putLong("graft.fieldId", n).build()
          def b(rows: Seq[(Long, String, Long, String, Seq[Int])]) =
            rows.toDF("id", "a", "seq", "op", graft.lake.Merge.PatchMaskCol)
              .select(col("id").as("id", fidm(1)), col("a").as("a", fidm(2)),
                col("seq"), col("op"), col(graft.lake.Merge.PatchMaskCol))
          graft.lake.IceLite.create(root, graft.lake.IceLite.withCdcCols(Vector(
            graft.lake.IceLite.ColDef(1, "id", "BIGINT"),
            graft.lake.IceLite.ColDef(2, "a", "STRING"))), Vector("id"), 4)
          graft.lake.Merge.mergeEpoch(spark, root,
            b((1L to 50L).map(i => (i, s"a$i", i, "UPSERT", null: Seq[Int]))),
            "seq", "op", "e-0")
          graft.lake.Merge.resolvePatches(spark, root,
            b((1L to 10L).map(i => (i, s"p$i", 100 + i, "PATCH", Seq(2)))),
            "seq", "op")
        case "q118_merge_into" =>
          // the gate's returned DF is the table read; the reviewable plan
          // is the MERGE batch itself: bucket-pruned pre-image read →
          // semi-join to source keys → matched join (three clauses as
          // expressions) ∪ not-matched anti-join
          import org.apache.spark.sql.functions._
          import spark.implicits._
          val base = s"${System.getProperty("java.io.tmpdir")}/graft-explain-q118"
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
          val root = s"$base/t"
          def fidm(n: Long) = new org.apache.spark.sql.types.MetadataBuilder()
            .putLong("graft.fieldId", n).build()
          graft.lake.IceLite.create(root, graft.lake.IceLite.withCdcCols(Vector(
            graft.lake.IceLite.ColDef(1, "id", "BIGINT"),
            graft.lake.IceLite.ColDef(2, "a", "STRING"))), Vector("id"), 4)
          graft.lake.Merge.mergeEpoch(spark, root,
            (1L to 50L).map(i => (i, s"a$i", i, "UPSERT")).toDF("id", "a", "seq", "op")
              .select(col("id").as("id", fidm(1)), col("a").as("a", fidm(2)),
                col("seq"), col("op")),
            "seq", "op", "e-0")
          // parquet-backed source (a local relation would constant-fold)
          (1L to 10L).map(i => (i, s"s$i", i % 3 == 0)).toDF("id", "a", "del")
            .write.mode("overwrite").parquet(s"$base/src")
          graft.lake.Dml.mergeIntoBatch(spark, graft.lake.IceLite.load(root),
            spark.read.parquet(s"$base/src"), matchedDelete = Some("s.del"),
            matchedSet = Seq("a" -> "s.a"), insertNotMatched = true,
            notMatchedBySourceDelete = Some("id <= 20"), pin = false)
        case "q127_triangle_count" =>
          // localCheckpoint in the gate pins intermediates; the reviewable
          // shape is the oriented wedge join + left-semi close
          graft.operators.GraphOps.q127Plan(spark, sfDir)
        case "q145_stream_left_outer_join" =>
          // per-microbatch plan ≡ the batch left-outer interval join
          import org.apache.spark.sql.functions._
          val ev = graft.operators.Tables.ld(spark, sfDir, "events")
          val left = ev.filter(col("event_type") === "view").select(
            col("user_id"), col("event_id").as("l_event_id"),
            col("ts").cast("timestamp").as("l_ts"))
          val right = ev.filter(col("event_type") === "purchase").select(
            col("user_id").as("__r_user_id"), col("event_id").as("r_event_id"),
            col("ts").cast("timestamp").as("r_ts"))
          graft.streaming.StreamJoin.leftOuterIntervalJoin(
            left, right, "user_id", "__r_user_id", "l_ts", "r_ts", 1800L)
        case "q147_khop_bfs" =>
          // un-pinned single BFS sweep: expansion join + anti-join vs settled
          graft.operators.GraphOps.q147Plan(spark, sfDir)
        case tq @ ("q125_inverted_index" | "q126_phrase_search" | "q130_bm25_topk") =>
          // the gates build-and-query a store; the reviewable plans are the
          // SERVING paths over a prebuilt index (bucket-pruned scans)
          val root = s"${System.getProperty("java.io.tmpdir")}/graft-explain-tidx"
          val docs = graft.operators.Tables.ld(spark, sfDir, "documents")
          val idx =
            if (java.nio.file.Files.exists(java.nio.file.Paths.get(root, "index.json")))
              graft.operators.TextIndex.loadIndex(root)
            else {
              org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
              val i = graft.operators.TextIndex.create(root, 32)
              i.append(docs, 1L); i.appendPositional(docs, 1L); i
            }
          tq match {
            case "q125_inverted_index" =>
              idx.searchAll(spark, Seq("dup", "merge", "window"))
            case "q126_phrase_search" =>
              idx.phraseSearch(spark, Seq("batch", "batch"))
            case _ =>
              idx.rankedSearch(spark, Seq("dup", "merge", "window"), 20)
          }
        case "q159_claim_check" =>
          // the gate's returned DF is the table read; the reviewable plan
          // is the RESOLVE step: claimed rows broadcast-join their payload
          // back from the blob store (binaryFile scan), unclaimed rows
          // pass through — the shape that fuses into each replay epoch
          val root = s"${System.getProperty("java.io.tmpdir")}/graft-explain-q159"
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
          graft.cdc.LogGen.writeLog(spark, graft.cdc.LogGen.Params(
            nEvents = 500, nRepos = 10, pathsPerRepo = 8), s"$root/log", epochs = 1)
          graft.cdc.ClaimCheck.checkIn(spark, s"$root/log", s"$root/claimed",
            s"$root/blobs", 700)
          graft.cdc.ClaimCheck.resolver(spark, s"$root/blobs")(
            spark.read.parquet(s"$root/claimed"))
        case "q100_bucketed_smb_join" =>
          // the reviewable plan is the co-located join itself — the gate's
          // final orderBy adds one presentation-only range exchange
          graft.operators.JoinOps.bucketedSmbJoin(spark, sfDir)
        case "q188_semantic_dedup" =>
          // the gate checkpoints its verdicts for the vacuity assert; the
          // reviewable plan is the un-checkpointed within-cell pairing
          // over a built index (cell-partitioned scan → one groupByKey)
          val root = s"${System.getProperty("java.io.tmpdir")}/graft-explain-q188"
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
          val e = graft.operators.Tables.ld(spark, sfDir, "embeddings")
          val idx = graft.operators.SimilarityOps.buildIvfIndex(
            spark, e, root, cells = 16, iters = 3)
          graft.operators.SemDedup.verdicts(spark, idx)
        case _ => SparkEntry.queries(n)(spark, sfDir)
      }
      sb.append(s"## $n\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n```\n\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md for ${names.size} queries")
    spark.stop()
  }
}
