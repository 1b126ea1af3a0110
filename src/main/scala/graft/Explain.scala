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
