package graft

import org.apache.spark.sql.SparkSession

/** Times individual operator queries (noop sink): runMain graft.QTime <sfDir> [names...] */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"$n%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // phase attribution any gate recorded during the run
    import scala.jdk.CollectionConverters._
    graft.operators.CdcQueries.phaseTimes.asScala.toSeq.sortBy(_._1).foreach { case (tag, ps) =>
      println(s"  [$tag] " + ps.map { case (p, v) => f"$p=$v%.2f" }.mkString(" "))
    }
    spark.stop()
  }
}
