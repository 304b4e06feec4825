package graft

import org.apache.spark.sql.SparkSession

/** Prints the physical plans of key queries for scan-pruning / shuffle
  * auditing (dev tool, not part of the driver contract).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("spatial_grid_join_pp", "pages_geo_join", "dedup_exact", "embed_topk",
               "spatial_bucketed_join", "dedup_minhash")
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("Scan") || l.contains("ReadSchema") || l.contains("PushedFilters") ||
        l.contains("Exchange") || l.contains("Join") || l.contains("WholeStageCodegen"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
