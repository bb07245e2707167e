package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print exchange/sort/window counts for the round's new
  * operators (not part of the library surface).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q63_asof_join", "q64_sessions", "q66_sequence_match",
        "q69_topk_weighted", "q70_sum_map")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      def c(s: String) = s.r.findAllIn(plan).length
      println(s"$q exchanges=${c("Exchange hashpartitioning")} " +
        s"rangeExchanges=${c("Exchange rangepartitioning")} " +
        s"windows=${c("Window ")} sorts=${c("Sort ")} " +
        s"cartesian=${c("CartesianProduct")}")
    }
    spark.stop()
  }
}
