package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print per-declared-query plan stats (hash exchanges,
  * cartesians) to seed/refresh PlanSpec's table-driven budgets.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // second arg = a query name: dump that one plan instead of the sweep
    if (args.length > 1) {
      println(SparkEntry.queries(args(1))(spark, dir).queryExecution.executedPlan.toString)
      spark.stop()
      return
    }
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      try {
        // tree collect, not string match: a string dump re-prints the plan
        // cached inside InMemoryRelation, double-counting its exchanges
        val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
        val ex = plan.collect { case e: ShuffleExchangeExec => e }.length
        val cart = plan.collect { case c: CartesianProductExec => c }.length
        val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }.length
        println(s"PLANSTAT $name $ex $cart $bnlj")
      } catch {
        case e: Exception => println(s"PLANSTAT $name ERROR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
