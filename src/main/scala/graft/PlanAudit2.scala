package graft

import org.apache.spark.sql.SparkSession

/** Scratch: full-plan dumps for the two audit questions — q02 pushdown and
  * whole-stage codegen presence after execution (AQE final plan).
  */
object PlanAudit2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    functions.Bitmaps.register(spark)

    val q02 = SparkEntry.queries("q02_filter_project")(spark, sfDir)
    q02.write.format("noop").mode("overwrite").save()
    println("===== q02 final plan =====")
    println(q02.queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))

    val q01 = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    q01.write.format("noop").mode("overwrite").save()
    println("===== q01 final plan (post-exec) =====")
    println(q01.queryExecution.executedPlan.toString.linesIterator.take(30).mkString("\n"))
    spark.stop()
  }
}
