package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one SQL statement against the testdata with the full
  * dialect registered (ChCompat + raw tables as temp views named like the
  * DuckDB oracle's). Usage: jrun graft.SqlProbe <sfDir> "<sql>" [n]
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val sql = args(1)
    val n = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ChCompat.register(spark)
    val t = Tables(spark, dir)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(name => spark.read.parquet(s"$dir/$name.parquet")
        .createOrReplaceTempView(name))
    t.events.createOrReplaceTempView("events")
    t.eventsWithDefaults.createOrReplaceTempView("events_with_defaults")
    spark.sql(sql).show(n, truncate = false)
    spark.stop()
  }
}
