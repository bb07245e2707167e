package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main. Currently: ObjectHashAggregate sort-fallback
  * threshold impact on the bitmap state queries.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.Bitmaps.register(spark)

    def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def bench(name: String)(mk: () => DataFrame): Unit = {
      force(mk())
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); force(mk()); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-34s min=${times.min}%.2f s  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    for (threshold <- Seq("128", "1000000")) {
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", threshold)
      bench(s"q20_state_rollup thr=$threshold") { () =>
        SparkEntry.queries("q20_state_rollup")(spark, sfDir)
      }
      bench(s"q21_bitmap_funnel thr=$threshold") { () =>
        SparkEntry.queries("q21_bitmap_funnel")(spark, sfDir)
      }
    }
    spark.stop()
  }
}
