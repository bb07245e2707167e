package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main. Currently: q49 connected-components round cost
  * (pairs stage vs iterative loop) after the seeded-label change.
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

    bench("q34_pairs_only") { () =>
      SparkEntry.queries("q34_ngram_jaccard")(spark, sfDir)
    }
    bench("q49_dup_clusters") { () =>
      SparkEntry.queries("q49_dup_clusters")(spark, sfDir)
    }
    spark.stop()
  }
}
