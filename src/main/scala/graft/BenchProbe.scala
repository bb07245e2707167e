package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main for slow bench queries. */
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
    def t(name: String)(f: => DataFrame): Unit = {
      force(f); // warm
      val t0 = System.nanoTime(); force(f)
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val e = Tables(spark, sfDir).eventsWithDefaults
      .withColumn("bucket", pmod(col("user_id"), lit(10)))
    e.cache().count()

    t("base: events+defaults scan") { e.select(count(lit(1))) }
    t("log1 agg only") {
      e.filter(col("event_type").isin("view", "click"))
        .groupBy("day", "bucket")
        .agg(sum(when(col("event_type") === "view", 1).otherwise(0)).as("view_cnt"))
    }
    t("union two aggs") {
      val l1 = e.filter(col("event_type").isin("view", "click"))
        .groupBy("day", "bucket").agg(count(lit(1)).as("a"))
      val l2 = e.filter(col("event_type") === "purchase")
        .groupBy("day", "bucket").agg(count(lit(1)).as("b"))
      l1.unionByName(l2.withColumn("a", lit(null)), allowMissingColumns = true)
    }
    t("union + regroup") {
      val l1 = e.filter(col("event_type").isin("view", "click"))
        .groupBy("day", "bucket").agg(count(lit(1)).as("a"))
      val l2 = e.filter(col("event_type") === "purchase")
        .groupBy("day", "bucket").agg(count(lit(1)).as("b"))
      l1.unionByName(l2, allowMissingColumns = true)
        .groupBy("day", "bucket")
        .agg(coalesce(sum(col("a")), lit(0L)).as("a2"), coalesce(sum(col("b")), lit(0L)).as("b2"))
    }
    t("full q22") { SparkEntry.queries("q22_wide_union")(spark, sfDir) }
    t("q22 minus orderBy") {
      val q = SparkEntry.queries("q22_wide_union")(spark, sfDir)
      q // with order
    }
    t("funnel bitmaps day-only") {
      e.groupBy("day").agg(
        functions.Bitmaps.bitmap_agg(when(col("event_type") === "view", col("user_id"))).as("v"))
    }
    t("full q21") { SparkEntry.queries("q21_bitmap_funnel")(spark, sfDir) }
    spark.stop()
  }
}
