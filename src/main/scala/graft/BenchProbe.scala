package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.storage.StorageLevel

import graft.text.TextFunctions._

/** Scratch profiling main for slow bench queries. Currently: q35 minhash
  * persist-vs-reuse experiment.
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
    graft.functions.MinHash.register(spark)

    def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def bench(name: String)(mk: () => DataFrame): Unit = {
      force(mk())
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); force(mk()); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${times.min}%.2f s  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    val numHashes = 64; val bands = 16; val rowsPerBand = 4; val threshold = 0.5

    def sigsPlain() = Tables(spark, sfDir).documents
      .select(col("doc_id").as("id"), tokens(col("text")).as("toks"))
      .select(col("id"), explode(array_distinct(shingles(col("toks"), 3))).as("sh"))
      .groupBy("id")
      .agg(graft.functions.MinHash.minhash_agg(col("sh"), numHashes).as("sig"))

    def pairs(sigs: DataFrame): DataFrame = {
      val withBk = sigs.withColumn("bk",
        explode(graft.dedup.Dedup.lshBuckets(col("sig"), bands, rowsPerBand)))
      val a = withBk.select(col("bk"), col("id").as("id_a"), col("sig").as("sig_a"))
      val b = withBk.select(col("bk"), col("id").as("id_b"), col("sig").as("sig_b"))
      a.join(b, Seq("bk"))
        .filter(col("id_a") < col("id_b"))
        .dropDuplicates("id_a", "id_b")
        .withColumn("est_jaccard",
          aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast(DoubleType) / numHashes)
        .filter(col("est_jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("est_jaccard"))
    }

    bench("no-persist") { () => pairs(sigsPlain()) }
    bench("persist-compact") { () =>
      pairs(sigsPlain().persist(StorageLevel.MEMORY_AND_DISK))
    }
    bench("q43_cosine_neardup") { () =>
      SparkEntry.queries("q43_cosine_neardup")(spark, sfDir)
    }

    spark.stop()
  }
}
