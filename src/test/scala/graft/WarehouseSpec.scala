package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Warehouse

/** Storage-layout and source coverage (SURVEY §2.1): JSONL dim source (S4),
  * day-partition pruning on the clustered layout (S1), idempotent partition
  * reload (S9), and the rebalance reconciliation invariant (§5 form 3:
  * row/byte totals identical before and after data movement —
  * ref data_rebalance.py:192-198,333-347).
  */
class WarehouseSpec extends SparkSpec {

  test("S4: JSONL dimension source reads with explicit schema") {
    val dir = tmpDir("jsonl")
    val p = Paths.get(dir, "user_dim.txt")
    Files.writeString(p,
      """{"uid": 100000001, "platform": "android", "gender": "男", "age": 25}
        |{"uid": 200000001, "platform": "ios", "gender": "女", "age": 31}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("uid", LongType), StructField("platform", StringType),
      StructField("gender", StringType), StructField("age", ShortType)))
    val df = Warehouse.readJsonl(spark, p.toString, schema)
    assert(df.count() == 2)
    assert(df.schema == schema)
    assert(df.filter(col("platform") === "ios").select("uid").collect()(0).getLong(0) == 200000001L)
  }

  test("S1: day filter on clustered layout prunes partitions at the scan") {
    import spark.implicits._
    val dir = tmpDir("clustered") + "/t"
    val df = Seq(("2024-01-01", 1L, 5.0), ("2024-01-02", 2L, 6.0), ("2024-01-03", 3L, 7.0))
      .toDF("day_s", "uid", "v")
      .select(to_date(col("day_s")).as("day"), col("uid"), col("v"))
    Warehouse.writeClustered(df, dir, "day", Seq("uid"), mode = "overwrite")
    val q = spark.read.parquet(dir).filter(col("day") === lit("2024-01-02").cast(DateType))
    val scan = q.queryExecution.executedPlan.collectFirst { case s: FileSourceScanExec => s }
    assert(scan.isDefined, "expected a FileSourceScanExec")
    assert(scan.get.partitionFilters.nonEmpty, "day predicate must become a partition filter")
    // and the pruned read really only touches one partition's rows
    assert(q.count() == 1)
  }

  test("S2: bloom-filter skip index lands in the parquet footers") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("bloom") + "/t"
    val df = (1 to 2000).map(i => ("2024-01-01", i.toLong * 7919L, i.toDouble))
      .toDF("day_s", "uid", "v")
      .select(to_date(col("day_s")).as("day"), col("uid"), col("v"))
    Warehouse.writeClustered(df, dir, "day", Seq("v"),
      mode = "overwrite", bloomFilterCols = Seq("uid"))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(conf)
    val file = fs.listStatus(new org.apache.hadoop.fs.Path(dir + "/day=2024-01-01"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns.asScala
      def offsetOf(name: String) =
        cols.find(_.getPath.toDotString == name).get.getBloomFilterOffset
      assert(offsetOf("uid") >= 0, "uid should carry a bloom filter")
      assert(offsetOf("v") < 0, "v should NOT carry a bloom filter")
    } finally reader.close()
  }

  test("S9: dynamic partition overwrite reloads one day idempotently") {
    import spark.implicits._
    val dir = tmpDir("reload") + "/t"
    def snap(rows: Seq[(String, Long)]) =
      rows.toDF("day_s", "uid").select(to_date(col("day_s")).as("day"), col("uid"))
    Warehouse.writeClustered(snap(Seq(("2024-01-01", 1L), ("2024-01-02", 2L))), dir, "day", Nil, "overwrite")
    // reload day 2 with new content twice (idempotent), day 1 untouched
    Warehouse.overwritePartitions(snap(Seq(("2024-01-02", 20L))), dir, "day")
    Warehouse.overwritePartitions(snap(Seq(("2024-01-02", 20L))), dir, "day")
    val got = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("uid"))).toSet
    assert(got == Set(("2024-01-01", 1L), ("2024-01-02", 20L)))
  }

  test("bucketed tables join and aggregate with zero exchanges") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    // managed tables land in the session's default warehouse dir; DROP
    // TABLE below deletes their data (managed-table semantics)
    Warehouse.writeBucketed(t.lineitem, "bk_lineitem", Seq("l_orderkey"), 4)
    Warehouse.writeBucketed(t.orders, "bk_orders", Seq("o_orderkey"), 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("bk_lineitem")
        .join(spark.table("bk_orders"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join + same-key agg must be exchange-free:\n$plan")
      // and it computes the right thing
      val viaBuckets = joined.agg(
        org.apache.spark.sql.functions.sum("cnt")).collect().head.getLong(0)
      val direct = t.lineitem.join(t.orders,
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey")).count()
      assert(viaBuckets == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_lineitem")
      spark.sql("DROP TABLE IF EXISTS bk_orders")
    }
  }

  test("S4b: delimited text round-trips quoting, delimiters-in-values, nulls, timestamps") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wh-delim").toString
    val rows = Seq(
      (1L, "plain words", Option("en"), Option(java.time.LocalDateTime.of(2024, 3, 1, 12, 30, 45, 123456000))),
      (2L, "comma, inside \"quotes\" and\ttab", Option("fr"), None),
      (3L, "", None, Option(java.time.LocalDateTime.of(2024, 3, 2, 0, 0, 0)))
    ).toDF("id", "text", "lang", "ts")
    val schema = rows.schema.asInstanceOf[StructType]
    // CSVWithNames
    graft.engine.Warehouse.writeDelimited(rows, s"$dir/csv", header = true)
    val csvBack = graft.engine.Warehouse.readDelimited(spark, s"$dir/csv", schema, header = true)
    // TSVWithNames (tab inside a value forces quoting; must survive)
    graft.engine.Warehouse.writeDelimited(rows, s"$dir/tsv", delimiter = "\t", header = true)
    val tsvBack = graft.engine.Warehouse.readDelimited(spark, s"$dir/tsv", schema, delimiter = "\t", header = true)
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      // Spark writes an empty string as an empty CSV field, which reads
      // back null with the default emptyValue — normalize for compare
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse(""), r.getString(2),
        Option(r.get(3)).map(_.toString).orNull)).toSet
    assert(norm(csvBack) == norm(rows))
    assert(norm(tsvBack) == norm(rows))
    // text sources read everything nullable — compare names+types only
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(csvBack.schema) == shape(schema))
    assert(shape(tsvBack.schema) == shape(schema))
  }

  test("reconciliation invariant: repartition (rebalance analog) preserves counts and sums") {
    val df = spark.range(0, 10000)
      .select(col("id"), (col("id") % 7).as("k"), (col("id") * 3).as("v"))
    val before = df.agg(count(lit(1)), sum("v")).collect()(0)
    val moved = df.repartition(17, col("k")) // cross-"shard" part movement
    val after = moved.agg(count(lit(1)), sum("v")).collect()(0)
    assert(before.getLong(0) == after.getLong(0))
    assert(before.getLong(1) == after.getLong(1))
    // per-partition totals also reconcile group-wise
    val perKey = moved.groupBy("k").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perKeyBefore = df.groupBy("k").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perKey == perKeyBefore)
  }
}
