package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingestion + storage-layout discipline for the layered warehouse
  * (ods/dim/dwm/dws — SURVEY.md §1.1).
  */
object Warehouse {

  /** Materialize the reference's server-side DEFAULT columns on a raw event
    * batch: `day = toDate(second)`, `hour = toStartOfHour(second)`
    * (ref ods.action_001_dis.sql:3-6 — generators insert only base columns,
    * make_user_action_001.py:49).
    */
  /** Spread a narrow input across the session's shuffle parallelism before
    * CPU-heavy per-row work (minhash signatures, language ID, per-element
    * vector math). A small or single-row-group parquet file scans as one
    * task, so everything downstream of it runs on one core until the first
    * shuffle — this hash-repartitions by `key` (deterministic placement)
    * when the scan is narrower than half the shuffle parallelism, and is a
    * no-op on already-wide inputs (a 100 TB scan has thousands of splits;
    * the guard keeps the extra exchange off the big-data path).
    */
  def spreadForCompute(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    // REPARTITION_BY_NUM is exempt from AQE's byte-based coalescing, which
    // under-parallelizes CPU-dense, byte-light rows
    if (df.rdd.getNumPartitions < math.max(2, target / 2))
      df.repartition(target, org.apache.spark.sql.functions.col(key))
    else df
  }

  def withTimeDefaults(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.withColumn("day", to_date(col(tsCol)))
      .withColumn("hour", date_trunc("hour", col(tsCol)))

  /** MergeTree-style write layout: PARTITION BY day directory layout +
    * ORDER BY clustering within files (ref ods.action_001_dis.sql:18-22).
    * Sorting within partitions is what makes Parquet row-group min/max
    * stats act like the sparse primary index (SURVEY §2.1 S2).
    */
  def writeClustered(
      df: DataFrame,
      path: String,
      partitionCol: String = "day",
      orderCols: Seq[String] = Nil,
      mode: String = "append",
      bloomFilterCols: Seq[String] = Nil): Unit = {
    // Parquet bloom filters ≙ ClickHouse's `bloom_filter` skip index
    // (SURVEY §2.1 S2's sparse-index family): point lookups on
    // high-cardinality non-sort columns (user ids, request ids) skip row
    // groups the min/max stats can't — stats on a column UNCORRELATED with
    // the sort order span the whole value range in every row group, while
    // the bloom filter answers "id definitely absent" per group.
    val writer0 = df.repartition(col(partitionCol))
      .sortWithinPartitions((partitionCol +: orderCols).map(col): _*)
      .write.mode(mode)
    val writer = bloomFilterCols.foldLeft(writer0)((w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true"))
    writer.partitionBy(partitionCol).parquet(path)
  }

  /** Idempotent partition reload — the reference's drop-partition + insert +
    * delete-others dance (ref make_user_dim_info_toch.py:40-63) collapses to
    * dynamic partition overwrite (SURVEY §2.1 S9).
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCol: String = "day"): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** JSONL dimension source with explicit schema (ref files/user_dim.txt,
    * read loop make_user_action_001.py:14-19; SURVEY §2.1 S4).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Delimited-text source — the CH text FORMAT family (`CSV`,
    * `CSVWithNames`, `TSV`/`TabSeparated`, `TSVWithNames`; the doc's
    * `FORMAT` clause and `clickhouse-client --format` ingest edge).
    * Schema is explicit (CH's column-list contract — no inference drift),
    * `header` toggles the WithNames variant, `delimiter` picks CSV vs
    * TSV. Reads stay splittable (single-line records), so a 100 TB text
    * drop parallelizes like any other scan; text is an ingest/export
    * edge here, not hot storage — convert to parquet/bucketed tables for
    * repeated queries.
    */
  def readDelimited(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ",", header: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("delimiter", delimiter)
      .option("header", header)
      // read back exactly what writeDelimited (and CH) emit
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .option("nullValue", "\\N")
      .csv(path)

  /** Delimited-text sink — the write side of [[readDelimited]]; CH's
    * `SELECT ... INTO OUTFILE ... FORMAT CSVWithNames` analog. One file
    * per partition (distributed write), quoting only where needed.
    */
  def writeDelimited(df: DataFrame, path: String,
      delimiter: String = ",", header: Boolean = false): Unit =
    df.write.mode("overwrite")
      .option("delimiter", delimiter)
      .option("header", header)
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .option("nullValue", "\\N")
      .csv(path)

  /** Bucketed managed table: pre-shuffle the data ONCE at write time so
    * every later join/aggregation on `bucketCols` is exchange-free — the
    * co-located-join lever for fact⋈fact joins whose dims are too big to
    * broadcast (SCALE.md §5). The in-bucket sort buys parquet row-group
    * clustering/stats, NOT sort-merge-join sort elision (Spark ignores
    * bucket sort order at read since SPARK-28595). The 100 TB pattern:
    * land hot fact tables bucketed by their dominant join key; repeated
    * pipeline stages then read shuffle-free forever.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed needs at least one bucket column")
    val sorted = if (sortCols.isEmpty) bucketCols else sortCols
    // a managed-table location left by a PREVIOUS JVM is invisible to this
    // session's catalog, and saveAsTable refuses to reuse it
    // (LOCATION_ALREADY_EXISTS) — clear the orphan before writing
    val ss = df.sparkSession
    if (!ss.catalog.tableExists(table)) {
      val wh = java.net.URI.create(ss.conf.get("spark.sql.warehouse.dir"))
      val dir = java.nio.file.Paths.get(
        if (wh.getScheme == "file") wh.getPath
        else wh.toString).resolve(table.toLowerCase)
      if (java.nio.file.Files.exists(dir)) {
        import java.util.Comparator
        java.nio.file.Files.walk(dir).sorted(Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      }
    }
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
