package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's cross-shard rebalance tool (ref scripts/python/
  * data_rebalance.py, 601 lines) re-expressed for Spark storage. The
  * FETCH/DETACH/ATTACH part-move machinery collapses to a partition
  * rewrite — what survives, faithfully, is the *logic*:
  *
  *  1. measure per-partition size (bytes/rows/files — :116-205's
  *     system.parts queries);
  *  2. detect skew with the same predicate —
  *     `min(pb) <= avg(pb)*low AND max(pb) >= avg(pb)*high` (:159-160);
  *  3. move data (repartition-rewrite of the skewed day — :239-282's
  *     greedy part moves);
  *  4. reconcile: row counts per partition must be identical before and
  *     after, else report failure (:192-198, 333-347 `not_same_partition`).
  */
object Rebalance {

  final case class PartitionStat(partition: String, files: Long, bytes: Long, rows: Long)

  /** The parquet data files directly under `dir` — THE definition of a
    * "part" (hidden, underscore-prefixed and non-parquet sidecar files
    * excluded), shared by [[partitionStats]], [[detectSkew]] and
    * system.parts publication so the three views of a directory can
    * never disagree about what counts.
    */
  def dataFiles(fs: FileSystem, dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
    fs.listStatus(dir).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet") &&
        !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)

  /** Footer record count of one parquet file — metadata only, no scan. */
  def footerRows(conf: org.apache.hadoop.conf.Configuration, f: Path): Long = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
    try reader.getRecordCount finally reader.close()
  }

  /** The hive-UNESCAPED partition value of a `col=value` directory name. */
  def dirValue(dirName: String, partitionCol: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(dirName.drop(partitionCol.length + 1))
  final case class Report(
      rebalanced: Seq[String],
      before: Map[String, Long],
      after: Map[String, Long]) {
    /** The reference's reconciliation gate. */
    def consistent: Boolean = before == after
    def inconsistent: Map[String, (Long, Long)] =
      (before.keySet ++ after.keySet).iterator
        .map(k => k -> (before.getOrElse(k, -1L), after.getOrElse(k, -1L)))
        .filter { case (_, (b, a)) => b != a }.toMap
  }

  /** Per-partition file stats of a day-partitioned parquet table —
    * METADATA ONLY: row counts come from parquet footers, not a scan (the
    * reference's system.parts reads are metadata lookups too, and a full
    * count job per stats call would be a table scan at 100 TB). Partition
    * values are returned hive-UNESCAPED, so they compare (and filter)
    * against the column's own string values — the escaped dirname form
    * previously made any value containing ':' '/' '%' read as zero rows
    * and silently miss the rebalance filter.
    */
  def partitionStats(spark: SparkSession, path: String, partitionCol: String = "day"):
      Seq[PartitionStat] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(path), conf)
    val root = new Path(path)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partitionCol + "="))
      .map { s =>
        val files = dataFiles(fs, s.getPath)
        val rows = files.map(f => footerRows(conf, f.getPath)).sum
        PartitionStat(dirValue(s.getPath.getName, partitionCol),
          files.length.toLong, files.map(_.getLen).sum, rows)
      }
      .sortBy(_.partition)
  }

  /** Skew detection — the reference's exact HAVING predicate over per-file
    * sizes within each partition (data_rebalance.py:159-160): a partition is
    * skewed when its smallest file ≤ avg·low AND its largest ≥ avg·high.
    */
  def detectSkew(spark: SparkSession, path: String, partitionCol: String = "day",
      low: Double = 0.75, high: Double = 1.0): Seq[String] = {
    val fs = FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partitionCol + "="))
      .flatMap { s =>
        // same part definition as partitionStats/system.parts — a stray
        // sidecar file must not be able to flag a healthy partition skewed
        val sizes = dataFiles(fs, s.getPath).filter(_.getLen > 0).map(_.getLen.toDouble)
        if (sizes.length < 2) None
        else {
          val avg = sizes.sum / sizes.length
          if (sizes.min <= avg * low && sizes.max >= avg * high)
            // unescaped like partitionStats — rebalance() filters on the
            // COLUMN value, not the dirname encoding
            Some(dirValue(s.getPath.getName, partitionCol))
          else None
        }
      }.sorted
  }

  /** Rebalance the named partitions (rewrite each with `targetFiles` evenly
    * sized files via repartition), then reconcile row counts per partition.
    */
  def rebalance(spark: SparkSession, path: String, partitionCol: String = "day",
      partitions: Seq[String], targetFiles: Int = 4): Report = {
    val before = partitionStats(spark, path, partitionCol).map(s => s.partition -> s.rows).toMap
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      partitions.foreach { p =>
        val part = spark.read.parquet(path)
          .filter(col(partitionCol).cast("string") === p)
        part.repartition(targetFiles)
          .write.mode("overwrite").partitionBy(partitionCol).parquet(path)
      }
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val after = partitionStats(spark, path, partitionCol).map(s => s.partition -> s.rows).toMap
    Report(partitions, before, after)
  }
}
