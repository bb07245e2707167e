package graft.similarity

import org.apache.spark.sql.SparkSession

/** Shared persisted-layout plumbing of the PQ-family indexes
  * ([[PqIndex]], [[IvfPqIndex]]): the parquet round-trip of the frozen
  * quantizers and the drift-baseline sidecar. Keeping these in one place
  * means a layout fix lands in both indexes at once.
  */
private[similarity] object PqLayout {

  def writeCentroids(spark: SparkSession, path: String,
      cents: Array[(Int, Array[Float])]): Unit = {
    import spark.implicits._
    cents.toSeq.map { case (i, v) => (i, v.toSeq) }
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readCentroids(spark: SparkSession, path: String): Array[(Int, Array[Float])] =
    spark.read.parquet(path).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)

  def writeCodebook(spark: SparkSession, path: String, cb: Pq.Codebook): Unit = {
    import spark.implicits._
    (for (mi <- 0 until cb.m; c <- 0 until cb.ksub)
      yield (mi, c, cb.centroids(mi)(c).toSeq))
      .toDF("m_idx", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readCodebook(spark: SparkSession, path: String): Pq.Codebook = {
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toArray)
      .toMap
    val m = rows.keySet.map(_._1).max + 1
    val ksub = rows.keySet.map(_._2).max + 1
    val dim = rows((0, 0)).length * m
    Pq.Codebook(m, ksub, dim, Array.tabulate(m, ksub)((mi, c) => rows((mi, c))))
  }

  def writeDriftBaseline(spark: SparkSession, indexPath: String, error: Double): Unit =
    IndexMaint.writeText(spark, new org.apache.hadoop.fs.Path(indexPath, "_drift.json"),
      s"""{"mean_recon_error":$error}""")

  def readDriftBaseline(spark: SparkSession, indexPath: String): Double =
    IndexMaint.readText(spark, new org.apache.hadoop.fs.Path(indexPath, "_drift.json"))
      .flatMap(s => """"mean_recon_error":([-0-9.eE]+)""".r.findFirstMatchIn(s))
      .map(_.group(1).toDouble)
      .getOrElse(sys.error(s"$indexPath: no drift baseline — index predates build()?"))
}
