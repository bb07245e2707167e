package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-growable IVF index — the vector twin of
  * [[graft.dedup.NearDupIndex]]: train centroids once, then ingest
  * embedding batches forever without touching history.
  *
  * Layout under `path`:
  *  - `centroids/` — parquet (list_id INT, centroid ARRAY<FLOAT>), the
  *    frozen coordinate system every append and search shares;
  *  - `data/` — parquet (neighbor_id, cvec) partitioned by `list_id`, so
  *    a search with `nprobe` lists prunes to `nprobe/nlist` of the corpus
  *    at the FILE level (partition pruning, no data read outside the
  *    probed lists).
  *
  * Centroid assignment is pointwise (each vector vs the broadcast
  * centroids), so append-built lists are bit-identical to a full rebuild
  * with the same centroids — asserted in IvfIndexSpec. Centroid DRIFT is
  * the one thing appends cannot fix: after heavy distribution shift,
  * `build` a fresh index (offline) and swap paths, exactly like a
  * ClickHouse-style background re-merge.
  */
final class IvfIndex(
    spark: SparkSession,
    path: String,
    idCol: String = "vec_id",
    vecCol: String = "embedding") {

  private val centsPath = s"$path/centroids"
  private val dataPath = s"$path/data"

  /** Train centroids on `corpus` (seeded pick + distributed Lloyd) and
    * write the full initial index. Overwrites any existing index at
    * `path`.
    */
  def build(corpus: DataFrame, nlist: Int, lloydIterations: Int = 2): Unit = {
    val c = Ann.refineCentroids(corpus, idCol, vecCol,
      Ann.pickCentroids(corpus, idCol, vecCol, nlist), lloydIterations)
    import spark.implicits._
    c.toSeq.map { case (i, v) => (i, v.toSeq) }
      .toDF("list_id", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(centsPath)
    Ann.ivfIndex(corpus, idCol, vecCol, c)
      .write.mode("overwrite").partitionBy("list_id").parquet(dataPath)
  }

  /** The frozen centroids (driver-side, nlist rows — the IVF regime). */
  def centroids: Array[(Int, Array[Float])] =
    spark.read.parquet(centsPath).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)

  /** Assign a new batch against the frozen centroids and append its rows
    * to the inverted lists. History is never read or rewritten.
    */
  def append(batch: DataFrame): Unit =
    Ann.ivfIndex(batch, idCol, vecCol, centroids)
      .write.mode("append").partitionBy("list_id").parquet(dataPath)

  /** The persisted inverted lists (list_id is the partition column). */
  def index: DataFrame = spark.read.parquet(dataPath)

  /** nprobe-list search over everything indexed so far. */
  def topK(probes: DataFrame, k: Int, nprobe: Int = 4): DataFrame =
    Ann.ivfTopK(index, centroids, probes, idCol, vecCol, k, nprobe)
}
