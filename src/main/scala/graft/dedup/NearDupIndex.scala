package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Incremental MinHash/LSH near-duplicate index — the banding pipeline as a
  * persisted, append-only structure, so a streaming/batched ingest dedups
  * each batch against everything seen so far WITHOUT re-signaturing the
  * corpus (the reference's incremental-MV idea applied to dedup; cf.
  * graft.mv.StateTable for the aggregation twin).
  *
  * Layout: parquet rows `(band INT, bucket LONG, id LONG, sig ARRAY<LONG>)`
  * under `path` — one row per (doc × band). All hashes are seeded xxhash64
  * (deterministic across runs/executors), so signatures computed in
  * different batches are directly comparable; the banding parameters are
  * fixed at construction and must not change over the index's life
  * (enforced by a `_meta.json` stamp written on first append).
  *
  * Scale shape: `append` is one shuffle (signature aggregate keyed by doc
  * id) + an append-only write; `probe` shuffles only the BATCH by
  * (band, bucket) and joins against the index — at 100 TB the index side
  * can additionally be bucketed/sorted by (band, bucket) on write to make
  * repeated probes exchange-free on the big side. No operation rewrites
  * history; compaction is a plain parquet rewrite if small appended files
  * accumulate.
  */
final class NearDupIndex(
    spark: SparkSession,
    path: String,
    numHashes: Int = 64,
    bands: Int = 16,
    shingleSize: Int = 3) {

  private val rowsPerBand = numHashes / bands
  require(bands * rowsPerBand == numHashes, "bands must divide numHashes")

  private val metaPath = new org.apache.hadoop.fs.Path(path, "_meta.json")
  private def fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def dataGlob = new org.apache.hadoop.fs.Path(path, "data")

  private def checkOrStampMeta(): Unit = {
    val expect = s"""{"numHashes":$numHashes,"bands":$bands,"shingleSize":$shingleSize}"""
    if (fs.exists(metaPath)) {
      val in = fs.open(metaPath)
      val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      require(got == expect,
        s"NearDupIndex at $path was built with $got; this instance has $expect")
    } else {
      val out = fs.create(metaPath, true)
      try out.write(expect.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Banded rows for a batch: (band, bucket, id, sig). */
  private def banded(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    Dedup.minhashSignatures(docs, textCol, idCol, numHashes, shingleSize)
      .withColumn("bk", explode(Dedup.lshBuckets(col("sig"), bands, rowsPerBand)))
      .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"),
        col("id"), col("sig"))

  /** Append a batch of documents to the index (signatures computed for the
    * batch only). Append-only — no read or rewrite of existing parts.
    */
  def append(docs: DataFrame, textCol: String, idCol: String): Unit = {
    checkOrStampMeta()
    banded(docs, textCol, idCol)
      .write.mode("append").parquet(dataGlob.toString)
  }

  /** The persisted index rows (empty DataFrame if nothing appended yet). */
  def index: DataFrame =
    if (fs.exists(dataGlob)) spark.read.parquet(dataGlob.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "band INT, bucket BIGINT, id BIGINT, sig ARRAY<BIGINT>"))

  /** Near-dup candidates of `docs` against everything indexed so far:
    * (id, dup_of, est_jaccard) where `dup_of` is an already-indexed doc
    * sharing an LSH bucket, est_jaccard >= threshold, id != dup_of.
    * Probe the batch BEFORE appending it to get strictly new-vs-old pairs;
    * probe after appending to also catch in-batch duplicates.
    */
  def probe(docs: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.5): DataFrame = {
    val b = banded(docs, textCol, idCol).persist(StorageLevel.MEMORY_AND_DISK)
    val ix = index.select(col("band"), col("bucket"),
      col("id").as("dup_of"), col("sig").as("sig_ix"))
    b.join(ix, Seq("band", "bucket"))
      .filter(col("id") =!= col("dup_of"))
      .dropDuplicates("id", "dup_of")
      .withColumn("est_jaccard", Dedup.estJaccard(col("sig"), col("sig_ix"), numHashes))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id"), col("dup_of"), col("est_jaccard"))
  }

  /** Ingest convenience: returns the batch rows that survive dedup against
    * the index (id not already indexed — replay-idempotent; no near-dup
    * already indexed; in-batch groups keep the lowest id), then appends
    * ONLY the survivors — the canonical "dedup-as-you-ingest" loop of a
    * training-data pipeline. The batch is signatured exactly ONCE; the
    * history probe, the in-batch pass, and the appended rows all derive
    * from the same persisted banded form (the signature pipeline is the
    * dominant batch-side cost — never pay it twice).
    */
  def dedupAndAppend(docs: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.5): DataFrame = {
    checkOrStampMeta()
    val b = banded(docs, textCol, idCol).persist(StorageLevel.MEMORY_AND_DISK)
    // drop: ids already indexed (replayed batches dedup to nothing) ∪
    // near-dups of already-indexed docs. `index` snapshots its parquet file
    // listing HERE (InMemoryFileIndex lists at read time), so the returned
    // DataFrame keeps answering against pre-append history even though the
    // append below runs first
    val ixAll = index
    val ix = ixAll.select(col("band"), col("bucket"),
      col("id").as("dup_of"), col("sig").as("sig_ix"))
    // no pair-level dropDuplicates here (unlike probe): only DISTINCT ids
    // are needed, so band-duplicate candidate rows are collapsed by the one
    // distinct below instead of an extra full shuffle of pair rows
    val dupOld = b.join(ix, Seq("band", "bucket"))
      .filter(col("id") =!= col("dup_of"))
      .filter(Dedup.estJaccard(col("sig"), col("sig_ix"), numHashes) >= threshold)
      .select("id")
      .union(ixAll.select("id")).distinct()
    val freshB = b.join(dupOld, Seq("id"), "left_anti")
    // in-batch near-dups among the history survivors: bucket self-join of
    // the same banded rows, keep the lowest id per pair
    val xa = freshB.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val xb = freshB.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    val dupNew = xa.join(xb, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .filter(Dedup.estJaccard(col("sig_a"), col("sig_b"), numHashes) >= threshold)
      .select(col("id_b").as("id")).distinct()
    // materialize the survivors ONCE via an eager local checkpoint: the
    // append write and the returned survivor DataFrame both read the
    // checkpointed partitions instead of re-running the probe/self-join
    // cascade. localCheckpoint (not persist): a cached plan here can be
    // aliased by CacheManager's canonical-plan matching across successive
    // ingest calls over the same index path, silently serving a previous
    // batch's survivors; the checkpoint cuts lineage below the plan level
    // and cannot alias.
    val keptB = freshB.join(dupNew, Seq("id"), "left_anti")
      .select(col("band"), col("bucket"), col("id"), col("sig"))
      .localCheckpoint(true)
    b.unpersist()
    keptB.write.mode("append").parquet(dataGlob.toString)
    val keptIds = keptB.select(col("id").as("__kept_id")).distinct()
    docs.join(keptIds, docs(idCol) === col("__kept_id"), "left_semi")
  }
}
