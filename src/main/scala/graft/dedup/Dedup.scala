package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.TextFunctions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact → MinHash/LSH → SimHash → n-gram Jaccard → embedding
  * cosine (see graft.similarity for the vector side).
  *
  * Scale notes (the whole point): exact dedup is one hash-keyed shuffle;
  * MinHash/LSH turns the O(n²) near-dup problem into `bands` hash-keyed
  * shuffles plus a candidate verify — no cross join anywhere; candidate
  * pairs are bounded by bucket sizes, and every hash is a seeded xxhash64
  * (codegen'd, deterministic across runs and executors).
  */
object Dedup {

  /** Exact dedup on a normalized text hash — one shuffle on the hash key.
    * Keeps the lowest `idCol` per duplicate group (deterministic winner).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val norm = lower(regexp_replace(col(textCol), "\\s+", " "))
    val w = Window.partitionBy(xxhash64(norm), norm).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** MinHash signature from a *materialized* shingle-array column;
    * sig[j] = min over shingles of xxhash64(j, shingle).
    *
    * IMPORTANT: `shingleCol` must be a plain column reference (project the
    * shingle array in a prior select), NOT an inline
    * `shingles(tokens(text))` expression — higher-order functions are
    * interpreted, so an inline array expression would be re-evaluated for
    * every one of the `numHashes` lambda iterations (O(k·n²) regex splits
    * per row; observed as a wedged executor). Catalyst's CollapseProject
    * keeps multi-referenced non-cheap projections un-inlined, so the
    * two-step form evaluates the split exactly once per row.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int = 64): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(shingleCol, s => xxhash64(j, s))))

  /** LSH banding: split the signature into `bands` rows of `rowsPerBand`,
    * hash each band → (band_idx, band_hash) bucket keys. Docs sharing any
    * bucket are candidate near-duplicates.
    */
  def lshBuckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        xxhash64(b, concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))).as("bucket")))

  /** Candidate near-dup pairs via MinHash+LSH, verified with the estimated
    * Jaccard from signature agreement. Returns (id_a, id_b, est_jaccard)
    * with id_a < id_b, est_jaccard >= threshold.
    */
  def minhashNearDups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      shingleSize: Int = 3): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    graft.functions.MinHash.register(df.sparkSession)
    // explode shingles, build signatures with the tight-loop aggregate —
    // the distributed formulation (shuffle keyed by doc id), and ~100×
    // faster than evaluating k hashes in interpreted lambdas per shingle
    val sigs = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), explode(array_distinct(shingles(col("toks"), shingleSize))).as("sh"))
      .groupBy("id")
      .agg(graft.functions.MinHash.minhash_agg(col("sh"), numHashes).as("sig"))
      .withColumn("bk", explode(lshBuckets(col("sig"), bands, rowsPerBand)))
    val a = sigs.select(col("bk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("bk"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast(DoubleType) / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** Exact n-gram (token-shingle) Jaccard near-dup pairs: docs joined on
    * shared shingles (shuffle on shingle), intersection counted per pair,
    * union from per-doc distinct-shingle counts. No cross join; the shingle
    * join is the scalable formulation of pairwise Jaccard.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.2): DataFrame = {
    val sh = df.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), explode(array_distinct(shingles(col("toks"), shingleSize))).as("sh"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sh.as("x").join(sh.as("y"), col("x.sh") === col("y.sh"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "jaccard")
  }

  /** 64-bit SimHash over tokens: per-bit majority vote of token hashes.
    * Built from integer expressions only (no UDF): for each bit position,
    * count tokens whose hash has the bit set vs total, set bit if count
    * exceeds half.
    */
  def simhash64(text: Column): Column = simhash64FromTokens(tokens(text))

  /** SimHash from a materialized token-array column — prefer this in
    * pipelines (see minhashSignature's note on lambda re-evaluation: the
    * token split here is referenced 65× by the bit lambdas).
    */
  def simhash64FromTokens(toks: Column): Column = {
    val hs = transform(toks, t => xxhash64(t))
    val n = size(hs)
    // bit b of the simhash = 1 iff sum over tokens of bit b >= n/2
    // (call_function because the Scala shiftright/shiftleft wrappers only
    // accept literal Int shift amounts)
    def shr(h: Column, b: Column): Column = call_function("shiftright", h, b)
    def shl(h: Column, b: Column): Column = call_function("shiftleft", h, b)
    val bits = sequence(lit(0), lit(63))
    aggregate(
      transform(bits, b =>
        when(
          aggregate(hs, lit(0L),
            (acc, h) => acc + shr(h, b).bitwiseAND(1L)) * 2 >= n,
          shl(lit(1L), b)).otherwise(0L)),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two simhashes (≤ k ⇒ near-dup). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on 16-bit chunks (a pair within Hamming
    * distance ≤ 3 of 4 chunks must agree on ≥1 chunk — pigeonhole), then
    * verify exact Hamming distance. Same no-cross-join shape as LSH.
    */
  def simhashNearDups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), simhash64FromTokens(col("toks")).as("sh"))
    val chunked = sigs.withColumn("chunk", explode(transform(sequence(lit(0), lit(3)),
      c => struct(c.as("c"),
        call_function("shiftright", col("sh"), c * 16).bitwiseAND(0xFFFFL).as("v")))))
    val a = chunked.select(col("chunk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = chunked.select(col("chunk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
