package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection: score raw documents by how target-like
  * their hashed n-gram distribution is, then importance-resample
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling" — the standard pretraining-corpus selection recipe).
  *
  * Features are unigrams + adjacent-pair bigrams over whitespace tokens.
  * Two paths share the featurization:
  *
  *  - [[featureHits]] — the EXACT anchor: per-document integer sums of
  *    corpus-level feature counts (target corpus and raw corpus). Pure
  *    integers, so it hash-gates against a DuckDB mirror (q123) and pins
  *    the featurization + counting machinery the scored path reuses.
  *  - [[dsirScores]] — the production path: add-α-smoothed bag-of-
  *    hashed-ngrams models for target and raw, importance weight
  *    `log w(x) = Σ_features (log p_target(bucket) − log p_raw(bucket))`.
  *    Hashing to a FIXED bucket count is what makes it scale: the two
  *    models collapse to one `buckets`-row table regardless of corpus
  *    size, and scoring is a broadcast of one array row + a codegen'd
  *    `aggregate()` fold per document — a single corpus scan, no
  *    vocabulary-sized join (the exact path's feature join is
  *    vocabulary-keyed and Zipf-skewed; the hashed path is the 100 TB
  *    shape, exactly the paper's construction).
  *  - [[resampleTopK]] — Gumbel-top-k without replacement over the log
  *    weights: key = score + Gumbel(0,1) noise derived deterministically
  *    from xxhash64(id, seed), so the sample is a pure function of the
  *    data (re-runs and retried tasks agree), and selection is a
  *    TakeOrderedAndProject, not a global sort.
  */
object Importance {

  /** Unigrams + adjacent bigrams (joined with '_') of the whitespace
    * tokens of `textCol`. Empty tokens drop; a one-token document has no
    * bigrams (guarded — Spark's `sequence(0, -1)` would DESCEND).
    */
  def features(textCol: Column): Column = {
    val toks = filter(split(textCol, " "), t => length(t) > 0)
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws("_", element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array())
    concat(toks, bigrams)
  }

  /** Exact integer anchor: for each raw document, the number of its
    * features plus the summed corpus frequencies of those features in the
    * target corpus and in the raw corpus itself. Output:
    * `(idCol, n_feats, tgt_hits, raw_hits)`.
    */
  def featureHits(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val docFeats = raw.select(col(idCol), explode(features(col(textCol))).as("f"))
    val tgtCnt = target.select(explode(features(col(textCol))).as("f"))
      .groupBy("f").agg(count(lit(1)).as("tgt_cnt"))
    val rawCnt = docFeats.groupBy("f").agg(count(lit(1)).as("raw_cnt"))
    docFeats
      .join(tgtCnt, Seq("f"), "left")
      .join(rawCnt, Seq("f"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_feats"),
        sum(coalesce(col("tgt_cnt"), lit(0L))).as("tgt_hits"),
        sum(col("raw_cnt")).as("raw_hits"))
  }

  /** Per-bucket add-α log-likelihood ratios as ONE dense array row:
    * `log((tgt_b+α)/(T+αB)) − log((raw_b+α)/(R+αB))` for every hash
    * bucket b. `buckets` bounds every structure — the exchange moves
    * O(buckets) rows no matter the corpus size.
    */
  private def logRatios(raw: DataFrame, target: DataFrame, textCol: String,
      buckets: Int, alpha: Double): DataFrame = {
    val spark = raw.sparkSession
    def bucketCounts(df: DataFrame, cnt: String): DataFrame =
      df.select(explode(features(col(textCol))).as("f"))
        .select(pmod(xxhash64(col("f")), lit(buckets)).as("b"))
        .groupBy("b").agg(count(lit(1)).as(cnt))
    val tgt = bucketCounts(target, "tgt_cnt")
    val rawB = bucketCounts(raw, "raw_cnt")
    // densify over all bucket ids so the array indexes positionally;
    // totals ride a window over the buckets-row frame (still O(buckets))
    spark.range(buckets).withColumnRenamed("id", "b")
      .join(tgt, Seq("b"), "left").join(rawB, Seq("b"), "left")
      .select(col("b"),
        coalesce(col("tgt_cnt"), lit(0L)).as("t"),
        coalesce(col("raw_cnt"), lit(0L)).as("r"))
      .groupBy()
      .agg(
        sum("t").as("tt"), sum("r").as("rt"),
        sort_array(collect_list(struct(col("b"), col("t"), col("r")))).as("rows"))
      .select(transform(col("rows"), e =>
        log((e.getField("t") + lit(alpha)) / (col("tt") + lit(alpha * buckets))) -
          log((e.getField("r") + lit(alpha)) / (col("rt") + lit(alpha * buckets))))
        .as("ratios"))
  }

  /** DSIR log importance weight per raw document: the sum of its
    * features' bucket log-ratios. Adds `scoreCol` to `raw`; one corpus
    * scan + a broadcast one-row ratios array.
    */
  def dsirScores(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, scoreCol: String = "dsir_score",
      buckets: Int = 8192, alpha: Double = 0.5): DataFrame = {
    val ratios = logRatios(raw, target, textCol, buckets, alpha)
    raw.crossJoin(broadcast(ratios))
      .withColumn(scoreCol,
        aggregate(features(col(textCol)), lit(0.0d), (acc, f) =>
          acc + element_at(col("ratios"),
            pmod(xxhash64(f), lit(buckets)).cast("int") + 1)))
      .drop("ratios")
  }

  /** Exact-feature DSIR log importance weights — the no-hash twin of
    * [[dsirScores]]: per-feature add-α ratios over the EXACT feature
    * vocabulary instead of hash buckets,
    * `lr(f) = ln((tgt_f+α)/(T+αV)) − ln((raw_f+α)/(R+αV))` with
    * V = |target ∪ raw features|, T/R = total feature occurrences; the
    * document weight is Σ lr(f) over its features with multiplicity.
    * Exactness costs a vocabulary-keyed join (Zipf-skewed — AQE splits
    * it) where the hashed path broadcasts one fixed-size array row; use
    * this form when bucket collisions are unacceptable, the hashed form
    * at open-corpus scale. Fully SQL-expressible, so it hash-gates
    * (q161) — pinning the float model math the hashed path shares.
    * Output: `(idCol, n_feats, scoreCol)`; featureless docs score NULL.
    */
  def dsirScoresExact(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, scoreCol: String = "dsir_lw",
      alpha: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val docFeats = raw.select(col(idCol), explode(features(col(textCol))).as("f"))
    val tgtCnt = target.select(explode(features(col(textCol))).as("f"))
      .groupBy("f").agg(count(lit(1)).as("tc"))
    val rawCnt = docFeats.groupBy("f").agg(count(lit(1)).as("rc"))
    // materialized once (eager localCheckpoint): `totals` and `ratios`
    // both read it — without it the two feature-count aggregations and
    // their full-outer join run TWICE. Vocabulary-sized (Zipf ≪ corpus),
    // so the blocks are cheap; unlike a bare persist() (which leaked a
    // cached DataFrame into the session per call), checkpoint blocks are
    // GC-scoped — ContextCleaner frees them once the returned plan is
    // unreferenced. The corpus-sized docFeats explode deliberately
    // recomputes instead (two cheap scans beat materializing
    // corpus × features).
    val j = tgtCnt.join(rawCnt, Seq("f"), "full_outer")
      .select(col("f"),
        coalesce(col("tc"), lit(0L)).as("t"),
        coalesce(col("rc"), lit(0L)).as("r"))
      .localCheckpoint()
    val totals = j.agg(sum("t").as("tt"), sum("r").as("rt"),
      count(lit(1)).as("v"))
    // fixed double expression tree (cast-then-combine) so a SQL mirror
    // reproduces the bits: (t+α)/(T+α·V) etc., one log per side
    def side(cnt: Column, tot: Column, v: Column) =
      log((cnt.cast(DoubleType) + lit(alpha)) /
        (tot.cast(DoubleType) + lit(alpha) * v.cast(DoubleType)))
    val ratios = j.crossJoin(broadcast(totals))
      .select(col("f"),
        (side(col("t"), col("tt"), col("v")) -
          side(col("r"), col("rt"), col("v"))).as("__lr"))
    val scored = docFeats.join(ratios, Seq("f"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__lr")).as(scoreCol))
    raw.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .na.fill(0L, Seq("n_feats"))
  }

  /** Gumbel-top-k resampling without replacement: keep the `k` documents
    * with the largest `score + Gumbel(0,1)` keys, the standard
    * reservoir-free formulation of sampling ∝ exp(score). The Gumbel
    * noise is a pure function of (id, seed) — u ∈ (0,1) from 52
    * xxhash64 bits, g = −log(−log u) — so retried tasks and re-runs
    * select the same set.
    */
  def resampleTopK(scored: DataFrame, idCol: String, scoreCol: String,
      k: Int, seed: Long): DataFrame = {
    val u = (pmod(xxhash64(col(idCol), lit(seed)), lit(1L << 52))
      .cast("double") + lit(0.5d)) / lit((1L << 52).toDouble)
    scored
      .withColumn("__graft_gumbel_key", col(scoreCol) - log(-log(u)))
      .orderBy(desc("__graft_gumbel_key"), col(idCol))
      .limit(k)
      .drop("__graft_gumbel_key")
  }
}
