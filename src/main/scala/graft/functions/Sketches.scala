package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HLL-sketch UV helpers — the `uniqCombined` / `uniqCombinedState` /
  * `uniqCombinedMerge` family (ref dim.dict_user_dim.sql:24,
  * dwm.mainpage_stat_mv_dis.sql:46,62; semantics doc:304-505) expressed over
  * Spark's built-in Datasketches HLL functions. Like the reference's
  * AggregateFunction(uniqCombined, UInt32) column, the state is an opaque
  * mergeable binary; estimates are approximate and deterministic for a given
  * input multiset.
  */
object Sketches {
  /** `uniqCombinedState(c)` → binary sketch column. */
  def hll_state(c: Column, lgK: Int = 12): Column = hll_sketch_agg(c, lit(lgK))

  /** `uniqCombinedMergeState(c)` → merged binary sketch. */
  def hll_merge_state(c: Column): Column = hll_union_agg(c)

  /** Finalize a sketch to its cardinality estimate. */
  def hll_estimate(c: Column): Column = hll_sketch_estimate(c)

  /** One-shot `uniqCombined(c)`. */
  def uniq_combined(c: Column, lgK: Int = 12): Column =
    hll_sketch_estimate(hll_sketch_agg(c, lit(lgK)))
}

/** Exact-median state family — `medianExactState` / `medianExactMerge`
  * (ref dwm.mainpage_stat_mv_dis.sql:83,100,114). Exact medians need every
  * value, so the state is a sorted array column; merge concatenates and
  * re-sorts; finalize interpolates exactly like `percentile(c, 0.5)`.
  * All built-in expressions — stays inside codegen.
  */
object Medians {
  /** Partial state over raw rows: sorted array of values. */
  def median_state(c: Column): Column = sort_array(collect_list(c))

  /** Merge stored array states. */
  def median_merge_state(c: Column): Column = sort_array(flatten(collect_list(c)))

  /** Exact median of a sorted-array state (linear interpolation on even n). */
  def median_finalize(sorted: Column): Column = {
    val n = size(sorted)
    val lo = element_at(sorted, ((n + 1) / 2).cast("int")).cast("double")
    val hi = element_at(sorted, (n / 2 + 1).cast("int")).cast("double")
    when(n === 0, lit(null))
      .otherwise(when(pmod(n, lit(2)) === 1, lo).otherwise((lo + hi) / 2.0))
  }
}
