package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Range joins that scale: the naive formulation (`p >= lo AND p < hi` as
  * a join condition) plans as a broadcast-nested-loop / cartesian — the
  * O(n·m) shape that dies at 100 TB. These rewrite the range predicate as
  * a plain EQUI-join on fixed-width bins plus a residual filter, so
  * Catalyst gets a shuffled/broadcast hash join keyed on
  * (keys..., bin) and the range check only runs on bin-collocated pairs.
  *
  * Domain is numeric (epoch seconds, days, any monotone long). Bin width
  * trades the interval explode factor (ceil(span/binWidth) + 1 rows per
  * interval) against join selectivity — pick it near the TYPICAL interval
  * span so most intervals explode to 1-2 bins.
  */
object RangeJoin {

  /** Hard ceiling on bins per interval: an interval spanning millions of
    * bins (corrupt bound, wrong unit, wrong binWidth) would explode the
    * build side into OOM territory — fail the TASK with a clear message
    * instead. Raise binWidth (or split pathological intervals upstream)
    * when this trips.
    */
  val MaxBinsPerInterval = 100000L

  private def bins(lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column,
      binWidth: Long) = {
    val first = floor(lo / binWidth).cast(LongType)
    val last = floor((hi - 1) / binWidth).cast(LongType)
    explode(sequence(first,
      when(last - first < MaxBinsPerInterval, last)
        .otherwise(raise_error(concat(lit(
          s"range join: interval spans more than $MaxBinsPerInterval bins of $binWidth ("),
          lo, lit(".."), hi, lit(") — raise binWidth"))))))
  }

  /** Point-in-interval: rows of `points` matched to every `intervals` row
    * with the same `keys` and `lo <= point < hi`. Each interval explodes
    * to the bins it covers; a point lives in exactly ONE bin, so each
    * matching pair surfaces exactly once — no dedup pass. Intervals with
    * `hi <= lo` are empty and dropped.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__bin", bins(col(loCol), col(hiCol), binWidth))
    points
      .withColumn("__bin", floor(col(pointCol) / binWidth).cast(LongType))
      .join(binned, keys :+ "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap: pairs of (left, right) rows with the same `keys`
    * whose half-open ranges intersect. Both sides explode to bins; a pair
    * shares ceil(overlap-span/binWidth)-ish bins, so the join would emit
    * it once per shared bin — the canonical-bin trick keeps exactly the
    * FIRST shared bin (the bin of `greatest(lo1, lo2)`), making each pair
    * surface once without a distinct. Column names must be disjoint
    * across the two sides (standard join hygiene).
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftLo: String, leftHi: String,
      rightLo: String, rightHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame = df
      .filter(col(hi) > col(lo))
      .withColumn("__bin", bins(col(lo), col(hi), binWidth))
    binned(left, leftLo, leftHi)
      .join(binned(right, rightLo, rightHi), keys :+ "__bin")
      .filter(col(leftLo) < col(rightHi) && col(rightLo) < col(leftHi))
      // emit each overlapping pair exactly once: only in the first bin
      // both sides share, which is the bin of the later interval start
      .filter(col("__bin") ===
        floor(greatest(col(leftLo), col(rightLo)) / binWidth).cast(LongType))
      .drop("__bin")
  }
}
