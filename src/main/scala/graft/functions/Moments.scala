package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Exact-moment second-order statistics — the corr / covarPop / varPop /
  * stddevPop family computed the shuffle-order-insensitive way.
  *
  * Naive distributed corr/var carries float co-moments that merge in
  * partition order, so the last few bits of the result depend on the
  * physical plan — fine for CH's own contract (see the ChCompat
  * `covarPop`/... registrations, which keep that behavior for dialect
  * queries), useless for a bit-exact correctness gate and for reproducible
  * data-curation thresholds ("drop features with |corr| > 0.99" must not
  * flip with the partition count).
  *
  * This helper instead aggregates RAW moments as exact DECIMAL(38,0)
  * sums over integer-scaled inputs (Σ1, Σx, Σy, Σx², Σy², Σxy — exact
  * under any grouping, any merge order, map-side combine free; products
  * are taken in decimal too, so nothing wraps through Int64, and a sum
  * that exceeds 38 digits surfaces as NULL rather than a silently wrong
  * statistic — Spark's non-ANSI LongType SUM would wrap instead), and
  * combines them into float statistics ONCE per group after aggregation
  * through a fixed IEEE expression tree: every div/mul/sub/sqrt is a
  * single correctly-rounded operation, so the result is bit-identical on
  * any engine that mirrors the tree — the same argument the q108
  * keep-rate gate rests on.
  *
  * Caller contract: `x`/`y` must be integer-valued (cast/scale first —
  * e.g. prices to whole dollars); per-row squares and group sums are kept
  * in 38-digit decimal, far past any realistic Σx² at 100 TB scale.
  * Combination happens in doubles after aggregation.
  */
object Moments {

  /** Group `df` by `groupCols` and attach the six exact raw moments of
    * (x, y): n BIGINT, sx/sy/sxx/syy/sxy DECIMAL(38,0).
    */
  def aggregate(df: DataFrame, groupCols: Seq[String],
      x: Column, y: Column): DataFrame = {
    val xl = x.cast(LongType).cast(DecimalType(38, 0))
    val yl = y.cast(LongType).cast(DecimalType(38, 0))
    df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(xl).as("sx"),
      sum(yl).as("sy"),
      sum(xl * xl).as("sxx"),
      sum(yl * yl).as("syy"),
      sum(xl * yl).as("sxy"))
  }

  private def meanD(s: Column, n: Column): Column =
    s.cast(DoubleType) / n.cast(DoubleType)

  /** Population variance from exact moments: Σx²/n − (Σx/n)². */
  def varPop(sxx: Column, sx: Column, n: Column): Column =
    meanD(sxx, n) - meanD(sx, n) * meanD(sx, n)

  /** Population standard deviation from exact moments. */
  def stddevPop(sxx: Column, sx: Column, n: Column): Column =
    sqrt(varPop(sxx, sx, n))

  /** Population covariance from exact moments: Σxy/n − (Σx/n)(Σy/n). */
  def covarPop(sxy: Column, sx: Column, sy: Column, n: Column): Column =
    meanD(sxy, n) - meanD(sx, n) * meanD(sy, n)

  /** Pearson correlation from exact moments:
    * covarPop / (stddevPop(x) · stddevPop(y)).
    */
  def corr(sxy: Column, sx: Column, sy: Column,
      sxx: Column, syy: Column, n: Column): Column =
    covarPop(sxy, sx, sy, n) /
      (stddevPop(sxx, sx, n) * stddevPop(syy, sy, n))
}
