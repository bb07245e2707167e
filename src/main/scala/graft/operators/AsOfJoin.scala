package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASOF join — for each left row, the single best-matching right row by
  * event time on the same key: the latest right row at-or-before the left
  * row's time (backward, the default), or the earliest at-or-after
  * (forward). ClickHouse exposes this as `ASOF JOIN` (a join with one
  * inequality condition resolved to the closest match); Spark has no native
  * operator, but the semantics compose from a tagged union + one window
  * pass, so no custom physical plan is needed.
  *
  * Formulation: tag both inputs, union them, and run ONE window over each
  * key partition ordered by (ts, tag) that carries the last right-side
  * payload seen; left rows then read their match from the carried value.
  * This is a sort-merge within each key partition: exactly one shuffle of
  * each input (the window's hash partitioning on the key), no
  * point-in-interval row explosion, no per-key collect. At 100 TB this is
  * the plan you'd hand-build — co-partition both sides by key, sort within
  * partition, single forward scan — and it inherits Spark's spillable
  * window sort, so a hot key degrades to disk sort, not OOM.
  *
  * Matching rules:
  *   - equal timestamps match (CH ASOF `<=`/`>=` semantics); pass
  *     `strict = true` for `<`/`>`;
  *   - if several right rows share (key, ts), the greatest payload struct
  *     wins (a total, deterministic tie-break — pre-aggregate the right
  *     side to unique (key, ts) if that choice matters);
  *   - `toleranceSeconds` (pandas merge_asof-style) null-outs matches
  *     farther than the bound from the left timestamp;
  *   - null keys and null timestamps never match, on either side (DuckDB
  *     ASOF semantics): a null-ts left row gets no match, a null-ts right
  *     row is ignored.
  */
object AsOfJoin {

  /** Left-outer ASOF join. `keys` must exist in both inputs with identical
    * names; every non-key right column (including `rightTs`) is appended to
    * the left row, so right payload names must not collide with left names
    * (rename before joining).
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      forward: Boolean = false,
      strict: Boolean = false,
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asof: at least one key column")
    val payload = right.columns.filterNot(keys.contains).toSeq
    require(payload.contains(rightTs), s"asof: right is missing ts column $rightTs")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"asof: right payload columns collide with left: ${collisions.mkString(", ")}")

    val lStructT = left.select(struct(left.columns.toSeq.map(col): _*).as("s")).schema("s").dataType
    val rStructT = right.select(struct(payload.map(col): _*).as("s")).schema("s").dataType

    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__tag"),
        struct(left.columns.toSeq.map(col): _*).as("__l"),
        lit(null).cast(rStructT).as("__r")): _*)
    // A null-ts right row has no position on the time axis: DuckDB ASOF
    // (the oracle) and the null-key rule below both treat null ordering
    // values as unmatchable, so drop them before the window — otherwise
    // NULLS FIRST ordering would carry their payload to every left row
    // that lacks a real match.
    val r = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__tag"),
        lit(null).cast(lStructT).as("__l"),
        struct(payload.map(col): _*).as("__r")): _*)

    // Forward mode scans time backwards (desc), so "preceding rows" are the
    // at-or-after candidates. Within a timestamp tie-group the right rows
    // (tag 0) must sort BEFORE the left rows for inclusive matching — so
    // `last` sees them — and AFTER for strict; that choice is independent
    // of scan direction.
    val tsOrd = if (forward) col("__ts").desc else col("__ts").asc
    val tagOrd = if (strict) col("__tag").desc else col("__tag").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrd, tagOrd, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // NULL keys and a NULL left timestamp must not match: the window
    // PARTITIONS nulls together (so a null-key left row would see null-key
    // right rows) and orders null ts deterministically (so a null-ts left
    // row would see some right row), but join semantics — and DuckDB's
    // ASOF oracle — treat null keys/ordering values as unmatched.
    val matchable =
      (keys.map(col(_).isNotNull) :+ col("__ts").isNotNull).reduce(_ && _)
    val matchedRaw = last(col("__r"), ignoreNulls = true).over(w)
    // timestamp/date axes don't cast to DOUBLE directly (TIMESTAMP_NTZ
    // rejects the cast outright) — route them through unix_micros; the
    // session-TZ interpretation cancels in the difference (UTC sessions
    // always; DST-TZ sessions only off across a transition).
    def seconds(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType |
             org.apache.spark.sql.types.DateType =>
          (unix_micros(c.cast("timestamp")).cast("double")) / lit(1e6)
        case _ => c.cast("double")
      }
    val matched = toleranceSeconds match {
      case None => when(matchable, matchedRaw)
      case Some(tol) =>
        val unionTsType = l.unionByName(r).schema("__ts").dataType
        val gap = abs(seconds(col("__ts"), unionTsType) -
          seconds(matchedRaw.getField(rightTs), right.schema(rightTs).dataType))
        when(matchable && gap <= tol, matchedRaw)
    }

    val out = l.unionByName(r)
      .withColumn("__m", matched)
      .filter(col("__tag") === 1)
    out.select(
      left.columns.toSeq.map(c => col(s"__l.$c").as(c)) ++
        payload.map(p => col(s"__m.$p").as(p)): _*)
  }

  /** Convenience: most recent right row at-or-before each left row. */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame =
    asof(left, right, keys, leftTs, rightTs)

  /** Convenience: earliest right row at-or-after each left row. */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame =
    asof(left, right, keys, leftTs, rightTs, forward = true)
}
