package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ClickHouse ANY-strictness joins (CH docs: JOIN strictness `ANY`; ref
  * doc's join-dialect surface): the multi-row side contributes AT MOST ONE
  * row per key tuple. ClickHouse picks an *arbitrary* matching row; a
  * distributed re-run must not reshuffle results, so this implementation
  * makes the pick deterministic — the row whose non-key column tuple is
  * lexicographically smallest (in the frame's column order). That choice
  * is a function of the data alone, reproducible across runs, partitions,
  * and engines (the DuckDB oracle mirrors it with a ROW_NUMBER pick).
  *
  * Shape at scale: the reduction is `min(struct(...))` under a groupBy —
  * map-side combine absorbs hot keys, the exchange carries one row per
  * (partition, key), and no per-key window funnels a popular key through
  * a single task. The join that follows is a plain equi-join Catalyst is
  * free to broadcast or shuffle as sizes dictate.
  */
object AnyJoin {

  /** One deterministic row per key tuple: for each key, keep the row with
    * the smallest non-key tuple (struct comparison = lexicographic over
    * the frame's column order, ascending, NULLS FIRST — Spark's struct
    * ordering). Column order out: keys, then the remaining columns in
    * frame order.
    *
    * SQL mirrors must match the null order explicitly: a plain
    * `ROW_NUMBER() OVER (ORDER BY c1, c2, ...)` defaults to NULLS LAST in
    * DuckDB/Postgres and would pick a different row when a smallest-tuple
    * candidate carries a NULL — write `ORDER BY c1 NULLS FIRST, ...` (the
    * q88 oracle's columns are non-null, so it is unaffected).
    */
  def firstRowPerKey(df: DataFrame, keys: Seq[String]): DataFrame = {
    val nonKeys = df.columns.filterNot(c => keys.exists(_.equalsIgnoreCase(c))).toSeq
    require(nonKeys.nonEmpty,
      s"AnyJoin: every column of the deduplicated side is a key (${keys.mkString(", ")}); " +
        "use DISTINCT instead")
    df.groupBy(keys.map(col): _*)
      .agg(min(struct(nonKeys.map(col): _*)).as("__any_row"))
      .select(keys.map(col) ++ nonKeys.map(c => col("__any_row").getField(c).as(c)): _*)
  }

  /** `LEFT ANY JOIN`: every left row, joined to at most one right row. */
  def anyLeft(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(firstRowPerKey(right, keys), keys, "left_outer")

  /** `INNER ANY JOIN` (CH's bare `ANY JOIN`): left rows with a match,
    * each matched once.
    */
  def anyInner(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(firstRowPerKey(right, keys), keys, "inner")

  /** `RIGHT ANY JOIN`: every right row, joined to at most one left row. */
  def anyRight(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    firstRowPerKey(left, keys).join(right, keys, "right_outer")
}
