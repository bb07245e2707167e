package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization — split each key's event stream into sessions separated
  * by inactivity gaps longer than `gapSeconds` (the standard web-analytics
  * session definition, and the batch twin of Spark's streaming
  * `session_window`).
  *
  * Shape: one shuffle of the input (window partitioning by key), one
  * within-partition sort; the session index is a running sum over the
  * session-start flags, so no self-join, no iteration, and the whole pass
  * is a single WindowExec. Session boundaries depend only on the multiset
  * of timestamps per key (ties contribute a zero gap regardless of their
  * relative order), so the assignment is deterministic even with duplicate
  * timestamps.
  *
  * At 100 TB: sessions are per-user computations — the shuffle is keyed by
  * user, sorts are per-partition and spillable, and no state outlives the
  * window pass. The streaming counterpart (`session_window` +
  * watermark) shares the gap semantics; SessionizeSpec asserts the two
  * agree on the same input.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per-key session index) to every row.
    * Rows with a null timestamp are dropped (no position in event time).
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    val byTs = Window.partitionBy(keyCol).orderBy(col(tsCol).asc)
    val prev = lag(col(tsCol), 1).over(byTs)
    // integer micros, not a double cast: the gap comparison must be exact
    // at the boundary (a double roundoff could flip `> gap` for a diff of
    // exactly gap seconds). NTZ→timestamp is identity under the UTC session
    // timezone used throughout.
    def micros(c: Column) = unix_micros(c.cast("timestamp"))
    val isStart = when(prev.isNull ||
      micros(col(tsCol)) - micros(prev) > gapSeconds * 1000000L, 1).otherwise(0)
    df.filter(col(tsCol).isNotNull)
      .withColumn("session_seq",
        sum(isStart).over(byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session summary: (key, session_seq, session_start, session_end,
    * n_events, plus caller aggregates) — the usual next step after
    * assignment, and the output shape comparable with streaming
    * `session_window` results.
    */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, extra: Seq[Column] = Nil): DataFrame = {
    val aggs = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events")) ++ extra
    sessionize(df, keyCol, tsCol, gapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
