package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operators beyond the reference's micro-batch MV path
  * (SURVEY.md §2.8 covers that path; this module is the bounded-state
  * complement).
  *
  * The MV/StateTable pipeline deliberately has NO watermark: late rows are
  * accepted forever and merge-on-read reconciles (the reference's
  * AggregatingMergeTree semantics). These operators make the opposite
  * trade — watermarked windows and timeout-driven state so executor state
  * stays bounded on unbounded streams:
  *
  *  - [[tumblingUvPv]] — watermarked tumbling-window UV/PV, the streaming
  *    form of the hourly rollup (ref dwm.mainpage_stat_mv_dis.sql:60-70);
  *  - [[sessions]] — gap-based session windows (`session_window`), the
  *    standard sessionization shape for training-data pipelines;
  *  - [[funnelCompletions]] — `flatMapGroupsWithState` with per-user
  *    custom state: the streaming twin of the bitmap funnel
  *    (ref doc:1207-1238) that emits the moment a user completes the step
  *    sequence instead of intersecting bitmaps after the fact.
  *
  * All three run identically on a batch DataFrame (Spark executes the same
  * plan with state scoped to the batch), which is how the specs verify
  * semantics before exercising the streaming path.
  */
object Streams {

  /** Watermarked tumbling UV/PV per window and extra key columns.
    * State bound = windows newer than the watermark; late rows beyond
    * `watermark` are dropped (vs. the MV path, which accepts them).
    */
  def tumblingUvPv(
      events: DataFrame, tsCol: String, userCol: String,
      windowDur: String, watermark: String, keyCols: String*): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur) +: keyCols.map(col): _*)
      .agg(approx_count_distinct(col(userCol)).as("uv"), count(lit(1)).as("pv"))
      .select(col("window.start").as("window_start") +: keyCols.map(col) :+
        col("uv") :+ col("pv"): _*)

  /** Gap-based user sessions via `session_window`: a session closes after
    * `gap` of inactivity; the watermark closes sessions whose end has
    * passed it.
    */
  def sessions(
      events: DataFrame, tsCol: String, userCol: String,
      gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("events"))
      .select(col(userCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("events"))

  /** Streaming exact dedup: keep the first row per key, with state
    * bounded by the watermark (duplicates are only guaranteed dropped if
    * they arrive within `watermark` of the original — the bounded-state
    * version of [[graft.dedup.Dedup.exact]]'s batch semantics).
    */
  def dedupWithinWatermark(
      events: DataFrame, tsCol: String, watermark: String,
      firstKeyCol: String, restKeyCols: String*): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(firstKeyCol, restKeyCols: _*)

  final case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class FunnelProgress(stage: Int, startedAtMs: Long)
  final case class FunnelCompletion(
      user_id: Long, completed_at: Timestamp, duration_sec: Double)

  /** Emit a row the moment a user's events complete `steps` in order
    * (repeats and interleaved other events allowed; progress then resets).
    * Per-user state is one (stage, startedAt) pair — O(users) state total,
    * carried across micro-batches by `flatMapGroupsWithState`.
    *
    * Within a batch, events are ordered by event time before applying the
    * state machine, so out-of-order arrivals INSIDE a batch are handled;
    * across batches ordering is the stream's responsibility (use a
    * watermark + delayed trigger upstream if cross-batch reorder matters).
    */
  def funnelCompletions(
      events: Dataset[FunnelEvent],
      steps: Seq[String]): Dataset[FunnelCompletion] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelCompletion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelProgress]) =>
          var st = state.getOption.getOrElse(FunnelProgress(0, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelCompletion]
          it.toSeq.sortBy(_.ts.getTime).foreach { ev =>
            if (ev.event_type == steps(st.stage)) {
              val started = if (st.stage == 0) ev.ts.getTime else st.startedAtMs
              if (st.stage == steps.length - 1) {
                out += FunnelCompletion(uid, ev.ts, (ev.ts.getTime - started) / 1000.0)
                st = FunnelProgress(0, 0L)
              } else st = FunnelProgress(st.stage + 1, started)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
