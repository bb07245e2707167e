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

  /** Watermarked stream-stream interval join: pair each left-stream row
    * with same-key right-stream rows whose event time falls in
    * `[leftTs, leftTs + maxGap]` — e.g. "views joined to the purchases
    * they led to within an hour". Both sides carry watermarks AND the
    * join condition carries the time bound; together they let Spark
    * expire buffered rows on both sides (an unconstrained stream-stream
    * join buffers forever — the unbounded-state trap). State per side is
    * O(rows inside the watermark+gap horizon), independent of stream
    * length.
    *
    * Column names must be disjoint across sides apart from the join keys
    * (pass pre-renamed frames); `keys` maps left column → right column.
    * `maxGap` / watermarks are SQL interval strings ("1 HOUR").
    */
  def intervalJoin(
      left: DataFrame, leftTs: String, leftWatermark: String,
      right: DataFrame, rightTs: String, rightWatermark: String,
      keys: Seq[(String, String)], maxGap: String): DataFrame = {
    require(keys.nonEmpty, "intervalJoin needs at least one key pair")
    val l = left.withWatermark(leftTs, leftWatermark).alias("l")
    val r = right.withWatermark(rightTs, rightWatermark).alias("r")
    val keyCond = keys.map { case (lk, rk) => col(s"l.$lk") === col(s"r.$rk") }
      .reduce(_ && _)
    val timeCond = col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $maxGap")
    // drop the RIGHT key copies by reference — drop-by-name would take
    // the left ones too when a key shares its name across sides
    keys.foldLeft(l.join(r, keyCond && timeCond)) {
      case (df, (_, rk)) => df.drop(col(s"r.$rk"))
    }
  }

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
  final case class EnrichInput(
      key: Long, ts: Timestamp, is_right: Boolean, value: String)
  final case class DimVersion(tsMs: Long, value: String)
  final case class Enriched(
      key: Long, ts: Timestamp, value: String,
      matched_value: Option[String], matched_ts: Option[Timestamp])

  /** Streaming ASOF enrichment — the streaming twin of
    * [[graft.operators.AsOfJoin]], and the event-time-versioned form of the
    * dictionary refresh cycle (ST4): right-side rows are versioned dim
    * updates, left-side rows are facts, and each fact is enriched with the
    * LATEST dim version at-or-before its event time seen so far.
    *
    * Union both streams into [[EnrichInput]] (`is_right` = dim update).
    * Per-key state is ONE (ts, value) pair — the newest dim version —
    * so state is O(keys) like a broadcast dictionary, not O(history).
    * Within a batch, events apply in (ts, right-before-left) order, so
    * in-batch reordering is handled exactly; across batches a dim update
    * that arrives AFTER a fact it should have enriched cannot rewrite the
    * already-emitted fact (append semantics — the MV/merge-on-read path is
    * the tool when late dims must reconcile).
    */
  def asofEnrich(input: Dataset[EnrichInput]): Dataset[Enriched] = {
    import input.sparkSession.implicits._
    input
      .groupByKey(_.key)
      .flatMapGroupsWithState[DimVersion, Enriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[EnrichInput], state: GroupState[DimVersion]) =>
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Enriched]
          // right rows sort before left rows at equal ts (inclusive <=
          // matching, same tie rule as the batch operator)
          it.toSeq.sortBy(e => (e.ts.getTime, e.is_right != true)).foreach { e =>
            if (e.is_right) {
              if (st == null || e.ts.getTime >= st.tsMs) st = DimVersion(e.ts.getTime, e.value)
            } else {
              val m = Option(st).filter(_.tsMs <= e.ts.getTime)
              out += Enriched(key, e.ts, e.value,
                m.map(_.value), m.map(v => new Timestamp(v.tsMs)))
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

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
