package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams
import graft.streaming.Streams.{FunnelCompletion, FunnelEvent}

/** Watermarked windows + custom-state streaming operators: batch-mode
  * semantics first (same plan, state scoped to the batch), then the real
  * streaming path with state carried across micro-batches.
  */
class StreamsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def batchEvents = {
    import spark.implicits._
    Seq(
      (1L, "2024-01-01 10:00:05", "view"),
      (1L, "2024-01-01 10:00:30", "click"),
      (1L, "2024-01-01 10:01:10", "purchase"),   // funnel complete at 10:01:10
      (2L, "2024-01-01 10:00:10", "view"),
      (2L, "2024-01-01 10:00:20", "purchase"),   // skipped click -> no completion
      (3L, "2024-01-01 10:30:00", "view"),
      (1L, "2024-01-01 11:00:00", "view"))       // new funnel attempt, incomplete
      .toDF("user_id", "ts_s", "event_type")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"), col("event_type"))
  }

  test("tumbling UV/PV and sessions compute correctly in batch mode") {
    val uvpv = Streams.tumblingUvPv(batchEvents, "ts", "user_id", "1 hour", "10 minutes")
      .orderBy("window_start").collect()
    assert(uvpv.length == 2)
    assert(uvpv(0).getLong(1) == 3L && uvpv(0).getLong(2) == 6L) // hour 10: users 1,2,3
    assert(uvpv(1).getLong(1) == 1L && uvpv(1).getLong(2) == 1L) // hour 11: user 1

    val sess = Streams.sessions(batchEvents, "ts", "user_id", "5 minutes", "10 minutes")
      .orderBy("user_id", "session_start").collect()
    // user 1: one 3-event session at 10:00 + one 1-event session at 11:00;
    // user 2: one 2-event session; user 3: one 1-event session
    assert(sess.map(r => (r.getLong(0), r.getLong(3))).toSeq ==
      Seq((1L, 3L), (1L, 1L), (2L, 2L), (3L, 1L)))
  }

  test("funnel detector emits completions in order, batch mode") {
    import spark.implicits._
    val evs = batchEvents.as[FunnelEvent]
    val hits = Streams.funnelCompletions(evs, Seq("view", "click", "purchase"))
      .collect().sortBy(_.user_id)
    assert(hits.length == 1)
    assert(hits.head.user_id == 1L)
    assert(hits.head.completed_at == ts("2024-01-01 10:01:10"))
    assert(math.abs(hits.head.duration_sec - 65.0) < 1e-9)
  }

  test("streaming dedup drops within-watermark duplicates across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val out = Streams.dedupWithinWatermark(input.toDF(), "ts", "10 minutes", "user_id", "event_type")
    val q = out.writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(
        FunnelEvent(1L, ts("2024-01-01 10:00:00"), "view"),
        FunnelEvent(1L, ts("2024-01-01 10:00:05"), "view"),  // dup within batch
        FunnelEvent(2L, ts("2024-01-01 10:00:10"), "view"))
      q.processAllAvailable()
      input.addData(
        FunnelEvent(1L, ts("2024-01-01 10:01:00"), "view"),  // dup across batches
        FunnelEvent(1L, ts("2024-01-01 10:01:00"), "click")) // new key
      q.processAllAvailable()
      val got = spark.table("dedup_out").as[FunnelEvent].collect()
        .map(e => (e.user_id, e.event_type)).sorted.toSeq
      assert(got == Seq((1L, "click"), (1L, "view"), (2L, "view")))
    } finally q.stop()
  }

  test("funnel state carries across micro-batches (flatMapGroupsWithState)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val out = Streams.funnelCompletions(input.toDS(), Seq("view", "click", "purchase"))
    val q = out.writeStream
      .format("memory").queryName("funnel_out").outputMode("append").start()
    try {
      // batch 1: user 1 views+clicks (no completion yet); user 2 views
      input.addData(
        FunnelEvent(1L, ts("2024-01-01 10:00:05"), "view"),
        FunnelEvent(1L, ts("2024-01-01 10:00:30"), "click"),
        FunnelEvent(2L, ts("2024-01-01 10:00:10"), "view"))
      q.processAllAvailable()
      assert(spark.table("funnel_out").count() == 0)

      // batch 2: user 1 purchases -> completion using state from batch 1
      input.addData(FunnelEvent(1L, ts("2024-01-01 10:05:00"), "purchase"))
      q.processAllAvailable()
      val hits = spark.table("funnel_out").as[FunnelCompletion].collect()
      assert(hits.map(_.user_id).toSeq == Seq(1L))
      assert(math.abs(hits.head.duration_sec - 295.0) < 1e-9)
    } finally q.stop()
  }
}
