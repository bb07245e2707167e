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

  test("stream-stream interval join pairs within the gap across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val views = MemoryStream[FunnelEvent]
    val buys = MemoryStream[FunnelEvent]
    val out = Streams.intervalJoin(
      views.toDF().select(col("user_id"), col("ts").as("view_ts")),
      "view_ts", "10 minutes",
      buys.toDF().select(col("user_id").as("buy_user"), col("ts").as("buy_ts")),
      "buy_ts", "10 minutes",
      keys = Seq("user_id" -> "buy_user"), maxGap = "1 HOUR")
    val q = out.writeStream
      .format("memory").queryName("ij_out").outputMode("append").start()
    try {
      views.addData(
        FunnelEvent(1L, ts("2024-01-01 10:00:00"), "view"),
        FunnelEvent(2L, ts("2024-01-01 10:05:00"), "view"))
      q.processAllAvailable()
      buys.addData(
        FunnelEvent(1L, ts("2024-01-01 10:30:00"), "buy"),   // in gap (batch 2 vs batch-1 view)
        FunnelEvent(1L, ts("2024-01-01 11:30:00"), "buy"),   // outside the 1h gap
        FunnelEvent(2L, ts("2024-01-01 10:04:00"), "buy"),   // before the view
        FunnelEvent(3L, ts("2024-01-01 10:10:00"), "buy"))   // no matching view
      q.processAllAvailable()
      val got = spark.table("ij_out")
        .select(col("user_id"), col("view_ts"), col("buy_ts")).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      assert(got == Set((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"))))
      // schema: right key copy dropped, left key kept once
      assert(spark.table("ij_out").columns.toSeq == Seq("user_id", "view_ts", "buy_ts"))
    } finally q.stop()
  }

  test("sequenceMatch/windowFunnel run as streaming aggregations across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    graft.functions.ChCompat.register(spark)
    val input = MemoryStream[FunnelEvent]
    input.toDF().createOrReplaceTempView("seq_stream")
    // complete mode: the TypedImperativeAggregate states live in the state
    // store and must merge correctly across micro-batches
    val q = spark.sql(
      """SELECT user_id,
        |  sequenceMatch('(?1).*(?2)', ts, event_type = 'view', event_type = 'buy') AS m,
        |  windowFunnel(ts, 3600, event_type = 'view', event_type = 'buy') AS lvl
        |FROM seq_stream GROUP BY user_id""".stripMargin)
      .writeStream.format("memory").queryName("seq_stream_out")
      .outputMode("complete").start()
    try {
      // batch 1: user 1 views; user 2 buys (no view yet)
      input.addData(
        FunnelEvent(1L, ts("2024-01-01 10:00:00"), "view"),
        FunnelEvent(2L, ts("2024-01-01 10:00:00"), "buy"))
      q.processAllAvailable()
      val mid = spark.table("seq_stream_out").as[(Long, Boolean, Int)].collect()
        .map { case (k, b, l) => k -> ((b, l)) }.toMap
      assert(mid == Map(1L -> ((false, 1)), 2L -> ((false, 0))))
      // batch 2: user 1 buys -> chain completes USING batch-1 state
      input.addData(FunnelEvent(1L, ts("2024-01-01 10:30:00"), "buy"))
      q.processAllAvailable()
      val fin = spark.table("seq_stream_out").as[(Long, Boolean, Int)].collect()
        .map { case (k, b, l) => k -> ((b, l)) }.toMap
      assert(fin == Map(1L -> ((true, 2)), 2L -> ((false, 0))))
    } finally q.stop()
  }

  test("statistical aggregates run as streaming aggregations across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    graft.functions.ChCompat.register(spark)
    val input = MemoryStream[FunnelEvent]
    input.toDF().createOrReplaceTempView("stat_stream")
    // the round-8 TypedImperativeAggregates must serialize/merge through
    // the state store exactly like their batch selves
    val q = spark.sql(
      """SELECT user_id,
        |  entropy(event_type) AS h,
        |  quantileExactWeighted(unix_timestamp(ts) % 100, 1, 0.5D) AS wq,
        |  intervalLengthSum(unix_timestamp(ts) % 100,
        |                    unix_timestamp(ts) % 100 + 2) AS il,
        |  deltaSumTimestamp(unix_timestamp(ts) % 100, ts) AS ds
        |FROM stat_stream GROUP BY user_id""".stripMargin)
      .writeStream.format("memory").queryName("stat_stream_out")
      .outputMode("complete").start()
    try {
      input.addData(
        FunnelEvent(1L, ts("2024-01-01 10:00:10"), "view"),
        FunnelEvent(1L, ts("2024-01-01 10:00:20"), "view"))
      q.processAllAvailable()
      input.addData(
        FunnelEvent(1L, ts("2024-01-01 10:00:30"), "buy"),
        FunnelEvent(1L, ts("2024-01-01 10:00:40"), "buy"))
      q.processAllAvailable()
      val rows = spark.table("stat_stream_out").collect()
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getDouble(1) == 1.0, "2x view + 2x buy = 1 bit")
      // ts%100 values: 10,20,30,40 -> weighted(=1) median 20; union of
      // [v, v+2] intervals = 8; deltas in ts order all +10 -> 30
      assert(r.getLong(2) == 20L)
      assert(r.getLong(3) == 8L)
      assert(r.getDouble(4) == 30.0)
      // the streamed result equals the one-shot batch aggregate
      val batch = spark.sql(
        """SELECT entropy(event_type) h FROM (
          |  SELECT 'view' event_type UNION ALL SELECT 'view'
          |  UNION ALL SELECT 'buy' UNION ALL SELECT 'buy')""".stripMargin)
        .head().getDouble(0)
      assert(batch == r.getDouble(1))
    } finally q.stop()
  }

  test("streaming asof enrichment: dim versions carry across batches") {
    import spark.implicits._
    import graft.streaming.Streams.{EnrichInput, Enriched}
    implicit val sc = spark.sqlContext
    val input = MemoryStream[EnrichInput]
    val q = Streams.asofEnrich(input.toDS()).writeStream
      .format("memory").queryName("asof_out").outputMode("append").start()
    try {
      // batch 1: dim v1 at 10:00, fact at 10:05 (-> v1), fact at 09:00
      // (before any dim -> unmatched), dim+fact at the same ts (inclusive)
      input.addData(
        EnrichInput(1L, ts("2024-01-01 10:00:00"), is_right = true, "v1"),
        EnrichInput(1L, ts("2024-01-01 10:05:00"), is_right = false, "f1"),
        EnrichInput(1L, ts("2024-01-01 09:00:00"), is_right = false, "f0"),
        EnrichInput(2L, ts("2024-01-01 08:00:00"), is_right = true, "w1"),
        EnrichInput(2L, ts("2024-01-01 08:00:00"), is_right = false, "g1"))
      q.processAllAvailable()
      // batch 2: facts enrich from batch-1 state; then dim v2 upgrades
      // later facts within the same batch
      input.addData(
        EnrichInput(1L, ts("2024-01-01 10:10:00"), is_right = false, "f2"),
        EnrichInput(1L, ts("2024-01-01 10:20:00"), is_right = true, "v2"),
        EnrichInput(1L, ts("2024-01-01 10:30:00"), is_right = false, "f3"))
      q.processAllAvailable()
      val got = spark.table("asof_out").as[Enriched].collect()
        .map(e => (e.key, e.value, e.matched_value)).toSet
      assert(got == Set(
        (1L, "f0", None),          // before any dim version
        (1L, "f1", Some("v1")),
        (2L, "g1", Some("w1")),    // same-ts dim matches (inclusive)
        (1L, "f2", Some("v1")),    // state from batch 1
        (1L, "f3", Some("v2"))))   // in-batch upgrade
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
