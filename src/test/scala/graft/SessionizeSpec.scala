package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Sessionize

/** Sessionize: gap-split assignment verified against a brute-force scan,
  * determinism under timestamp ties, and agreement with Spark's streaming
  * `session_window` (same gap semantics) on the same input.
  */
class SessionizeSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  test("hand-crafted: gap starts a new session, boundary gap does not") {
    val df = Seq(
      (1L, ts(0)), (1L, ts(100)), (1L, ts(1900)),   // gap 1800 == limit: same session
      (1L, ts(3701)),                                // gap 1801 > limit: new session
      (2L, ts(50))
    ).toDF("user_id", "t")
    val got = Sessionize.sessionize(df, "user_id", "t", gapSeconds = 1800L)
      .select($"user_id", $"t", $"session_seq".cast("long"))
      .as[(Long, Timestamp, Long)].collect().toSet
    assert(got == Set(
      (1L, ts(0), 1L), (1L, ts(100), 1L), (1L, ts(1900), 1L),
      (1L, ts(3701), 2L), (2L, ts(50), 1L)))
  }

  test("seeded random: session stats match brute-force scan") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((rnd.nextInt(5).toLong, rnd.nextInt(100000).toLong))
    val gap = 900L
    // brute: per key, sort ts, split on gap, collect (key, seq, start, end, n)
    val exp = rows.groupBy(_._1).flatMap { case (k, kr) =>
      val sorted = kr.map(_._2).sorted
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, t) =>
        if (t - acc.head.head > gap) List(t) :: acc
        else (t :: acc.head) :: acc.tail
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (s, i) =>
        (k, (i + 1).toLong, s.head, s.last, s.size.toLong)
      }
    }.toSet
    val df = rows.map { case (k, t) => (k, ts(t)) }.toDF("k", "t")
    val got = Sessionize.sessionStats(df, "k", "t", gap)
      .select($"k", $"session_seq".cast("long"),
        unix_timestamp($"session_start"), unix_timestamp($"session_end"), $"n_events")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == exp)
  }

  test("agrees with streaming session_window on the same events") {
    val gap = 600L
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((rnd.nextInt(4).toLong, rnd.nextInt(20000).toLong))
    val df = rows.map { case (k, t) => (k, ts(t)) }.toDF("k", "t")

    // batch twin via session_window (shares the streaming implementation's
    // gap semantics): (k, window start/end, count)
    val viaWindow = df.groupBy(session_window($"t", s"$gap seconds"), $"k")
      .agg(count(lit(1)).as("n"))
      .select($"k", unix_timestamp($"session_window.start"), $"n")
      .as[(Long, Long, Long)].collect().toSet

    val viaSessionize = Sessionize.sessionStats(df, "k", "t", gap)
      .select($"k", unix_timestamp($"session_start"), $"n_events")
      .as[(Long, Long, Long)].collect().toSet

    // session_window's end is exclusive (last_ts + gap) but starts and
    // counts must agree exactly with the gap-split definition
    assert(viaWindow == viaSessionize)

    // and the real streaming path agrees: append mode emits a session only
    // once the watermark passes its end, so a far-future sentinel batch
    // (filtered from the assertion) flushes the real sessions
    val dir = tmpDir("sessionize-stream")
    df.write.parquet(s"$dir/in")
    val sdf = spark.readStream.schema(df.schema).parquet(s"$dir/in")
    val q = sdf.withWatermark("t", "0 seconds")
      .groupBy(session_window($"t", s"$gap seconds"), $"k")
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("sess_mem")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    Seq((999L, ts(10000000L))).toDF("k", "t").write.mode("append").parquet(s"$dir/in")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_mem")
      .filter($"k" =!= 999L)
      .select($"k", unix_timestamp($"session_window.start"), $"n")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == viaSessionize)
  }
}
