package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Range joins: the binned equi-join rewrites must return EXACTLY the
  * naive theta-join's pairs (each once), across bin widths that slice
  * intervals into 1..many bins, and must plan as hash joins — the whole
  * point is never running the O(n·m) nested loop.
  */
class RangeJoinSpec extends SparkSpec {

  private def fixtures = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = Seq.tabulate(300) { i =>
      (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong)
    }.toDF("pid", "key", "p")
    val intervals = Seq.tabulate(120) { i =>
      val lo = rnd.nextInt(1000).toLong
      // spans 0 (empty), tiny, and many-bin wide
      val hi = lo + (rnd.nextInt(4) match {
        case 0 => 0L
        case 1 => rnd.nextInt(5).toLong
        case 2 => rnd.nextInt(60).toLong
        case _ => rnd.nextInt(400).toLong
      })
      (i.toLong, s"k${rnd.nextInt(5)}", lo, hi)
    }.toDF("iid", "key", "lo", "hi")
    (points, intervals)
  }

  test("pointInInterval == naive theta join, each pair exactly once, any bin width") {
    val (points, intervals) = fixtures
    val naive = points.join(intervals.withColumnRenamed("key", "k2"),
        col("key") === col("k2") && col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(naive.nonEmpty && naive.size == naive.distinct.size)
    for (binWidth <- Seq(1L, 7L, 100L, 5000L)) {
      val got = RangeJoin.pointInInterval(points, intervals,
          Seq("key"), "p", "lo", "hi", binWidth)
        .select("pid", "iid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size == got.distinct.size, s"binWidth=$binWidth emitted duplicates")
      assert(got.toSet == naive.toSet, s"binWidth=$binWidth: pairs differ from naive")
    }
  }

  test("intervalOverlap == naive overlap join, each pair exactly once, any bin width") {
    val (_, intervals) = fixtures
    val left = intervals.select(col("iid").as("lid"), col("key"),
      col("lo").as("llo"), col("hi").as("lhi"))
    val right = intervals.select(col("iid").as("rid"), col("key").as("k2"),
      (col("lo") + 13).as("rlo"), (col("hi") + 13).as("rhi"))
    // the two-clause predicate only equals true half-open overlap for
    // NONEMPTY intervals — an empty [x, x) overlaps nothing
    val naive = left.join(right,
        col("key") === col("k2") &&
          col("llo") < col("lhi") && col("rlo") < col("rhi") &&
          col("llo") < col("rhi") && col("rlo") < col("lhi"))
      .select("lid", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(naive.nonEmpty && naive.size == naive.distinct.size)
    for (binWidth <- Seq(1L, 7L, 100L, 5000L)) {
      val got = RangeJoin.intervalOverlap(left,
          right.withColumnRenamed("k2", "key"),
          Seq("key"), "llo", "lhi", "rlo", "rhi", binWidth)
        .select("lid", "rid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size == got.distinct.size, s"binWidth=$binWidth emitted duplicates")
      assert(got.toSet == naive.toSet, s"binWidth=$binWidth: pairs differ from naive")
    }
  }

  test("pathological interval spans fail fast instead of exploding the build side") {
    import spark.implicits._
    val points = Seq((1L, "k", 5L)).toDF("pid", "key", "p")
    val bad = Seq((1L, "k", 0L, Long.MaxValue / 2)).toDF("iid", "key", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, bad, Seq("key"), "p", "lo", "hi", 1L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("raise binWidth")), s"unexpected error: $e")
  }

  test("plan: the bin rewrite is an equi-join — no nested loop, no cartesian") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val (points, intervals) = fixtures
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = RangeJoin.pointInInterval(points, intervals,
        Seq("key"), "p", "lo", "hi", 100L).queryExecution.executedPlan
      assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
        s"range join degraded to a nested loop:\n$plan")
      assert(plan.collect { case j: CartesianProductExec => j }.isEmpty)
      assert(plan.toString.contains("Join"), "expected a join in the plan")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }
}
