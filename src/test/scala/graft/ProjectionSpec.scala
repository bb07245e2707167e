package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mv._

/** [[graft.mv.Projection]] / [[graft.mv.ProjectionRewrite]] — the CH
  * PROJECTION analog: automatic routing of matching aggregates onto a state
  * table. Each test pins BOTH faces: the plan (routed = state path scanned,
  * raw path absent; declined = untouched) and the values (routing must be
  * invisible — routed results equal the raw computation exactly).
  */
class ProjectionSpec extends SparkSpec {

  // own scratch source so no other suite's tables can match (and vice versa)
  private lazy val srcPath = {
    val p = tmpDir("proj-src") + "/ev"
    val rows = (0 until 4000).map { i =>
      val day = 1 + i % 7 // 2024-02-01 .. 2024-02-07
      val ts =
        if (i % 997 == 0) null // null-ts rows: the null day group must route too
        else Timestamp.valueOf(f"2024-02-0$day ${i % 24}%02d:03:00")
      (i.toLong, ts, (i % 53).toLong, Seq("view", "click", "buy")(i % 3), i * 0.25)
    }
    import spark.implicits._
    rows.toDF("id", "ts", "uid", "kind", "v").write.parquet(p)
    p
  }

  private def source: DataFrame =
    spark.read.parquet(srcPath).withColumn("day", to_date(col("ts")))

  private def dec(c: Column) = c.cast(DecimalType(18, 2))

  private val defs: Seq[(String, Column)] = Seq(
    "cnt" -> count(lit(1)),
    "v_sum" -> sum(dec(col("v"))),
    "uv" -> count_distinct(col("uid")),
    "v_min" -> min(col("v")),
    "v_max" -> max(col("v")))

  /** Fresh state table over `source` at (day, kind), ingested in three
    * appends (so merge across parts is exercised), projection registered.
    */
  private def registered(): StateTable = {
    val st = new StateTable(spark, tmpDir("proj-st") + "/st",
      keys = Seq("day", "kind"), partitionCol = "day",
      metrics = Seq(
        CountMetric("cnt"),
        SumMetric("v_sum", dec(col("v"))),
        BitmapUvMetric("uv", col("uid")),
        MinMetric("v_min", col("v")),
        MaxMetric("v_max", col("v"))))
    for (i <- 0 until 3)
      st.appendBatch(source.filter(pmod(col("id"), lit(3)) === i))
    Projection.register(spark, st, source, defs)
    st
  }

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString
  private def routed(df: DataFrame): Boolean = {
    val p = planOf(df)
    p.contains("proj-st") && !p.contains("proj-src")
  }

  /** Run `body` with a registered projection, always deregistering after. */
  private def withProjection[A](body: StateTable => A): A = {
    val st = registered()
    try body(st) finally Projection.deregister(spark, st)
  }

  /** `mk()` must route under the projection and produce exactly the rows
    * the raw plan produces once the projection is deregistered.
    */
  private def assertRoutedAndEqual(st: StateTable, mk: () => DataFrame): Unit = {
    val viaStates = mk()
    assert(routed(viaStates), s"expected routing; plan:\n${planOf(viaStates)}")
    val got = viaStates.collect().map(_.toString)
    Projection.deregister(spark, st)
    val direct = mk()
    assert(!routed(direct))
    val exp = direct.collect().map(_.toString)
    Projection.register(spark, st, source, defs) // restore for the caller
    assert(got.sameElements(exp),
      s"routed != raw\nrouted: ${got.take(3).mkString("; ")}\nraw:    ${exp.take(3).mkString("; ")}")
  }

  test("routes the full metric battery and matches raw, across merged parts") {
    withProjection { st =>
      assertRoutedAndEqual(st, () =>
        source.groupBy("day", "kind").agg(
          count(lit(1)).as("cnt"),
          sum(dec(col("v"))).cast(DoubleType).as("v_sum"),
          count_distinct(col("uid")).as("uv"),
          min(col("v")).as("v_min"),
          max(col("v")).as("v_max"))
          .orderBy("day", "kind"))
    }
  }

  test("routes coarser keys, function-of-key groupings, derived outputs, and " +
      "a re-read of the same files through a different DataFrame") {
    withProjection { st =>
      // coarser: one key only
      assertRoutedAndEqual(st, () =>
        source.groupBy("kind").agg(count(lit(1)).as("cnt")).orderBy("kind"))
      // function of key + scalar arithmetic over matched aggregates
      assertRoutedAndEqual(st, () =>
        source.groupBy(dayofweek(col("day")).as("dow"))
          .agg((count(lit(1)) * 2).as("cnt2"),
            (max(col("v")) - min(col("v"))).as("spread"))
          .orderBy("dow"))
      // matching is semantic, not object identity: a separately-built read
      // of the same files — without the day column at all — still routes
      assertRoutedAndEqual(st, () =>
        spark.read.parquet(srcPath)
          .groupBy("kind").agg(min(col("v")).as("lo")).orderBy("kind"))
    }
  }

  test("null-key group routes: null ts rows land in the null day group") {
    withProjection { st =>
      val q = () => source.groupBy("day").agg(count(lit(1)).as("cnt")).orderBy("day")
      assertRoutedAndEqual(st, q)
      val nullRow = q().collect().find(_.isNullAt(0))
      assert(nullRow.exists(_.getLong(1) == 5L), "ids 0,997,1994,2991,3988 have null ts")
    }
  }

  test("day filters route — the optimizer's midnight unwrap is re-wrapped " +
      "and prunes state partitions") {
    withProjection { st =>
      val mks = Seq[() => DataFrame](
        () => source.filter(col("day") >= lit(Date.valueOf("2024-02-03")))
          .groupBy("day").agg(count(lit(1)).as("cnt")).orderBy("day"),
        () => source.filter(col("day") === lit(Date.valueOf("2024-02-03")))
          .groupBy("kind").agg(sum(dec(col("v"))).as("s")).orderBy("kind"),
        () => source.filter(col("day") < lit(Date.valueOf("2024-02-03")))
          .groupBy("day").agg(max(col("v")).as("m")).orderBy("day"),
        // key filter that needs no unwrap handling at all
        () => source.filter(col("kind") === "view")
          .groupBy("day").agg(count(lit(1)).as("cnt")).orderBy("day"))
      mks.foreach(assertRoutedAndEqual(st, _))
      // the equality filter becomes a partition filter on the state scan
      val scan = planOf(source.filter(col("day") === lit(Date.valueOf("2024-02-03")))
        .groupBy("kind").agg(count(lit(1)).as("cnt")))
      assert(scan.contains("PartitionFilters") && !scan.contains("PartitionFilters: []"),
        s"expected day partition pruning on the state read:\n$scan")
    }
  }

  test("declines stay raw AND stay correct: unregistered agg, non-key filter, " +
      "global agg, un-implied null guard, foreign files") {
    val foreign = tmpDir("proj-foreign") + "/ev"
    source.limit(100).write.parquet(foreign)
    withProjection { _ =>
      val cases = Seq[DataFrame](
        source.groupBy("day").agg(avg(col("v")).as("a")),     // unregistered agg
        source.filter(col("uid") > 10)
          .groupBy("day").agg(count(lit(1)).as("c")),         // non-key filter
        source.agg(count(lit(1)).as("c")),                    // global agg
        source.filter(col("ts").isNotNull)                    // bare null guard:
          .groupBy("day").agg(count(lit(1)).as("c")),         // nothing implies it
        spark.read.parquet(foreign)                           // same schema,
          .groupBy("kind").agg(count(lit(1)).as("c")))        // different files
      for (q <- cases) assert(!planOf(q).contains("proj-st"), planOf(q))
      // decline #4 is value-checkable: it must really drop the 5 null-ts rows
      assert(source.filter(col("ts").isNotNull)
        .groupBy("day").agg(count(lit(1)).as("c"))
        .agg(sum("c")).head.getLong(0) == 3995L)
    }
  }

  test("output ids survive: downstream filter/join/re-aggregate over the " +
      "routed aggregate resolve against the rewritten plan") {
    withProjection { _ =>
      import spark.implicits._
      val agg = source.groupBy("day", "kind").agg(count(lit(1)).as("cnt"))
      val dim = Seq(("view", "V"), ("click", "C"), ("buy", "B")).toDF("kind", "code")
      val q = agg.filter(col("cnt") > 0)
        .join(broadcast(dim), Seq("kind"))
        .groupBy("code").agg(sum("cnt").as("total"))
        .orderBy("code")
      assert(planOf(q).contains("proj-st"), planOf(q))
      assert(q.collect().map(_.getLong(1)).sum == 4000L)
    }
  }

  test("ingest never self-routes: appendBatch after registration writes the " +
      "batch's real states, not a routed read of the table itself") {
    // metrics chosen so toStates' aggregate is expression-identical to the
    // registered defs (count/sum — the exact shape that routed pre-fix)
    val st = new StateTable(spark, tmpDir("proj-ingest-st") + "/st",
      keys = Seq("day", "kind"), partitionCol = "day",
      metrics = Seq(CountMetric("cnt"), SumMetric("v_sum", dec(col("v")))))
    val d7 = Date.valueOf("2024-02-07")
    st.appendBatch(source.filter(col("day") < lit(d7) || col("day").isNull))
    // expected day-7 profile, computed BEFORE registration so it can't route
    val exp = source.filter(col("day") === lit(d7))
      .groupBy("kind").agg(count(lit(1)).as("cnt"))
      .orderBy("kind").collect().map(r => (r.getString(0), r.getLong(1)))
    Projection.register(spark, st, source, Seq(
      "cnt" -> count(lit(1)), "v_sum" -> sum(dec(col("v")))))
    try {
      // the sync path the Projection scaladoc documents: append one day.
      // Its toStates groupBy matches the projection; day 7 is absent from
      // the table, so a routed read would append ZERO rows (batch lost).
      st.appendBatch(source.filter(col("day") === lit(d7)))
      val got = st.finalized().filter(col("day") === lit(d7))
        .orderBy("kind").collect().map(r => (r.getString(1), r.getLong(2)))
      assert(exp.nonEmpty && got.sameElements(exp),
        s"ingest was routed onto the table itself: got ${got.mkString(",")} " +
          s"expected ${exp.mkString(",")}")
      // and appending an ALREADY-PRESENT day must add that batch once more
      // (states for the batch), not double the table's merged totals
      st.appendBatch(source.filter(col("day") === lit(d7)))
      val doubled = st.finalized().filter(col("day") === lit(d7))
        .orderBy("kind").collect().map(r => (r.getString(1), r.getLong(2)))
      assert(doubled.map(_._2).sameElements(exp.map(_._2 * 2)))
    } finally Projection.deregister(spark, st)
  }

  test("aggregate-free matches route as DISTINCT over state keys instead of " +
      "crashing the rule") {
    withProjection { st =>
      // SELECT DISTINCT key → Aggregate with no aggregate functions
      assertRoutedAndEqual(st, () => source.select("kind").distinct().orderBy("kind"))
      // distinct over a function of a key + a second key
      assertRoutedAndEqual(st, () =>
        source.select(dayofweek(col("day")).as("dow"), col("kind")).distinct()
          .orderBy("dow", "kind"))
    }
  }

  test("avg decomposes onto registered sum + count defs (CH projection " +
      "semantics: avg is never stored, always sumMerge/countMerge)") {
    val avgDefs: Seq[(String, Column)] = Seq(
      "cnt" -> count(lit(1)),
      "v_cnt" -> count(col("v")),
      "uid_cnt" -> count(col("uid")),
      "v_sum_d" -> sum(col("v")),
      "uid_sum" -> sum(col("uid")))
    val st = new StateTable(spark, tmpDir("proj-st-avg") + "/st",
      keys = Seq("day", "kind"), partitionCol = "day",
      metrics = Seq(CountMetric("cnt"),
        CountValuesMetric("v_cnt", col("v")),
        CountValuesMetric("uid_cnt", col("uid")),
        SumMetric("v_sum_d", col("v")),
        SumMetric("uid_sum", col("uid"))))
    for (i <- 0 until 3)
      st.appendBatch(source.filter(pmod(col("id"), lit(3)) === i))
    Projection.register(spark, st, source, avgDefs)
    def check(mk: () => DataFrame): Unit = {
      val viaStates = mk()
      assert(routed(viaStates), s"expected routing; plan:\n${planOf(viaStates)}")
      val got = viaStates.collect().map(_.toString)
      Projection.deregister(spark, st)
      val exp = mk().collect().map(_.toString)
      Projection.register(spark, st, source, avgDefs)
      assert(got.sameElements(exp),
        s"routed != raw\nrouted: ${got.take(3).mkString("; ")}\nraw: ${exp.take(3).mkString("; ")}")
    }
    try {
      // fractional avg: v = i*0.25 is dyadic, so partial-order sums are
      // exact and routed == raw bit-for-bit
      check(() => source.groupBy("kind").agg(avg(col("v")).as("a")).orderBy("kind"))
      // integral avg (long-exact partials) + a directly-matched def beside
      // it + scalar arithmetic over the decomposed value
      check(() => source.groupBy("day")
        .agg(avg(col("uid")).as("au"), count(lit(1)).as("c"),
          (avg(col("uid")) * 2).as("au2"))
        .orderBy("day"))
      // DISTINCT avg must NOT decompose (sum/count would be wrong)
      val q = source.groupBy("kind").agg(expr("avg(DISTINCT uid)").as("ad"))
      assert(!planOf(q).contains("proj-st"), planOf(q))
    } finally Projection.deregister(spark, st)
  }

  test("decomposed integral avg survives Long-sum overflow: the routed merge " +
      "runs in Double (raw Average's accumulator), matching raw's finite " +
      "value where an exact-Long sumMerge would error under ANSI") {
    import spark.implicits._
    val bigPath = tmpDir("proj-bigavg") + "/src"
    // 6 rows of 4e18 per key (2 per ingest batch, so each stored Long
    // partial is 8e18 — in range — while the MERGED sum 2.4e19 overflows
    // Long; 4e18 = 5^18·2^20 and 2.4e19 = 3·5^18·2^21 are double-exact, so
    // raw and routed must agree bit-for-bit at exactly 4.0e18)
    (0 until 12).map(i => (Seq("a", "b")(i % 2), i % 3, 4000000000000000000L))
      .toDF("k", "b", "x").write.parquet(bigPath)
    val bigSrc = spark.read.parquet(bigPath)
    val st = new StateTable(spark, tmpDir("proj-bigavg-st") + "/st",
      keys = Seq("k"), partitionCol = "k",
      metrics = Seq(SumMetric("x_sum", col("x")),
        CountValuesMetric("x_cnt", col("x"))))
    for (i <- 0 until 3) st.appendBatch(bigSrc.filter(col("b") === i))
    Projection.register(spark, st, bigSrc,
      Seq("x_sum" -> sum(col("x")), "x_cnt" -> count(col("x"))))
    // ANSI pinned EXPLICITLY (it is the Spark 4 default, but the claim —
    // routed avg survives where an exact-Long sumMerge would ERROR — is
    // specifically an ANSI-mode property and must not silently untest
    // itself if the session default ever changes)
    try withSqlConf("spark.sql.ansi.enabled" -> "true") {
      val q = bigSrc.groupBy("k").agg(avg(col("x")).as("ax")).orderBy("k")
      val p = planOf(q)
      assert(p.contains("proj-bigavg-st") && !p.contains("proj-bigavg/"),
        s"expected routing:\n$p")
      val got = q.collect().map(r0 => (r0.getString(0), r0.getDouble(1)))
      // the premise the double merge exists for: the exact-Long sum of
      // these states really does overflow (errors under ANSI)
      val overflow = intercept[Exception](
        st.read().groupBy("k").agg(sum(col("x_sum"))).collect())
      val msgs = Iterator.iterate[Throwable](overflow)(_.getCause)
        .takeWhile(_ != null).map(m => String.valueOf(m.getMessage)).mkString(" | ")
      assert(msgs.toLowerCase.contains("overflow"), msgs)
      Projection.deregister(spark, st)
      val exp = bigSrc.groupBy("k").agg(avg(col("x")).as("ax")).orderBy("k")
        .collect().map(r0 => (r0.getString(0), r0.getDouble(1)))
      Projection.register(spark, st, bigSrc,
        Seq("x_sum" -> sum(col("x")), "x_cnt" -> count(col("x"))))
      assert(got.sameElements(exp), s"${got.toSeq} vs ${exp.toSeq}")
      assert(got.forall(_._2 == 4.0e18), got.toSeq)
    } finally Projection.deregister(spark, st)
  }

  test("projection selection: with two matching projections the coarser " +
      "(fewest-keys) table answers — CH's min-marks analog") {
    val fine = registered() // (day, kind), registered with the battery defs
    val coarse = new StateTable(spark, tmpDir("proj-st-coarse") + "/st",
      keys = Seq("kind"), partitionCol = "kind",
      metrics = Seq(CountMetric("cnt"), MinMetric("v_min", col("v"))))
    coarse.appendBatch(source)
    Projection.register(spark, coarse, source, Seq(
      "cnt" -> count(lit(1)), "v_min" -> min(col("v"))))
    try {
      // both projections can answer a kind-level count; the coarse one must
      val q = source.groupBy("kind").agg(count(lit(1)).as("cnt")).orderBy("kind")
      val p = planOf(q)
      assert(p.contains("proj-st-coarse"), s"expected the coarse table:\n$p")
      assert(!p.contains("proj-src"), p)
      val got = q.collect().map(r => (r.getString(0), r.getLong(1)))
      // a day-level query only the fine projection covers routes to IT
      // (the coarse candidate declines, it cannot express day)
      val qd = source.groupBy("day").agg(count(lit(1)).as("cnt"))
      val pd = planOf(qd)
      assert(pd.contains("proj-st") && !pd.contains("proj-st-coarse") &&
        !pd.contains("proj-src"), pd)
      Projection.deregister(spark, coarse)
      Projection.deregister(spark, fine)
      val exp = q.collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got.sameElements(exp))
    } finally {
      Projection.deregister(spark, coarse)
      Projection.deregister(spark, fine)
    }
  }

  test("deregister restores the raw plan") {
    val st = registered()
    val q = () => source.groupBy("day").agg(count(lit(1)).as("cnt"))
    assert(routed(q()))
    Projection.deregister(spark, st)
    assert(!routed(q()))
  }

  test("cross-session isolation: the rule carries its owning session — a " +
      "thread-active OTHER session can neither lend nor steal routing") {
    import org.apache.spark.sql.SparkSession
    withProjection { st =>
      val s2 = spark.newSession()
      Projection.attach(s2)
      // s2's plan over the SAME files, optimized in s2 (nothing registered
      // there, so it comes out unrouted)
      val plan2 = s2.read.parquet(srcPath).withColumn("day", to_date(col("ts")))
        .groupBy("kind").agg(count(lit(1)).as("cnt"))
        .queryExecution.optimizedPlan
      // the owner's plan in unrouted normal form (deregister for the build)
      Projection.deregister(spark, st)
      val plan1 = source.groupBy("kind").agg(count(lit(1)).as("cnt"))
        .queryExecution.optimizedPlan
      Projection.register(spark, st, source, defs)
      try {
        // adversarial thread-active session on BOTH probes: a rule that
        // consulted getActiveSession would route s2's plan from the
        // owner's store here...
        SparkSession.setActiveSession(spark)
        val out2 = new ProjectionRewrite(s2).apply(plan2)
        assert(out2 eq plan2,
          s"another session's registration routed s2's plan:\n$out2")
        // ...and would LOSE the owner's routing here (a routed plan reads
        // the state relation and aliases its groupings as __g0)
        SparkSession.setActiveSession(s2)
        val out1 = new ProjectionRewrite(spark).apply(plan1)
        assert((out1 ne plan1) && out1.toString.contains("__g0"),
          s"owner lost routing with another session thread-active:\n$out1")
      } finally SparkSession.setActiveSession(spark)
    }
  }
}
