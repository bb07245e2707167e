package graft

import org.apache.spark.sql.functions._

/** corrMatrix / covarSampMatrix / covarPopMatrix, the one-sample t-test,
  * groupArrayInsertAt, and the arrayShiftLeft/Right scalars: agreement
  * with Spark's native pairwise aggregates, partitioning invariance, CH
  * doc-example shapes, and the deterministic collision rule.
  */
class StatMatrixSpec extends SparkSpec {

  private def reg() = graft.functions.ChCompat.register(spark)

  private lazy val df = {
    import spark.implicits._
    (1 to 500).map { i =>
      val x = ((i * 7919) % 101).toDouble
      val y = 3.0 * x + ((i * 104729) % 17) - 8
      val z = ((i * 31) % 13).toDouble - x * 0.5
      (if (i % 2 == 0) "a" else "b", x, y, z)
    }.toDF("g", "x", "y", "z")
  }

  test("matrix aggregates agree with native pairwise corr/covar") {
    reg()
    df.createOrReplaceTempView("graft_mx")
    val got = spark.sql(
      """SELECT g, corrMatrix(x, y, z) cm, covarSampMatrix(x, y, z) cs,
        |       covarPopMatrix(x, y, z) cp
        |FROM graft_mx GROUP BY g ORDER BY g""".stripMargin).collect()
    val exp = df.groupBy("g").agg(
        corr(col("x"), col("y")).as("rxy"), corr(col("x"), col("z")).as("rxz"),
        corr(col("y"), col("z")).as("ryz"),
        covar_samp(col("x"), col("y")).as("sxy"),
        covar_pop(col("x"), col("z")).as("pxz"))
      .orderBy("g").collect()
    for ((g, e) <- got.zip(exp)) {
      val cm = g.getSeq[Seq[Double]](1)
      val cs = g.getSeq[Seq[Double]](2)
      val cp = g.getSeq[Seq[Double]](3)
      assert(math.abs(cm(0)(1) - e.getDouble(1)) < 1e-9, "corr xy")
      assert(math.abs(cm(0)(2) - e.getDouble(2)) < 1e-9, "corr xz")
      assert(math.abs(cm(1)(2) - e.getDouble(3)) < 1e-9, "corr yz")
      assert(cm(1)(0) == cm(0)(1) && cm(2)(0) == cm(0)(2), "symmetric")
      assert(math.abs(cm(0)(0) - 1.0) < 1e-12 && math.abs(cm(2)(2) - 1.0) < 1e-12,
        "unit diagonal")
      assert(math.abs(cs(0)(1) - e.getDouble(4)) < 1e-9, "covarSamp xy")
      assert(math.abs(cp(0)(2) - e.getDouble(5)) < 1e-9, "covarPop xz")
    }
  }

  test("matrix aggregates are partitioning-invariant to float tolerance") {
    reg()
    def at(parts: Int) = {
      df.repartition(parts).createOrReplaceTempView("graft_mx_p")
      spark.sql("SELECT corrMatrix(x, y, z) cm FROM graft_mx_p")
        .collect()(0).getSeq[Seq[Double]](0)
    }
    val a = at(1); val b = at(13)
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(a(i)(j) - b(i)(j)) < 1e-12, s"($i,$j)")
  }

  test("studentTTestOneSample matches the closed form (and two-sided p)") {
    reg()
    import spark.implicits._
    // sample 1..10 vs mu=5: mean 5.5, s 3.02765, t = 0.5222, p ~ 0.6141
    (1 to 10).map(_.toDouble).toDF("v").createOrReplaceTempView("graft_t1")
    val r = spark.sql(
      "SELECT studentTTestOneSample(v, 5.0D) t FROM graft_t1")
      .selectExpr("t.t_statistic", "t.p_value").collect()(0)
    assert(math.abs(r.getDouble(0) - 0.5222329678670935) < 1e-12)
    assert(math.abs(r.getDouble(1) - 0.614117254) < 1e-3,
      s"two-sided p, got ${r.getDouble(1)}")
    // n < 2 -> nulls
    val n1 = spark.sql(
      "SELECT studentTTestOneSample(v, 5.0D) t FROM graft_t1 WHERE v = 1.0")
      .selectExpr("t.t_statistic").collect()(0)
    assert(n1.isNullAt(0))
  }

  test("groupArrayInsertAt: placement, defaults, size, strings, determinism") {
    reg()
    import spark.implicits._
    Seq((0, 10L), (2, 30L), (5, 60L)).toDF("p", "v")
      .createOrReplaceTempView("graft_gai")
    // gaps fill with the type default (0), length = max pos + 1
    assert(spark.sql("SELECT concat_ws(',', groupArrayInsertAt(v, p)) a FROM graft_gai")
      .head().getString(0) == "10,0,30,0,0,60")
    // explicit default + size: pad and truncate
    assert(spark.sql(
      "SELECT concat_ws(',', groupArrayInsertAt(v, p, -1L, 8)) a FROM graft_gai")
      .head().getString(0) == "10,-1,30,-1,-1,60,-1,-1")
    assert(spark.sql(
      "SELECT concat_ws(',', groupArrayInsertAt(v, p, -1L, 3)) a FROM graft_gai")
      .head().getString(0) == "10,-1,30")
    // strings fill with ''
    Seq((1, "b"), (3, "d")).toDF("p", "s").createOrReplaceTempView("graft_gai_s")
    assert(spark.sql(
      "SELECT concat_ws('|', groupArrayInsertAt(s, p)) a FROM graft_gai_s")
      .head().getString(0) == "|b||d")
    // same-position collision keeps the smallest value on ANY partitioning
    val clash = Seq((1, 9L), (1, 3L), (1, 7L), (0, 5L)).toDF("p", "v")
    for (parts <- Seq(1, 4)) {
      clash.repartition(parts).createOrReplaceTempView("graft_gai_c")
      assert(spark.sql(
        "SELECT concat_ws(',', groupArrayInsertAt(v, p)) a FROM graft_gai_c")
        .head().getString(0) == "5,3", s"parts=$parts")
    }
  }

  test("null/typed defaults: NULL fills stay NULL, exotic element defaults work") {
    reg()
    import spark.implicits._
    // explicit NULL default → NULL gaps (not a silent 0 through the
    // non-nullable array writer)
    val shifted = spark.sql(
      "SELECT arrayShiftLeft(array(1L, 2L, 3L), 1, CAST(NULL AS BIGINT)) a")
      .head().getSeq[Any](0)
    assert(shifted == Seq(2L, 3L, null), s"got $shifted")
    Seq((0, 1L), (2, 5L)).toDF("p", "v").createOrReplaceTempView("graft_gai_n")
    val gaps = spark.sql(
      "SELECT groupArrayInsertAt(v, p, CAST(NULL AS BIGINT), 4) a FROM graft_gai_n")
      .head().getSeq[Any](0)
    assert(gaps == Seq(1L, null, 5L, null), s"got $gaps")
    // decimal/date elements: 2-arg form fills the CH type default
    assert(spark.sql(
      "SELECT arrayShiftLeft(array(CAST(1.50 AS DECIMAL(10,2)), CAST(2.50 AS DECIMAL(10,2))), 1) a")
      .head().getSeq[java.math.BigDecimal](0).map(_.toPlainString) == Seq("2.50", "0.00"))
    assert(spark.sql(
      "SELECT CAST(arrayShiftLeft(array(DATE'2024-01-01', DATE'2024-02-02'), 1)[1] AS STRING) d")
      .head().getString(0) == "1970-01-01")
    // a 2-arg shift over elements with no known default is an ANALYSIS
    // error, not a runtime null leak
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT arrayShiftLeft(array(struct(1 AS a)), 1)").collect()
    }
    assert(err.getMessage.contains("explicit default"))
    // a default outside the value lane is an analysis error too
    val err2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT groupArrayInsertAt(v, p, 'x', 4) FROM graft_gai_n").collect()
    }
    assert(err2.getMessage.contains("value lane"))
  }

  test("-Stable aliases, sumKahan, sumWithOverflow, RespectNulls spellings") {
    reg()
    import spark.implicits._
    df.createOrReplaceTempView("graft_stb")
    val r = spark.sql(
      """SELECT corrStable(x, y) c, covarPopStable(x, y) cp,
        |       covarSampStable(x, y) cs, varPopStable(x) vp,
        |       varSampStable(y) vs, stddevPopStable(x) sp,
        |       stddevSampStable(y) ss
        |FROM graft_stb""".stripMargin).head()
    val e = df.agg(corr(col("x"), col("y")), covar_pop(col("x"), col("y")),
      covar_samp(col("x"), col("y")), var_pop(col("x")), var_samp(col("y")),
      stddev_pop(col("x")), stddev_samp(col("y"))).head()
    for (i <- 0 until 7)
      assert(math.abs(r.getDouble(i) - e.getDouble(i)) < 1e-9 * math.max(1, math.abs(e.getDouble(i))),
        s"stable alias $i")
    // Kahan keeps the small addend a naive left-to-right double sum loses
    Seq(1e16, 1.0, -1e16).toDF("v").createOrReplaceTempView("graft_kh")
    for (parts <- Seq(1, 3)) {
      spark.sql(s"SELECT /*+ REPARTITION($parts) */ v FROM graft_kh")
        .createOrReplaceTempView("graft_kh_p")
      assert(spark.sql("SELECT sumKahan(v) s FROM graft_kh_p").head().getDouble(0) == 1.0,
        s"parts=$parts")
    }
    assert(spark.sql("SELECT sumKahan(v) s FROM graft_kh WHERE v > 1e30").head().isNullAt(0),
      "empty group is NULL")
    // sumWithOverflow wraps in the argument type (CH semantics)
    assert(spark.sql(s"SELECT sumWithOverflow(v) s FROM VALUES (${Long.MaxValue}L), (1L) t(v)")
      .head().getLong(0) == Long.MinValue)
    // RespectNulls: a NULL row is a real candidate
    Seq[(Integer, Integer)]((1, null), (2, 7)).toDF("ord", "v")
      .orderBy("ord").coalesce(1).createOrReplaceTempView("graft_rn")
    val rn = spark.sql(
      """SELECT firstValueRespectNulls(v) f, lastValueRespectNulls(v) l,
        |       anyLast(v) al
        |FROM graft_rn""".stripMargin).head()
    assert(rn.isNullAt(0) && rn.getInt(1) == 7 && rn.getInt(2) == 7)
  }

  test("analysisOfVariance: closed form, t² bridge on 2 groups, invariance") {
    reg()
    import spark.implicits._
    // 3 groups with distinct means: hand closed form
    val rows = Seq(
      (0, 1.0), (0, 2.0), (0, 3.0),
      (1, 2.0), (1, 3.0), (1, 4.0),
      (2, 4.0), (2, 5.0), (2, 6.0))
    rows.toDF("g", "v").createOrReplaceTempView("graft_anova3")
    val r = spark.sql("SELECT analysisOfVariance(v, g) a FROM graft_anova3")
      .selectExpr("a.f_statistic", "a.p_value").head()
    // means 2,3,5; grand 10/3; ssb = 3[(2-10/3)²+(3-10/3)²+(5-10/3)²]
    // = 3·(16/9+1/9+25/9) = 14; ssw = 3·2 = 6; F = (14/2)/(6/6) = 7
    assert(math.abs(r.getDouble(0) - 7.0) < 1e-12, s"F=${r.getDouble(0)}")
    assert(r.getDouble(1) > 0 && r.getDouble(1) < 0.05, "p in (0, .05)")
    // 2-group ANOVA ≡ pooled two-sample t: F = t², same p
    val two = (1 to 40).map(i => (i % 2, (i * 7 % 13).toDouble + (i % 2) * 2))
    two.toDF("g", "v").createOrReplaceTempView("graft_anova2")
    val a2 = spark.sql("SELECT analysisOfVariance(v, g) a FROM graft_anova2")
      .selectExpr("a.f_statistic", "a.p_value").head()
    val t2 = spark.sql("SELECT studentTTest(v, g) t FROM graft_anova2")
      .selectExpr("t.t_statistic", "t.p_value").head()
    assert(math.abs(a2.getDouble(0) - t2.getDouble(0) * t2.getDouble(0)) < 1e-9,
      "F = t² on two groups")
    assert(math.abs(a2.getDouble(1) - t2.getDouble(1)) < 1e-9, "same p")
    // partitioning invariance (Welford group merges)
    def at(parts: Int) = {
      rows.toDF("g", "v").repartition(parts).createOrReplaceTempView("graft_anova_p")
      spark.sql("SELECT analysisOfVariance(v, g) a FROM graft_anova_p")
        .selectExpr("a.f_statistic").head().getDouble(0)
    }
    assert(math.abs(at(1) - at(5)) < 1e-12)
    // <2 groups → nulls; string groups work (alias spelling)
    assert(spark.sql("SELECT anova(v, g) a FROM graft_anova3 WHERE g = 0")
      .selectExpr("a.f_statistic").head().isNullAt(0))
    assert(spark.sql(
      "SELECT anova(v, CAST(g AS STRING)) a FROM graft_anova3")
      .selectExpr("round(a.f_statistic, 9)").head().getDouble(0) == 7.0)
  }

  test("quantileExactInclusive/Exclusive match the Excel conventions") {
    reg()
    import spark.implicits._
    (1L to 5L).toDF("v").createOrReplaceTempView("graft_qexc")
    val r = spark.sql(
      """SELECT quantileExactInclusive(v, 0.4D) inc,
        |       quantileExactExclusive(v, 0.4D) exc,
        |       quantileExactExclusive(v, 0.05D) lo,
        |       quantileExactExclusive(v, 0.95D) hi,
        |       medianExactInclusive(v) mi,
        |       medianExactExclusive(v) me
        |FROM graft_qexc""".stripMargin).head()
    assert(r.getDouble(0) == 2.6, "PERCENTILE.INC([1..5], .4) = 2.6")
    assert(math.abs(r.getDouble(1) - 2.4) < 1e-12, "PERCENTILE.EXC = 2.4")
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 5.0, "rank clamps to [1, n]")
    assert(r.getDouble(4) == 3.0 && r.getDouble(5) == 3.0)
    // PERCENTILE.EXC is undefined at the boundaries: CH throws for
    // level <= 0 or >= 1, and so do we (a level=0 typo must not silently
    // return the minimum)
    for (bad <- Seq("0D", "1D", "-0.2D", "1.5D")) {
      val e = intercept[Exception](spark.sql(
        s"SELECT quantileExactExclusive(v, $bad) q FROM graft_qexc").collect())
      assert(e.getMessage.contains("(0, 1)"), s"level $bad must be rejected")
    }
    // ...and a NON-LITERAL out-of-range level throws at RUNTIME instead
    // of silently clamping to the min/max (round-10 review pin: the
    // foldable guard alone left the data-driven path clamping). first()
    // makes the level an aggregate of the data — not foldable
    val eRt = intercept[Exception](spark.sql(
      "SELECT quantileExactExclusive(v, first(lvl)) q FROM " +
        "(SELECT v, CAST(0 AS DOUBLE) AS lvl FROM graft_qexc)").collect())
    assert(eRt.getMessage.contains("(0, 1)"),
      s"runtime level 0 must be rejected, got: ${eRt.getMessage}")
    // a valid non-literal level still computes (no false rejection)
    assert(math.abs(spark.sql(
      "SELECT quantileExactExclusive(v, first(lvl)) q FROM " +
        "(SELECT v, CAST(0.4 AS DOUBLE) AS lvl FROM graft_qexc)")
      .head().getDouble(0) - 2.4) < 1e-12)
    // a NULL non-literal level throws too — the null-skipping clamp chain
    // would otherwise silently return the group's maximum
    val eNull = intercept[Exception](spark.sql(
      "SELECT quantileExactExclusive(v, first(lvl)) q FROM " +
        "(SELECT v, CAST(NULL AS DOUBLE) AS lvl FROM graft_qexc)").collect())
    assert(eNull.getMessage.contains("(0, 1)"),
      s"NULL level must be rejected, got: ${eNull.getMessage}")
  }

  test("review-pass pins: edge semantics of the round-9 spellings") {
    reg()
    import spark.implicits._
    // exclusive quantile over an empty / all-NULL group is NULL, not a
    // thrown ElementAt index error under the ANSI session default
    (1L to 5L).toDF("v").createOrReplaceTempView("graft_rp_v")
    assert(spark.sql(
      "SELECT quantileExactExclusive(v, 0.4D) q FROM graft_rp_v WHERE v > 99")
      .head().isNullAt(0))
    assert(spark.sql(
      "SELECT quantileExactExclusive(CAST(NULL AS BIGINT), 0.4D) q FROM graft_rp_v")
      .head().isNullAt(0))
    // all-identical values: the F statistic is 0/0 → NaN, never a false
    // "infinitely significant" (+Inf, 0)
    Seq((0, 5.0), (0, 5.0), (1, 5.0), (1, 5.0)).toDF("g", "v")
      .createOrReplaceTempView("graft_rp_const")
    val cf = spark.sql("SELECT anova(v, g) a FROM graft_rp_const")
      .selectExpr("a.f_statistic", "a.p_value").head()
    assert(cf.getDouble(0).isNaN && cf.getDouble(1).isNaN)
    // sumWithOverflow wraps in the INPUT type: Int32 sums wrap at 2^31
    val i32 = spark.sql(
      s"SELECT sumWithOverflow(v) s FROM VALUES (${Int.MaxValue}), (1) t(v)").head()
    assert(i32.get(0) == Int.MinValue, s"got ${i32.get(0)}")
    // sumKahan keeps integral inputs exact past 2^53 (Long lane)
    val big = (1L << 53)
    assert(spark.sql(s"SELECT sumKahan(v) s FROM VALUES (${big}L), (1L) t(v)")
      .head().getLong(0) == big + 1L)
    // bare decimal level literals work (0.25 parses as DecimalType)
    Seq((10L, 1), (20L, 1), (30L, 1)).toDF("v", "w")
      .createOrReplaceTempView("graft_rp_iq")
    assert(math.abs(spark.sql(
      "SELECT quantileInterpolatedWeighted(v, w, 0.25) q FROM graft_rp_iq")
      .head().getDouble(0) - 12.5) < 1e-12)
    // a -Stable alias with the wrong arity is an error, not corr ≡ 1.0
    val e = intercept[Exception] {
      spark.sql("SELECT corrStable(v) FROM graft_rp_v").collect()
    }
    assert(e.getMessage.contains("expects exactly 2"))
  }

  test("groupArrayIntersect: set fold across rows, lanes, partitioning") {
    reg()
    import spark.implicits._
    Seq(Seq(1L, 2L, 3L, 2L), Seq(2L, 3L, 4L), Seq(3L, 2L, 9L))
      .toDF("a").createOrReplaceTempView("graft_gai_l")
    for (parts <- Seq(1, 3)) {
      spark.sql(s"SELECT /*+ REPARTITION($parts) */ a FROM graft_gai_l")
        .createOrReplaceTempView("graft_gai_lp")
      assert(spark.sql("SELECT concat_ws(',', groupArrayIntersect(a)) i FROM graft_gai_lp")
        .head().getString(0) == "2,3", s"parts=$parts")
    }
    // an empty array annihilates; a NULL row is skipped; strings sort
    Seq(Some(Seq("b", "a")), None, Some(Seq("a", "b", "c")))
      .toDF("a").createOrReplaceTempView("graft_gai_s")
    assert(spark.sql("SELECT concat_ws(',', groupArrayIntersect(a)) i FROM graft_gai_s")
      .head().getString(0) == "a,b")
    Seq(Seq(1L, 2L), Seq.empty[Long]).toDF("a")
      .createOrReplaceTempView("graft_gai_e")
    assert(spark.sql("SELECT size(groupArrayIntersect(a)) n FROM graft_gai_e")
      .head().getInt(0) == 0)
    // empty group → empty array (not null)
    assert(spark.sql(
      "SELECT size(groupArrayIntersect(a)) n FROM graft_gai_e WHERE size(a) > 99")
      .head().getInt(0) == 0)
  }

  test("bit aggregates, argMin/MaxIf, groupArrayLast spellings") {
    reg()
    import spark.implicits._
    Seq((6L, 10L, true), (12L, 20L, true), (10L, 30L, false))
      .toDF("v", "ord", "c").repartition(1).createOrReplaceTempView("graft_bits")
    val r = spark.sql(
      """SELECT groupBitAnd(v), groupBitOr(v), groupBitXor(v),
        |       argMaxIf(v, ord, c), argMinIf(v, ord, c)
        |FROM graft_bits""".stripMargin).head()
    assert(r.getLong(0) == (6L & 12L & 10L), "AND")
    assert(r.getLong(1) == (6L | 12L | 10L), "OR")
    assert(r.getLong(2) == (6L ^ 12L ^ 10L), "XOR")
    assert(r.getLong(3) == 12L, "argMaxIf skips the cond-false ord=30 row")
    assert(r.getLong(4) == 6L)
    // groupArrayLast: the last N in arrival order (single partition pin)
    (1L to 5L).toDF("v").repartition(1).createOrReplaceTempView("graft_gal")
    assert(spark.sql("SELECT concat_ws(',', groupArrayLast(v, 3)) a FROM graft_gal")
      .head().getString(0) == "3,4,5")
    assert(spark.sql("SELECT concat_ws(',', groupArrayLast(v, 9)) a FROM graft_gal")
      .head().getString(0) == "1,2,3,4,5")
  }

  test("arrayShiftLeft/Right match the CH doc examples") {
    reg()
    def s(expr: String) = spark.sql(s"SELECT concat_ws(',', $expr) v").head().getString(0)
    assert(s("arrayShiftLeft(array(1,2,3,4,5), 3)") == "4,5,0,0,0")
    assert(s("arrayShiftRight(array(1,2,3,4,5), 3)") == "0,0,0,1,2")
    assert(s("arrayShiftLeft(array(1,2,3,4,5), -2)") == "0,0,1,2,3")
    assert(s("arrayShiftLeft(array(1,2,3,4,5), 2, 42)") == "3,4,5,42,42")
    assert(s("arrayShiftRight(array('a','b','c'), 1)") == ",a,b")
    assert(s("arrayShiftLeft(array(1,2,3), 7)") == "0,0,0", "overshift fills all")
    assert(s("arrayShiftLeft(array(1.5D, 2.5D), 1, 9.0D)") == "2.5,9.0")
  }
}
