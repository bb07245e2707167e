package graft

import org.apache.spark.sql.functions._

import graft.functions.Moments

/** Exact-moment statistics: agreement with Spark's native co-moment
  * aggregates (within float tolerance — the natives are partition-order-
  * dependent, which is the point), and BIT-exact invariance of the
  * moment-built statistics under repartitioning (the property the hash
  * gate relies on).
  */
class MomentsSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    // deterministic integer-valued pairs with real correlation structure
    (1 to 997).map { i =>
      val x = (i * 7919) % 101
      val y = 3 * x + ((i * 104729) % 17) - 8
      (if (i % 3 == 0) "a" else "b", x.toLong, y.toLong)
    }.toDF("g", "x", "y")
  }

  private def stats(parts: Int) =
    Moments.aggregate(df.repartition(parts), Seq("g"), col("x"), col("y"))
      .select(col("g"),
        Moments.varPop(col("sxx"), col("sx"), col("n")).as("vx"),
        Moments.stddevPop(col("syy"), col("sy"), col("n")).as("sdy"),
        Moments.covarPop(col("sxy"), col("sx"), col("sy"), col("n")).as("cov"),
        Moments.corr(col("sxy"), col("sx"), col("sy"),
          col("sxx"), col("syy"), col("n")).as("r"))
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))

  test("moment-built statistics agree with Spark's native aggregates") {
    val native = df.groupBy("g")
      .agg(var_pop(col("x")).as("vx"), stddev_pop(col("y")).as("sdy"),
        covar_pop(col("x"), col("y")).as("cov"), corr(col("x"), col("y")).as("r"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val exact = stats(8)
    for (((g1, v1, s1, c1, r1), (g2, v2, s2, c2, r2)) <- exact.zip(native)) {
      assert(g1 == g2)
      assert(math.abs(v1 - v2) <= 1e-6 * math.abs(v2), s"$g1 var")
      assert(math.abs(s1 - s2) <= 1e-6 * math.abs(s2), s"$g1 stddev")
      assert(math.abs(c1 - c2) <= 1e-6 * math.abs(c2), s"$g1 covar")
      assert(math.abs(r1 - r2) <= 1e-6, s"$g1 corr")
    }
    // sanity: the planted linear structure shows up as strong correlation
    assert(exact.forall(_._5 > 0.9))
  }

  test("moment-built statistics are bit-identical under repartitioning") {
    assert(stats(1).toSeq == stats(13).toSeq,
      "exact-moment statistics must not depend on partitioning")
  }

  test("moments stay exact past Int64 product range (decimal lanes, no wrap)") {
    import spark.implicits._
    // x = 4e9 → x² = 1.6e19 > 2^63: a LongType product would wrap negative
    // and poison the variance; the decimal lane keeps it exact, so the
    // variance of a constant column is exactly zero
    val big = Seq.fill(10)(("k", 4000000000L, 4000000000L)).toDF("g", "x", "y")
    val v = Moments.aggregate(big, Seq("g"), col("x"), col("y"))
      .select(Moments.varPop(col("sxx"), col("sx"), col("n")).as("vx"))
      .head().getDouble(0)
    assert(v == 0.0, s"constant column variance must be exactly 0, got $v")
  }

  test("CH dialect stat names resolve (covarPop, stddevPop, skewPop, kurtPop)") {
    graft.functions.ChCompat.register(spark)
    df.createOrReplaceTempView("__mom")
    val r = spark.sql(
      """SELECT covarPop(x, y) AS c, stddevPop(x) AS s, varSamp(y) AS vs,
        |       skewPop(x) AS sk, kurtPop(x) AS ku FROM __mom""".stripMargin)
      .collect().head
    val c = df.agg(covar_pop(col("x"), col("y"))).collect().head.getDouble(0)
    assert(math.abs(r.getDouble(0) - c) <= 1e-6 * math.abs(c))
    // kurtPop = excess kurtosis + 3 (CH's non-excess definition)
    val exc = df.agg(kurtosis(col("x"))).collect().head.getDouble(0)
    assert(math.abs(r.getDouble(4) - (exc + 3.0)) <= 1e-9)
  }
}
