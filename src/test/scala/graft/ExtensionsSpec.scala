package graft

import org.apache.spark.sql.SparkSession

/** spark.sql.extensions packaging: a session built with GraftExtensions
  * resolves graft + ClickHouse-dialect functions with no explicit register
  * call.
  */
class ExtensionsSpec extends SparkSpec {

  test("fresh session with GraftExtensions resolves graft SQL functions") {
    val base = spark // ensure shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT bitmapCardinality(bitmap_agg(id)) AS uv,
          |       uniqExact(id % 3) AS u3,
          |       toUInt32(medianExact(CAST(id AS DOUBLE))) AS med
          |FROM range(10)""".stripMargin).collect()(0)
      assert(r.getLong(0) == 10L)
      assert(r.getLong(1) == 3L)
      assert(r.getLong(2) == 4L) // median of 0..9 = 4.5, toUInt32 truncates
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("Registration.once: re-entrant frames no-op; an outer-frame failure retries") {
    var runs = 0
    def body(): Unit = {
      runs += 1
      // same-thread re-entry (the analyzer-construction path): must neither
      // re-run the body nor mark the key done before the outer frame ends
      graft.functions.Registration.once(spark, "reentry-test")(body())
      if (runs == 1) sys.error("outer frame fails after the nested call returned")
    }
    intercept[RuntimeException](
      graft.functions.Registration.once(spark, "reentry-test")(body()))
    assert(runs == 1) // nested frame did not re-run the body
    // the failed outer frame must NOT have been marked done (not even by
    // its nested frame) — the next call retries and succeeds
    graft.functions.Registration.once(spark, "reentry-test")(body())
    assert(runs == 2)
    // now complete: further calls are a set lookup
    graft.functions.Registration.once(spark, "reentry-test")(body())
    assert(runs == 2)
  }

  test("Projection.attach on an extensions session adds no second rewrite " +
      "rule (the injected copy already runs in the main optimizer)") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext-attach-test")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // attach BEFORE the session's first query: attach itself must force
      // the analyzer (where the injected builder sets the marker), or a
      // fresh extensions session would get the duplicate rule after all
      graft.mv.Projection.attach(s2)
      assert(s2.conf.getOption(GraftExtensions.MarkerConf).contains("true"))
      assert(!s2.experimental.extraOptimizations
        .exists(_.isInstanceOf[graft.mv.ProjectionRewrite]),
        "extensions session must not carry a second ProjectionRewrite copy")
      assert(s2.experimental.extraOptimizations.nonEmpty,
        "attach must still install the per-session projection store")
      // a plain session DOES get the rewrite rule, exactly once
      graft.mv.Projection.attach(base)
      graft.mv.Projection.attach(base)
      assert(base.experimental.extraOptimizations
        .count(_.isInstanceOf[graft.mv.ProjectionRewrite]) == 1)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
