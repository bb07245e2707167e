package graft

import org.apache.spark.sql.functions._

import graft.functions.ChCompat

/** The reference's ClickHouse SQL runs near-verbatim after
  * ChCompat.register — the dialect-parity surface.
  */
class ChCompatSpec extends SparkSpec {

  test("reference-shaped UV/PV query runs verbatim-ish and matches DataFrame form") {
    ChCompat.register(spark)
    Tables(spark, "/root/testdata/sf0.001").events.createOrReplaceTempView("action_log")

    // shape of dwm.mainpage_stat_mv_dis.sql:60-70 / dict_user_dim.sql:24-27
    val sqlOut = spark.sql(
      """SELECT toDate(ts) AS day,
        |       toStartOfHour(ts) AS hour,
        |       uniqExact(user_id) AS uv,
        |       uniqCombined(user_id) AS uv_approx,
        |       toUInt64(sum(value)) AS pv_value
        |FROM action_log
        |WHERE event_type = 'view'
        |GROUP BY day, hour
        |ORDER BY day, hour""".stripMargin)

    val dfOut = Tables(spark, "/root/testdata/sf0.001").events
      .filter(col("event_type") === "view")
      .groupBy(to_date(col("ts")).as("day"), date_trunc("HOUR", col("ts")).as("hour"))
      .agg(count_distinct(col("user_id")).as("uv"),
        approx_count_distinct(col("user_id")).as("uv_approx"),
        sum(col("value")).cast("long").as("pv_value"))
      .orderBy("day", "hour")

    val a = sqlOut.collect().map(_.toSeq.map(String.valueOf)).toSeq
    val b = dfOut.collect().map(_.toSeq.map(String.valueOf)).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("bitmap funnel SQL: groupBitmap states + bitmapAndCardinality (doc:1207-1238)") {
    ChCompat.register(spark)
    Tables(spark, "/root/testdata/sf0.001").events.createOrReplaceTempView("action_log")

    val out = spark.sql(
      """WITH bm AS (
        |  SELECT toDate(ts) AS day,
        |         bitmap_agg(CASE WHEN event_type = 'view' THEN user_id END) AS view_bm,
        |         bitmap_agg(CASE WHEN event_type = 'click' THEN user_id END) AS click_bm
        |  FROM action_log GROUP BY day)
        |SELECT day,
        |       bitmapCardinality(view_bm) AS view_uv,
        |       bitmapAndCardinality(view_bm, click_bm) AS vc_uv,
        |       bitmapCardinality(bitmapAnd(view_bm, click_bm)) AS vc_uv2,
        |       bitmapCardinality(bitmapOr(view_bm, click_bm)) AS vor_uv,
        |       bitmapOrCardinality(view_bm, click_bm) AS vor_uv2
        |FROM bm ORDER BY day""".stripMargin).collect()

    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(3), "and-cardinality forms must agree")
      assert(r.getLong(4) == r.getLong(5), "or-cardinality forms must agree")
      assert(r.getLong(1) >= r.getLong(2), "funnel monotone: view_uv >= view∧click")
    }
    // cross-check one day against exact distinct
    Tables(spark, "/root/testdata/sf0.001").eventsWithDefaults.createOrReplaceTempView("e2")
    val exact = spark.sql(
      """SELECT day, count(DISTINCT CASE WHEN event_type='view' THEN user_id END) FROM e2
        |GROUP BY day ORDER BY day""".stripMargin).collect()
    assert(out.map(_.getLong(1)).toSeq == exact.map(_.getLong(1)).toSeq)
  }

  test("groupBitmap one-shot and medianExact match their exact counterparts") {
    ChCompat.register(spark)
    Tables(spark, "/root/testdata/sf0.001").lineitem.createOrReplaceTempView("li")
    val r = spark.sql(
      """SELECT l_returnflag,
        |       groupBitmap(l_suppkey) AS uv,
        |       uniqExact(l_suppkey) AS uv_exact,
        |       medianExact(l_quantity) AS med,
        |       percentile(l_quantity, 0.5) AS med_builtin
        |FROM li GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).collect()
    r.foreach { row =>
      assert(row.getLong(1) == row.getInt(2).toLong)
      assert(row.getDouble(3) == row.getDouble(4))
    }
  }
}
