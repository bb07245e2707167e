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
}
