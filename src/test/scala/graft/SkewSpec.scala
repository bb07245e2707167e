package graft

import org.apache.spark.sql.functions._

import graft.engine.Skew

/** Salted-join correctness: identical results to the plain join, with the
  * hot key spread across salt buckets.
  */
class SkewSpec extends SparkSpec {

  test("saltedJoin == plain join on a planted hot key, for inner and left") {
    import spark.implicits._
    // 90% of fact rows carry the hot key 7
    val fact = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 5).otherwise(7L).as("k"),
        col("id").as("v"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"), (7L, "hot"))
      .toDF("k", "name")
    // leave one fact key unmatched for the left-join case
    val dimPartial = dim.filter(col("k") =!= 3L)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) "" else r.getString(2)))
        .sortBy(identity).toSeq

    assert(canon(Skew.saltedJoin(fact, dim, Seq("k"), salt = 8)) ==
      canon(fact.join(dim, Seq("k"))))
    assert(canon(Skew.saltedJoin(fact, dimPartial, Seq("k"), salt = 8, "left")) ==
      canon(fact.join(dimPartial, Seq("k"), "left")))

    // the hot key really is spread over multiple salt buckets
    val spread = fact
      .withColumn("s", pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(8)))
      .filter(col("k") === 7).select("s").distinct().count()
    assert(spread > 4, s"hot key should land in many salt buckets, got $spread")

    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, Seq("k"), 8, "full_outer")
    }
  }
}
