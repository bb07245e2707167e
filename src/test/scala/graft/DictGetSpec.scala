package graft

import org.apache.spark.sql.functions._

import graft.functions.DictGet

/** dictGet-UDF enrichment == broadcast-join enrichment — the reference's own
  * equivalence pair (doc:663-745: identical outputs for the two forms).
  */
class DictGetSpec extends SparkSpec {

  test("dict_get point-lookup form == broadcast left join + coalesce default") {
    import spark.implicits._
    val dim = Seq((1L, "android"), (2L, "ios"), (3L, "android"))
      .toDF("uid", "platform")
    val facts = Seq((1L, 10), (2L, 20), (3L, 30), (99L, 40), (1L, 50))
      .toDF("uid", "cnt")

    val lookup = DictGet.stringDict(spark, dim, "uid", "platform", default = "未知")
    val viaUdf = facts.withColumn("platform", lookup(col("uid")))
      .groupBy("platform").agg(sum("cnt").as("total"))

    val viaJoin = facts.join(broadcast(dim), Seq("uid"), "left_outer")
      .withColumn("platform", coalesce(col("platform"), lit("未知")))
      .groupBy("platform").agg(sum("cnt").as("total"))

    val a = viaUdf.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val b = viaJoin.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.toMap == Map("android" -> 90L, "ios" -> 20L, "未知" -> 40L))
  }

  test("missing key yields the declared default (ref dim.dict_user_dim.sql:4-13)") {
    import spark.implicits._
    val dim = Seq((5L, 100L)).toDF("item_id", "price")
    val priceOf = DictGet.longDict(spark, dim, "item_id", "price", default = -1L)
    val got = Seq(5L, 6L).toDF("item_id")
      .select(priceOf(col("item_id")).as("p")).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(100L, -1L))
  }
}
