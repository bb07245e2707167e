package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Bitmaps

/** Bitmap aggregate family vs exact set semantics (SURVEY.md §5 property
  * tests: bitmap agg == count_distinct on arbitrary uid multisets; algebra
  * matches set ops; merge of partitioned states == state of the whole).
  * ScalaCheck generators are driven manually with fixed seeds (the
  * scalatest-scalacheck bridge artifact isn't on the offline classpath).
  */
class BitmapSpec extends SparkSpec {
  import Bitmaps._

  private val uidLists = Gen.listOf(Gen.chooseNum(0L, 5000L))

  test("bitmap_agg cardinality == countDistinct on arbitrary multisets") {
    import spark.implicits._
    register(spark)
    for (i <- 1 to 12) {
      val uids = uidLists(Gen.Parameters.default.withSize(i * 17), Seed(i.toLong)).get
      val df = uids.toDF("uid")
      val got = df.agg(bitmap_cardinality(bitmap_agg(col("uid")))).collect()(0).getLong(0)
      assert(got == uids.distinct.size.toLong, s"seed=$i uids=$uids")
    }
  }

  test("merge of per-partition states == state over all rows (doc:326-505)") {
    import spark.implicits._
    register(spark)
    val uids = (1L to 400L) ++ (200L to 600L) ++ Seq(7L, 7L, 7L)
    val df = uids.toDF("uid").withColumn("part", pmod(monotonically_increasing_id(), lit(7)))
    val states = df.groupBy("part").agg(bitmap_agg(col("uid")).as("bm"))
    val merged = states.agg(bitmap_cardinality(bitmap_merge_agg(col("bm")))).collect()(0).getLong(0)
    assert(merged == uids.distinct.size.toLong)
  }

  test("bitmap algebra == set algebra") {
    import spark.implicits._
    register(spark)
    val a = (1L to 100L).toSet
    val b = (60L to 160L).toSet
    val df = a.toSeq.map(("a", _)).++(b.toSeq.map(("b", _))).toDF("tag", "uid")
    val bm = df.groupBy().agg(
      bitmap_agg(when(col("tag") === "a", col("uid"))).as("bma"),
      bitmap_agg(when(col("tag") === "b", col("uid"))).as("bmb"))
    val row = bm.select(
      bitmap_and_cardinality(col("bma"), col("bmb")),
      bitmap_or_cardinality(col("bma"), col("bmb")),
      bitmap_cardinality(bitmap_and(col("bma"), col("bmb"))),
      bitmap_cardinality(bitmap_or(col("bma"), col("bmb")))).collect()(0)
    assert(row.getLong(0) == (a & b).size.toLong)
    assert(row.getLong(1) == (a | b).size.toLong)
    assert(row.getLong(2) == (a & b).size.toLong)
    assert(row.getLong(3) == (a | b).size.toLong)
  }

  test("uint32 boundary values round-trip") {
    import spark.implicits._
    register(spark)
    val uids = Seq(0L, 1L, Int.MaxValue.toLong, Int.MaxValue.toLong + 1, 0xFFFFFFFFL)
    val got = uids.toDF("uid").agg(bitmap_cardinality(bitmap_agg(col("uid"))))
      .collect()(0).getLong(0)
    assert(got == uids.size.toLong)
  }
}
