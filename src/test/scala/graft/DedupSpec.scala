package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Fuzzy-dedup verification: seeded-hash methods against exact Jaccard
  * ground truth on a corpus with planted near-duplicates.
  */
class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the green hills of the valley"
    Seq(
      (0L, base),
      (1L, base),                                              // exact dup of 0
      (2L, base.replace("green", "bright")),                   // near dup of 0
      (3L, base + " and the wind blows"),                      // near dup of 0
      (4L, "completely different words about spark catalyst optimizer plans and shuffles in a cluster"),
      (5L, "another unrelated document mentioning bitmap funnels state merges and materialized views here"),
      (6L, "the quick brown fox sleeps under the old oak tree near the river bend all day long today")
    ).toDF("doc_id", "text")
  }

  test("exact dedup keeps one row per normalized text, lowest id wins") {
    val out = Dedup.exact(docs, "text", "doc_id")
    assert(out.count() == 6)
    assert(out.filter(col("doc_id") === 1).count() == 0) // dup of 0 dropped
    assert(out.filter(col("doc_id") === 0).count() == 1)
  }

  test("minhash LSH candidates cover all high-Jaccard pairs (recall vs exact)") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain true near-dup pairs")
    val mh = Dedup.minhashNearDups(docs, "text", "doc_id", 64, 16, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(mh), s"missed pairs: ${exact -- mh}")
  }

  test("minhash est_jaccard tracks exact jaccard within 0.25") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, threshold = 0.0)
      .select(col("id_a"), col("id_b"), col("jaccard")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val mh = Dedup.minhashNearDups(docs, "text", "doc_id", 128, 32, threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    for (((a, b), est) <- mh; ex <- exact.get((a, b)))
      assert(math.abs(est - ex) < 0.25, s"pair ($a,$b): est=$est exact=$ex")
  }

  test("simhash: identical docs at distance 0, planted near-dups closer than unrelated") {
    import spark.implicits._
    val sigs = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(0, 1) == 0)
    assert(ham(0, 2) < ham(0, 4), "near-dup should be closer than unrelated")
    assert(ham(0, 3) < ham(0, 5))
  }

  test("simhashNearDups finds the planted cluster and nothing unrelated at k=10") {
    val pairs = Dedup.simhashNearDups(docs, "text", "doc_id", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(4L, 5L) })
  }
}
