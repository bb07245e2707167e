package graft

import org.apache.spark.sql.functions._

import graft.text.Importance

/** DSIR importance resampling: featurization, exact anchor, hashed
  * scores, Gumbel-top-k determinism.
  */
class ImportanceSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    // target-looking docs: A-vocabulary
    (1L, "alpha beta alpha gamma", "tgt"),
    (2L, "beta alpha beta beta", "tgt"),
    (3L, "gamma alpha beta alpha", "tgt"),
    // off-target docs: B-vocabulary
    (4L, "delta epsilon zeta", "other"),
    (5L, "epsilon zeta delta delta", "other"),
    // mixed
    (6L, "alpha delta beta epsilon", "mix"))
    .toDF("id", "text", "kind")

  test("features = unigrams ++ adjacent bigrams, empty-safe") {
    val f = corpus.filter($"id" === 1L)
      .select(Importance.features($"text").as("f")).collect()(0).getSeq[String](0)
    assert(f === Seq("alpha", "beta", "alpha", "gamma",
      "alpha_beta", "beta_alpha", "alpha_gamma"))
    val single = Seq((9L, "solo")).toDF("id", "text")
      .select(Importance.features($"text").as("f")).collect()(0).getSeq[String](0)
    assert(single === Seq("solo"))
  }

  test("featureHits matches a hand computation") {
    val hits = Importance.featureHits(
        corpus, corpus.filter($"kind" === "tgt"), "id", "text")
      .orderBy("id").collect()
    // doc 4 shares no feature with the target corpus
    val d4 = hits.find(_.getLong(0) == 4L).get
    assert(d4.getLong(1) === 5 && d4.getLong(2) === 0)
    // doc 1's unigrams: alpha(x2) hits tgt-alpha-count 5 each, beta 5,
    // gamma 2; bigrams alpha_beta 3, beta_alpha 3, alpha_gamma 1
    val d1 = hits.find(_.getLong(0) == 1L).get
    assert(d1.getLong(1) === 7)
    assert(d1.getLong(2) === (2 * 5 + 5 + 2) + (3 + 3 + 1))
    // every raw feature occurs at least once in the raw corpus
    assert(hits.forall(r => r.getLong(3) >= r.getLong(1)))
  }

  test("dsirScores separate target-like from off-target documents") {
    val scored = Importance.dsirScores(
        corpus, corpus.filter($"kind" === "tgt"), "id", "text",
        buckets = 512, alpha = 0.5)
      .select($"id", $"kind", $"dsir_score").collect()
    val byKind = scored.groupBy(_.getString(1))
      .map { case (k, rs) => k -> rs.map(_.getDouble(2)).sum / rs.length }
    assert(byKind("tgt") > byKind("mix"))
    assert(byKind("mix") > byKind("other"))
    // deterministic: a second run produces identical doubles
    val again = Importance.dsirScores(
        corpus, corpus.filter($"kind" === "tgt"), "id", "text",
        buckets = 512, alpha = 0.5)
      .select($"id", $"dsir_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    scored.foreach(r => assert(again(r.getLong(0)) === r.getDouble(2)))
  }

  test("resampleTopK is deterministic, sized, and target-biased") {
    val docs = spark.range(1000).select(
      $"id",
      concat_ws(" ",
        when(pmod($"id", lit(4)) === 0, lit("alpha beta alpha beta alpha"))
          .otherwise(lit("delta epsilon zeta delta epsilon"))).as("text"),
      (pmod($"id", lit(4)) === 0).as("is_tgt"))
    val scored = Importance.dsirScores(
      docs, docs.filter($"is_tgt"), "id", "text", buckets = 1024)
    val pick = Importance.resampleTopK(scored, "id", "dsir_score", 100, seed = 3L)
    val rows = pick.select($"id", $"is_tgt").collect()
    assert(rows.length === 100)
    // base rate of target-vocab docs is 25%; selection ∝ exp(score)
    // should overshoot it decisively
    assert(rows.count(_.getBoolean(1)) > 60)
    val again = Importance.resampleTopK(scored, "id", "dsir_score", 100, seed = 3L)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(again === rows.map(_.getLong(0)).toSet)
    // a different seed reshuffles the Gumbel noise (different sample)
    val other = Importance.resampleTopK(scored, "id", "dsir_score", 100, seed = 4L)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(other !== again)
  }

  test("selection plans as TakeOrderedAndProject, not a global sort") {
    val docs = spark.range(100).select($"id",
      lit("alpha beta gamma").as("text"))
    val scored = Importance.dsirScores(docs, docs, "id", "text", buckets = 64)
    val plan = Importance.resampleTopK(scored, "id", "dsir_score", 10, 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
