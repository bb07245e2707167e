package graft

import org.apache.spark.sql.functions._

import graft.text.Curation

/** Curation operators: split determinism + proportions, chunk boundary
  * arithmetic, packing invariants, deterministic sampling.
  */
class CurationSpec extends SparkSpec {

  test("assignSplit is deterministic, total, and near the 12/2/2 proportions") {
    val keys = spark.range(4000).select(col("id"))
    val once = keys.select(col("id"), Curation.assignSplit(col("id"), ":s").as("sp"))
    val twice = keys.select(col("id"), Curation.assignSplit(col("id"), ":s").as("sp"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)

    val bysp = once.groupBy("sp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bysp.keySet == Set("train", "val", "test"))
    val train = bysp("train").toDouble / 4000
    assert(train > 0.70 && train < 0.80, s"train fraction $train outside [0.70, 0.80]")

    // a different salt draws an independent assignment (some keys move)
    val other = keys.select(col("id"), Curation.assignSplit(col("id"), ":t").as("sp"))
    assert(once.exceptAll(other).count() > 0)
  }

  test("sampleDeterministic keeps ≈ keep/256 and is a pure key function") {
    val keys = spark.range(4096)
    val kept = keys.filter(Curation.sampleDeterministic(col("id"), lit(64), ":m")).count()
    val frac = kept.toDouble / 4096
    assert(frac > 0.20 && frac < 0.30, s"64/256 sample kept $frac")
    val keptAgain = keys.filter(Curation.sampleDeterministic(col("id"), lit(64), ":m")).count()
    assert(kept == keptAgain)
  }

  test("chunk covers the text with the declared size/stride arithmetic") {
    import spark.implicits._
    val texts = Seq(
      (1L, "a" * 500),  // 500 chars: chunks at 0,150,300,450
      (2L, "b" * 200),  // exactly one full window + one 50-char tail
      (3L, "c" * 37),   // shorter than one window
      (4L, ""))         // empty: no rows
      .toDF("doc_id", "text")
    val got = Curation.chunk(texts, "text", "doc_id", size = 200, stride = 150)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))

    val expected = texts.collect().flatMap { r =>
      val (id, t) = (r.getLong(0), r.getString(1))
      (0 until (if (t.isEmpty) 0 else (t.length - 1) / 150 + 1)).map { i =>
        (id, i.toLong, t.substring(i * 150, math.min(i * 150 + 200, t.length)))
      }
    }.sortBy(t => (t._1, t._2)).toSeq
    assert(got.toSeq == expected)

    // every non-final chunk overlaps the next by size - stride chars
    got.toSeq.groupBy(_._1).values.foreach { cs =>
      cs.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, a), (_, _, b)) if a.length == 200 =>
          assert(a.takeRight(50) == b.take(50))
        case _ => ()
      }
    }
  }

  test("packGreedy: bins contiguous per group, conservation, bounded overflow") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0 until 300).map(i => (i.toLong, s"g${i % 3}", rnd.nextInt(900) + 100))
      .toDF("doc_id", "grp", "w")
    val packed = Curation.packGreedy(docs, "grp", "doc_id", "w", capacity = 2048)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2), r.getLong(3)))

    // conservation: every doc assigned exactly once
    assert(packed.length == 300)

    packed.groupBy(_._1).values.foreach { rows =>
      val inOrder = rows.sortBy(_._2)
      // bins are monotone non-decreasing in doc order
      assert(inOrder.map(_._4).toSeq.sliding(2).forall {
        case Seq(a, b) => a <= b
        case _ => true
      })
      // each bin's PRECEDING-cum span is < capacity: total weight per bin
      // exceeds capacity by at most its last doc's tail
      inOrder.groupBy(_._4).values.foreach { bin =>
        val tot = bin.map(_._3.toLong).sum
        val last = bin.maxBy(_._2)._3.toLong
        assert(tot - last < 2048, s"bin overflow beyond one tail: tot=$tot last=$last")
      }
    }
  }

  test("stratifiedSample: exact quota per stratum, deterministic, salt-independent draws") {
    import spark.implicits._
    // 4 strata of sizes 50/50/8/50 — the size-8 stratum survives in full
    val docs = (0 until 158).map { i =>
      val g = if (i < 50) "a" else if (i < 100) "b" else if (i < 108) "c" else "d"
      (i.toLong, g, s"text $i")
    }.toDF("doc_id", "grp", "text")

    val once = Curation.stratifiedSample(docs, Seq("grp"), "doc_id", quota = 10, salt = ":x")
    val counts = once.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 10, "b" -> 10, "c" -> 8, "d" -> 10), s"$counts")

    // sampled rows keep their full original shape
    assert(once.columns.toSeq == docs.columns.toSeq)

    // pure function of (key, salt): re-run identical, new salt draws differently
    val twice = Curation.stratifiedSample(docs, Seq("grp"), "doc_id", quota = 10, salt = ":x")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    val other = Curation.stratifiedSample(docs, Seq("grp"), "doc_id", quota = 10, salt = ":y")
    assert(once.exceptAll(other).count() > 0)

    // the pick is the smallest md5 prefixes within each stratum (local replica)
    def h(id: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:x".getBytes("UTF-8")).map("%02x".format(_)).mkString
      md.substring(0, 13)
    }
    val expectA = (0L until 50L).sortBy(i => (h(i), i)).take(10).toSet
    val gotA = once.filter(col("grp") === "a").collect().map(_.getLong(0)).toSet
    assert(gotA == expectA)
  }

  test("clusterBalancedSample: balanced quotas from skewed clusters, deterministic") {
    import spark.implicits._
    // 3 well-separated synthetic clusters with skewed sizes 160/30/10 —
    // uniform sampling would give cluster 0 ~80% of any draw
    val rnd = new scala.util.Random(7)
    def vec(center: Array[Float]): Array[Float] =
      center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.05f)
    val centers = Array(
      Array.fill(8)(0f).updated(0, 1f),
      Array.fill(8)(0f).updated(3, 1f),
      Array.fill(8)(0f).updated(6, 1f))
    val rows = (0 until 160).map(i => (i.toLong, vec(centers(0)))) ++
      (160 until 190).map(i => (i.toLong, vec(centers(1)))) ++
      (190 until 200).map(i => (i.toLong, vec(centers(2))))
    val emb = rows.toDF("vec_id", "embedding")
    val s1 = Curation.clusterBalancedSample(emb, "vec_id", "embedding",
      k = 3, quota = 8, iterations = 0, salt = ":t")
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().toSet
    // deterministic: a second run returns the identical set
    val s2 = Curation.clusterBalancedSample(emb, "vec_id", "embedding",
      k = 3, quota = 8, iterations = 0, salt = ":t")
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().toSet
    assert(s1 == s2, "cluster-balanced draw must be deterministic")
    // per-cluster quota respected; no cluster exceeds it
    val byCluster = s1.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byCluster.values.forall(_ <= 8))
    // balance: with 3 seeded centroids over 3 separated blobs, the draw
    // is near-uniform across clusters — the dominant source contributes
    // at most quota of the ≤24 rows, vs ~80% under uniform sampling
    val fromDominant = s1.count(_._1 < 160)
    assert(s1.size >= 16 && fromDominant <= 8 + 4,
      s"dominant cluster crowded the sample: $fromDominant of ${s1.size}")
    // refined path (Lloyd) still respects quotas and stays run-stable
    val r1 = Curation.clusterBalancedSample(emb, "vec_id", "embedding",
      k = 3, quota = 8, iterations = 2, salt = ":t")
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().toSet
    assert(r1.groupBy(_._2).view.mapValues(_.size).toMap.values.forall(_ <= 8))
  }

  test("tfIdfScore matches a brute-force integer TF-IDF on a known corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a c"),   // tf: a=2 b=1 c=1
      (2L, "a b"),       // tf: a=1 b=1
      (3L, "c d d"))     // tf: c=1 d=2
      .toDF("doc_id", "text")
    // df: a=2 b=2 c=2 d=1; N=3; w(t) = (3*1000000) div df
    val wa = 3000000L / 2; val wd = 3000000L / 1
    val got = graft.text.Curation.tfIdfScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 2 * wa + 1 * wa + 1 * wa),
      (2L, 2L, 1 * wa + 1 * wa),
      (3L, 3L, 1 * wa + 2 * wd)))
  }

  test("removeCorpusStopwords drops high-df tokens, keeps order, '' when all dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat the mat"),
      (2L, "the dog"),
      (3L, "the the"),
      (4L, ""))
      .toDF("doc_id", "text")
    // df(the)=3 of 4 > 1/2; everything else below
    val got = graft.text.Curation
      .removeCorpusStopwords(docs, "doc_id", "text", maxDfNum = 1, maxDfDen = 2)
      .orderBy("doc_id")
      .select("doc_id", "cleaned")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "cat mat"), (2L, "dog"), (3L, ""), (4L, "")))
  }

  test("selectByTokenBudget == global ordered prefix, boundary bucket split doc-wise") {
    import spark.implicits._
    // three score classes; budget 10 lands INSIDE the 0.5 class:
    // class 0.9 (6 tokens total) fully in, class 0.5 resolved by doc_id,
    // class 0.1 fully out
    val docs = Seq(
      (1L, 0.9, 4), (2L, 0.9, 2),
      (3L, 0.5, 3), (4L, 0.5, 2), (5L, 0.5, 9),
      (6L, 0.1, 1))
      .toDF("id", "score", "toks")
    val kept = graft.text.Curation
      .selectByTokenBudget(docs, "id", "score", "toks", budget = 10L)
      .select("id").as[Long].collect().toSet
    // order: 1(cum0) 2(cum4) | 3(cum6) 4(cum9) 5(cum11) | 6(cum20)
    // keep while cum_before < 10: ids 1,2,3,4 in; 5 crosses? cum_before(5)=11 >= 10 -> out
    assert(kept == Set(1L, 2L, 3L, 4L))
    // budget larger than the corpus keeps everything; budget 0 keeps nothing
    assert(graft.text.Curation
      .selectByTokenBudget(docs, "id", "score", "toks", 1000L).count() == 6)
    assert(graft.text.Curation
      .selectByTokenBudget(docs, "id", "score", "toks", 0L).count() == 0)
    // the crossing doc IS kept when its own prefix is under budget
    val kept2 = graft.text.Curation
      .selectByTokenBudget(docs, "id", "score", "toks", budget = 7L)
      .select("id").as[Long].collect().toSet
    // cum_before: 1->0, 2->4, 3->6 (crosses: 6 < 7, kept), 4->9 out
    assert(kept2 == Set(1L, 2L, 3L))
  }

  test("tokenPairCounts counts adjacent pairs, skips short and empty docs") {
    import spark.implicits._
    val docs = Seq("a b a b c", "b c", "x", "").toDF("text")
    val got = graft.text.Curation.tokenPairCounts(docs, "text")
      .orderBy("tok_a", "tok_b")
      .as[(String, String, Long)].collect().toSeq
    // doc1 pairs: (a,b) (b,a) (a,b) (b,c); doc2: (b,c); doc3/doc4: none
    assert(got == Seq(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 2L)))
  }

  test("decontaminate drops exactly the eval-overlapping docs; clean corpus re-reports empty") {
    import spark.implicits._
    // corpus: 40 distinct synthetic docs; doc 7 and 23 quote the benchmark
    // verbatim mid-text, doc 31 quotes it with case/punct noise (must still
    // be caught through normalization); everything else is disjoint tokens
    val benchText = "the quick brown fox jumps over the lazy dog tonight"
    val docs = (0 until 40).map { i =>
      val body = (0 until 30).map(j => s"w${i}_$j").mkString(" ")
      val text = i match {
        case 7 | 23 => s"prefix $benchText suffix $body"
        case 31 => s"intro The QUICK, brown FOX jumps over the lazy DOG tonight!! $body"
        case _ => body
      }
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val bench = Seq(benchText).toDF("bench_text")

    val report = Curation.contaminationReport(docs, "doc_id", "text", bench, "bench_text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(report.keySet == Set(7L, 23L, 31L), s"wrong contamination set: ${report.keySet}")
    // the 10-token benchmark has three 8-shingles; verbatim quotes match all
    assert(report(7L) == 3 && report(23L) == 3 && report(31L) == 3, s"$report")

    val clean = Curation.decontaminate(docs, "doc_id", "text", bench, "bench_text", n = 8)
    assert(clean.count() == 37)
    assert(clean.filter(col("doc_id").isin(7, 23, 31)).isEmpty)
    // idempotence: a decontaminated corpus reports nothing
    assert(Curation.contaminationReport(clean, "doc_id", "text", bench, "bench_text", n = 8)
      .isEmpty)
  }

  test("temperatureMix flattens toward sqrt shares, deterministic, caps at 1") {
    import spark.implicits._
    // skewed corpus: big=800, mid=160, small=40
    val docs = ((0 until 800).map(i => (i.toLong, "big")) ++
      (800 until 960).map(i => (i.toLong, "mid")) ++
      (960 until 1000).map(i => (i.toLong, "small"))).toDF("doc_id", "src")

    val once = Curation.temperatureMix(docs, "src", "doc_id", targetTotal = 400)
      .collect().map(_.getLong(0)).toSet
    val again = Curation.temperatureMix(docs, "src", "doc_id", targetTotal = 400)
      .collect().map(_.getLong(0)).toSet
    assert(once == again) // pure key function, no RNG state

    // kept fraction must INCREASE as source size decreases (the flattening)
    val byScr = Curation.temperatureMix(docs, "src", "doc_id", targetTotal = 400)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fBig = byScr("big") / 800.0
    val fMid = byScr("mid") / 160.0
    val fSmall = byScr("small") / 40.0
    assert(fBig < fMid && fMid < fSmall, s"not flattened: $fBig $fMid $fSmall")
    // total lands near the target (1/256 rate quantization + hash noise)
    val total = byScr.values.sum
    assert(total > 300 && total < 500, s"total $total far from 400")

    // a target >= the corpus keeps everything (rate caps at 1 → 256/256)
    assert(Curation.temperatureMix(docs, "src", "doc_id", targetTotal = 5000)
      .count() == 1000)
    // α = 1 degenerates to proportional sampling: equal keep-rates
    val prop = Curation.temperatureMix(docs, "src", "doc_id",
        targetTotal = 400, alpha = 1.0)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Seq(prop("big") / 800.0, prop("mid") / 160.0, prop("small") / 40.0)
    assert(rates.max - rates.min < 0.15, s"α=1 rates spread: $rates")
    // different salts draw independent (here: different) member sets
    val salted = Curation.temperatureMix(docs, "src", "doc_id",
      targetTotal = 400, salt = ":other").collect().map(_.getLong(0)).toSet
    assert(salted != once)
  }
}
