package graft

import org.apache.spark.sql.functions._

import graft.dedup.NearDupIndex

/** Asserted twins of BenchScale's scaling curves (SCALE.md §"Measured"):
  * the two load-bearing properties of the incremental dedup path, measured
  * here at two size points each so a regression fails the build instead of
  * only bending a curve.
  *
  * 1. FLAT-HISTORY PROBE: the shuffle volume of a NearDupIndex probe is
  *    O(batch) — growing the history 10x must not grow the exchanged
  *    record count (history streams from the bucketed layout; only its
  *    scan grows). Asserted on exchange METRICS, not wall time, so the
  *    test is deterministic.
  * 2. FALLING PER-DOC INGEST COST: dedupAndAppend has a fixed per-call
  *    job floor; a 10x bigger batch must cost far less than 10x — the
  *    floor amortizes. Wall-time based, with a wide (2x) margin over the
  *    ~8x effect BenchScale measures.
  */
class ScaleSpec extends SparkSpec {

  test("probe exchange volume is O(batch): flat across a 10x history growth") {
    def probeStats(histN: Long): (Long, Long) = {
      val path = tmpDir("graft-scale-spec") + "/ix"
      val ix = new NearDupIndex(spark, path, numHashes = 32, bands = 16)
      ix.append(BenchScale.docs(spark, histN), "text", "doc_id")
      val batch = BenchScale.docs(spark, histN + 1000).filter(col("doc_id") >= histN)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val probe = ix.probe(batch, "text", "doc_id", 0.5)
        val plan = probe.queryExecution.executedPlan
        plan.execute().count(): Unit
        val (recs, _) = BenchScale.exchangeStats(plan)
        (recs, BenchScale.scanRows(plan, path))
      } finally {
        spark.conf.unset("spark.sql.adaptive.enabled")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    // three decades of history growth (100x end to end): a super-linear
    // term hiding under the job floor at one decade can't hide across two
    val (recsSmall, scanSmall) = probeStats(3000)
    val (recsBig, scanBig) = probeStats(30000)
    val (recsHuge, scanHuge) = probeStats(300000)
    assert(scanBig >= scanSmall * 5 && scanHuge >= scanBig * 5,
      s"history axis did not scale: scanned $scanSmall -> $scanBig -> $scanHuge rows")
    assert(recsBig <= (recsSmall * 1.2).toLong,
      s"probe exchange volume grew with history: $recsSmall -> $recsBig records " +
        s"(scan $scanSmall -> $scanBig rows) — the O(batch) property is broken")
    assert(recsHuge <= (recsSmall * 1.2).toLong,
      s"probe exchange volume grew across the second decade: $recsSmall -> " +
        s"$recsHuge records (scan $scanSmall -> $scanHuge rows)")
    assert(recsSmall > 0, "expected the batch side to exchange under no-broadcast")
  }

  test("per-doc ingest cost falls as batches grow: the job floor amortizes") {
    def ingestSec(batchN: Long): Double = {
      val ix = new NearDupIndex(spark, tmpDir("graft-scale-spec") + "/ix",
        numHashes = 32, bands = 16)
      ix.append(BenchScale.docs(spark, 3000), "text", "doc_id")
      val batch = BenchScale.docs(spark, 3000 + batchN).filter(col("doc_id") >= 3000)
      val t0 = System.nanoTime()
      ix.dedupAndAppend(batch, "text", "doc_id", 0.5).count(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    ingestSec(400): Unit // warmup: codegen + write path, untimed
    val perDocSmall = ingestSec(400) / 400
    val perDocBig = ingestSec(4000) / 4000
    assert(perDocBig < perDocSmall * 0.5,
      f"per-doc cost did not amortize: ${perDocSmall * 1000}%.3f ms/doc at 400 " +
        f"-> ${perDocBig * 1000}%.3f ms/doc at 4000")
  }

  test("compaction restores O(states) reads: post-compact scan is flat in parts") {
    import graft.mv.{CountMetric, StateTable, SumMetric}
    // asserted on SCAN METRICS (deterministic), not wall time: before
    // compact a merged read pays every part's rows; after compact it pays
    // exactly the states floor no matter how many parts went in
    def scans(appends: Int): (Long, Long, Long) = {
      val path = tmpDir("graft-scale-compact") + "/t"
      val st = new StateTable(spark, path,
        keys = Seq("day", "k"), partitionCol = "day",
        metrics = Seq(SumMetric("v", col("v_src")), CountMetric("cnt")))
      val batch = spark.range(2L * 500).select(
        expr("date_add(date'2024-01-01', cast(id % 2 as int))").as("day"),
        (col("id") / 2).cast("long").as("k"),
        (col("id") % 97).cast("double").as("v_src"))
      for (_ <- 0 until appends) st.appendBatch(batch)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        def scanOf(): Long = {
          val plan = st.merged().queryExecution.executedPlan
          plan.execute().count(): Unit
          BenchScale.scanRows(plan, path)
        }
        val check = st.merged().agg(sum(col("cnt"))).head().getLong(0)
        val pre = scanOf()
        st.compact()
        val post = scanOf()
        assert(st.merged().agg(sum(col("cnt"))).head().getLong(0) == check,
          "compaction changed the merged result")
        (pre, post, check)
      } finally spark.conf.unset("spark.sql.adaptive.enabled")
    }
    val (pre4, post4, check4) = scans(4)
    val (pre16, post16, check16) = scans(16)
    assert(pre16 >= pre4 * 3, s"parts axis did not scale: $pre4 -> $pre16 scanned rows")
    assert(post4 == post16,
      s"post-compact scan must be flat in pre-compact parts: $post4 vs $post16")
    assert(post16.toDouble <= pre16 / 3.0,
      s"compaction did not collapse the read: $pre16 -> $post16 scanned rows")
    // and the merged answer scaled with the appends, so both tables were real
    assert(check16 == check4 * 4)
  }

  test("TF-IDF exchange volume is linear in the corpus: no quadratic term") {
    // asserted on exchange METRICS (deterministic): the tf/df/join-back
    // spine must exchange O(total tokens) records — a 5x corpus may
    // exchange ~5x records (plus the vocab-sized df side), never more
    def stats(n: Long): Long = {
      // broadcast off: both points run the shuffle-join regime a 100 TB
      // corpus forces, so the ratio reflects volume, not a plan change
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = graft.text.Curation
          .tfIdfScore(BenchScale.docs(spark, n), "doc_id", "text")
          .queryExecution.executedPlan
        plan.execute().count(): Unit
        BenchScale.exchangeStats(plan)._1
      } finally {
        spark.conf.unset("spark.sql.adaptive.enabled")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    val r1 = stats(2000)
    val r5 = stats(10000)
    assert(r1 > 0, "expected a measurable exchange")
    assert(r5 <= r1 * 6,
      s"TF-IDF exchange grew superlinearly: $r1 records at 2k docs -> $r5 at 10k")
  }

  test("duplicated-span exchange volume is linear: constant records per doc") {
    // the digest-count + semi-join + coverage spine moves a fixed-width
    // digest stream ∝ token windows; per-doc exchanged records must be
    // CONSTANT across corpus growth (BenchScale measures 278/doc at every
    // point of the 50x curve — here two points gate the ratio)
    def stats(n: Long): Long = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = graft.dedup.Dedup
          .duplicatedSpans(BenchScale.docs(spark, n), "text", "doc_id", k = 5)
          .queryExecution.executedPlan
        plan.execute().count(): Unit
        BenchScale.exchangeStats(plan)._1
      } finally {
        spark.conf.unset("spark.sql.adaptive.enabled")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    val r1 = stats(2000)
    val r5 = stats(10000)
    assert(r1 > 0, "expected a measurable exchange")
    assert(r5 <= r1 * 6,
      s"span-dedup exchange grew superlinearly: $r1 records at 2k docs -> $r5 at 10k")
  }

  test("count-map aggregate partials bound the exchange: flat across 10x rows") {
    // entropy / the association family / quantileExactWeighted /
    // intervalLengthSum all carry O(distinct-values) (or O(islands))
    // state, map-side combined — so the exchanged record count is
    // partitions x groups, INDEPENDENT of row count. Two size points
    // must shuffle identical record counts when the value domain and
    // partitioning are fixed.
    graft.functions.ChCompat.register(spark)
    def recs(n: Long): Long = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val df = spark.range(0, n, 1, 8).selectExpr(
          "CAST(id % 5 AS STRING) g", "id % 97 v", "CAST(id % 3 AS STRING) y",
          "id % 50 s", "id % 50 + id % 7 e")
        df.createOrReplaceTempView("graft_scale_cm")
        val plan = spark.sql(
          """SELECT g, entropy(v), cramersV(v, y),
            |       quantileExactWeighted(v, 1, 0.5D),
            |       intervalLengthSum(s, e)
            |FROM graft_scale_cm GROUP BY g""".stripMargin)
          .queryExecution.executedPlan
        plan.execute().count(): Unit
        BenchScale.exchangeStats(plan)._1
      } finally spark.conf.unset("spark.sql.adaptive.enabled")
    }
    val small = recs(20000)
    val big = recs(200000)
    assert(small > 0, "expected a measurable exchange")
    assert(big == small,
      s"count-map partials leaked row volume into the exchange: $small -> $big")
  }

  test("fixed-size aggregate partials (matrices, bitmap folds) shuffle flat too") {
    // corrMatrix carries O(k²) doubles per group, the bitmap folds one
    // bitmap per group — both map-side combined, so the exchanged record
    // count is partitions × groups regardless of input rows. (Bitmap
    // record COUNT is flat; bitmap BYTES grow with distinct ids by
    // design — that's the state, not leaked rows.)
    graft.functions.ChCompat.register(spark)
    def recs(n: Long): Long = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val df = spark.range(0, n, 1, 8).selectExpr(
          "CAST(id % 5 AS STRING) g",
          "CAST(id % 97 AS DOUBLE) x", "CAST(id % 31 AS DOUBLE) y",
          "id % 1024 uid")
        df.createOrReplaceTempView("graft_scale_mx")
        val mx = spark.sql(
          """SELECT g, corrMatrix(x, y), covarPopMatrix(x, y),
            |       studentTTestOneSample(x, 10.0D)
            |FROM graft_scale_mx GROUP BY g""".stripMargin)
          .queryExecution.executedPlan
        mx.execute().count(): Unit
        val fold = spark.sql(
          """WITH st AS (
            |  SELECT g, uid % 16 AS sub, groupBitmapState(uid) AS bm
            |  FROM graft_scale_mx GROUP BY g, uid % 16)
            |SELECT g, groupBitmapXor(bm) FROM st GROUP BY g""".stripMargin)
          .queryExecution.executedPlan
        fold.execute().count(): Unit
        BenchScale.exchangeStats(mx)._1 + BenchScale.exchangeStats(fold)._1
      } finally spark.conf.unset("spark.sql.adaptive.enabled")
    }
    val small = recs(20000)
    val big = recs(200000)
    assert(small > 0, "expected a measurable exchange")
    assert(big == small,
      s"fixed-size partials leaked row volume into the exchange: $small -> $big")
  }

  test("CC fixpoint rounds are size-independent: job count flat and shuffle " +
      "sub-quadratic across a 10x corpus (the O(log diameter) claim, asserted)") {
    // BenchScale.docs plants fixed-size (4-doc) near-dup groups, so the
    // cluster DIAMETER — hence the relax/jump round count, hence the job
    // count — must not grow with the corpus; only per-round volume may.
    def cc(n: Long): (Int, Long) = {
      val l = new BenchScale.CountListener
      spark.sparkContext.addSparkListener(l)
      try {
        val pairs = graft.dedup.Dedup.minhashNearDups(
          BenchScale.docs(spark, n), "text", "doc_id", 32, 16, 0.5)
        graft.dedup.Cluster.connectedComponents(pairs, "id_a", "id_b")
          .write.format("noop").mode("overwrite").save()
        l.drain()
        (l.jobs.get, l.shuffleBytes.get)
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val (jSmall, bSmall) = cc(3000)
    val (jBig, bBig) = cc(30000)
    info(s"cc 3k docs: $jSmall jobs, ${bSmall / 1024} KiB shuffled; " +
      s"30k docs: $jBig jobs, ${bBig / 1024} KiB shuffled")
    // same diameter => same rounds; +3 absorbs AQE/commit job jitter
    assert(jBig <= jSmall + 3,
      s"CC round count grew with corpus size: $jSmall -> $jBig jobs")
    // shuffle volume ~linear in docs (10x data, wide margin below the
    // 100x a quadratic all-pairs term would show)
    assert(bBig <= bSmall * 30,
      s"CC shuffle grew super-linearly: $bSmall -> $bBig bytes")
  }
}
