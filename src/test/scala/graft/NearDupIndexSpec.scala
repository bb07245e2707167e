package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, NearDupIndex}

/** Incremental dedup index: batched appends must be indistinguishable from
  * the one-shot LSH pipeline (same seeded hashes), and the ingest loop must
  * drop duplicates against history without re-signaturing it.
  */
class NearDupIndexSpec extends SparkSpec {

  private def corpus = {
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

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-ndi").toString + "/ix"

  test("two-batch append + probe == one-shot minhashNearDups pair set") {
    val ix = new NearDupIndex(spark, tmp(), numHashes = 64, bands = 16)
    ix.append(corpus.filter(col("doc_id") <= 3), "text", "doc_id")
    ix.append(corpus.filter(col("doc_id") > 3), "text", "doc_id")
    // probing the full corpus against the full index yields every candidate
    // pair in both directions; normalized it must equal the one-shot run
    val inc = ix.probe(corpus, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    val oneShot = Dedup.minhashNearDups(corpus, "text", "doc_id", 64, 16, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == oneShot, s"incremental=$inc oneShot=$oneShot")
    assert(oneShot.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("dedupAndAppend drops history dups and in-batch dups, keeps novel docs") {
    val ix = new NearDupIndex(spark, tmp(), numHashes = 64, bands = 16)
    val kept1 = ix.dedupAndAppend(corpus.filter(col("doc_id").isin(0, 4)), "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept1 == Set(0L, 4L), "first batch has no dups")
    // batch 2: 1 is an exact dup of indexed 0; 5 is novel; 2 and 3 are
    // near-dups of 0 — whether they fall under the 0.5 estimate is decided
    // by the (deterministic) probe, so assert consistency with it
    val batch2 = corpus.filter(col("doc_id").isin(1, 2, 3, 5))
    val dupIds = ix.probe(batch2, "text", "doc_id", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    val kept2 = ix.dedupAndAppend(batch2, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dupIds.contains(1L), "exact dup must probe as duplicate")
    assert(!dupIds.contains(5L), "unrelated doc must not probe as duplicate")
    assert(kept2 == Set(1L, 2L, 3L, 5L) -- dupIds, "kept == batch minus probed dups")
    // the survivors are now indexed: re-probing them finds only themselves,
    // so a replayed batch dedups to nothing
    val replay = ix.dedupAndAppend(batch2, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(replay.isEmpty, s"replayed batch should fully dedup, kept $replay")
  }

  test("streaming ingest via foreachBatch dedups against all prior batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val ix = new NearDupIndex(spark, tmp(), numHashes = 64, bands = 16)
    val rows = corpus.as[(Long, String)].collect().toMap
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        ix.dedupAndAppend(batch, "text", "doc_id"): Unit
      }
      .start()
    try {
      input.addData((0L, rows(0L)), (4L, rows(4L)))
      q.processAllAvailable()
      input.addData((1L, rows(1L)), (5L, rows(5L))) // 1 = exact dup of 0
      q.processAllAvailable()
      input.addData((1L, rows(1L)))                 // replayed batch
      q.processAllAvailable()
      val indexed = ix.index.select("id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(indexed == Set(0L, 4L, 5L),
        s"exact dup and replay must not enter the index: $indexed")
    } finally q.stop()
  }

  test("property: survivors of any batched ingest are pairwise below threshold") {
    // 300 synthetic docs in planted near-dup groups of 4, ingested in 3
    // arbitrary batches. For any two survivors x < y: when y arrived, x
    // was already indexed (cross-batch) or a same-batch survivor — either
    // way y would have been dropped if est_jaccard(x, y) >= t. So the
    // final survivor set must contain NO pair at or above the threshold.
    val ix = new NearDupIndex(spark, tmp(), numHashes = 32, bands = 16)
    val docs = BenchScale.docs(spark, 300)
    val survivors = (0 until 3).flatMap { b =>
      ix.dedupAndAppend(docs.filter(col("doc_id") % 3 === b), "text", "doc_id", 0.5)
        .select("doc_id").collect().map(_.getLong(0))
    }.toSet
    assert(survivors.nonEmpty && survivors.size < 300,
      s"fixture should drop near-dups: kept ${survivors.size}")
    val survDocs = docs.filter(col("doc_id").isin(survivors.toSeq: _*))
    val pairs = Dedup.minhashNearDups(survDocs, "text", "doc_id", 32, 16, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.isEmpty,
      s"surviving near-dup pairs: ${pairs.take(5).toSeq} (of ${pairs.length})")
    // and a full replay of everything dedups to nothing
    assert(ix.dedupAndAppend(docs, "text", "doc_id", 0.5).count() == 0)
  }

  test("plan: history sides of probe joins never exchange (O(batch) ingest)") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val path = tmp()
    val ix = new NearDupIndex(spark, path, numHashes = 64, bands = 16)
    ix.append(corpus.filter(col("doc_id") <= 3), "text", "doc_id")
    // history rows must never enter an exchange RAW: every shuffle in the
    // plan may only see history data that already passed through a join
    // (i.e. batch-sized candidate rows). Bucketing satisfies each history
    // join's distribution, so a history scan reachable from an exchange
    // without crossing a join means history itself was shuffled —
    // O(|history|) per batch, the exact regression this test pins.
    def historySidesClean(p: SparkPlan): Unit = {
      val joins = p.collect {
        case j: SortMergeJoinExec => j: SparkPlan
        case j: ShuffledHashJoinExec => j: SparkPlan
      }
      assert(joins.nonEmpty, s"expected a shuffled join in:\n$p")
      def rawHistoryReachable(n: SparkPlan): Boolean = n match {
        case s: FileSourceScanExec =>
          s.relation.location.rootPaths.mkString(",").contains(path)
        case _: SortMergeJoinExec | _: ShuffledHashJoinExec => false
        case other => other.children.exists(rawHistoryReachable)
      }
      for (e <- p.collect { case e: ShuffleExchangeExec => e })
        assert(!rawHistoryReachable(e.child),
          s"history scan feeds an exchange without an intervening join:\n$p")
      // and the joins actually stream history somewhere: at least one join
      // side reads the index directly with no exchange anywhere under it
      val streamed = joins.exists(_.children.exists(side =>
        side.collect { case e: ShuffleExchangeExec => e }.isEmpty &&
          side.collect {
            case s: FileSourceScanExec
              if s.relation.location.rootPaths.mkString(",").contains(path) => s
          }.nonEmpty))
      assert(streamed, s"no join streams the history side directly:\n$p")
    }
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // worst case on purpose: no broadcast rescue, no AQE re-plan — the
    // static plan itself must keep history exchange-free
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val batch = corpus.filter(col("doc_id") > 3)
      val probePlan = ix.probe(batch, "text", "doc_id").queryExecution.executedPlan
      historySidesClean(probePlan)
      // slim-layout scan pin: the band join's history scan must be
      // column-pruned to exclude sig (its rows are sig-NULL; reading the
      // column would drag the bytes of EVERY membership row group too),
      // while the membership-sig scan is the only one reading sig
      val histScans = probePlan.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.mkString(",").contains(path) => s
      }
      assert(histScans.size >= 2, s"expected band + membership scans:\n$probePlan")
      val sigReaders = histScans.count(_.requiredSchema.fieldNames.contains("sig"))
      assert(sigReaders == 1,
        s"exactly the membership scan should read sig, got $sigReaders:\n$probePlan")
      // the replay/membership check dedupAndAppend runs internally: the
      // membership rows stream (band/bucket-aligned), only the batch's
      // ids exchange
      val members = ix.replayMembers(
        batch.select(col("doc_id").as("id")).distinct())
      historySidesClean(members.queryExecution.executedPlan)
      // the FUSED ingest probe (near-dup + membership in one join over the
      // whole bucketed table) — the exact join dedupAndAppend runs
      historySidesClean(
        ix.historyDupIds(ix.banded(batch, "text", "doc_id"), 0.5)
          .queryExecution.executedPlan)
      // REOPENING the index binds to the same catalog table — the
      // bucketed, exchange-free probe shape must survive a restart
      val reopened = new NearDupIndex(spark, path, numHashes = 64, bands = 16)
      historySidesClean(
        reopened.probe(batch, "text", "doc_id").queryExecution.executedPlan)
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
    }
  }

  test("layout stamp guards the READ path; duplicate membership rows don't duplicate pairs") {
    // a v1 stamp (no "layout" field — sig stored per band row) must fail
    // even the read-only probe: probing v1 data with v2 code would find no
    // membership sigs and silently admit every duplicate
    val p1 = tmp()
    val metaPath = new org.apache.hadoop.fs.Path(p1, "_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath, true)
    out.write(
      """{"numHashes":64,"bands":16,"shingleSize":3,"dataBuckets":32}""".getBytes("UTF-8"))
    out.close()
    val old = new NearDupIndex(spark, p1, numHashes = 64, bands = 16)
    val e = intercept[IllegalArgumentException](
      old.probe(corpus.limit(2), "text", "doc_id"))
    assert(e.getMessage.contains("was built with"))
    // append() is replay-unaware by design, so the same doc id can hold
    // two membership rows — the probe's pair contract stays one row per
    // (id, dup_of) despite the membership fanout
    val ix = new NearDupIndex(spark, tmp(), numHashes = 64, bands = 16)
    ix.append(corpus.filter(col("doc_id") === 0), "text", "doc_id")
    ix.append(corpus.filter(col("doc_id") === 0), "text", "doc_id")
    val pairs = ix.probe(corpus.filter(col("doc_id") === 1), "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 0L)),
      s"expected exactly one (1, 0) pair, got ${pairs.toSeq}")
    // conflicting re-append (same id, DIFFERENT text -> a second, different
    // stored sig): still one row per pair, with the MAX est_jaccard across
    // the stored sigs — deterministic, where an arbitrary-row dedup would
    // report whichever sig the plan happened to keep
    ix.append(corpus.filter(col("doc_id") === 4)
      .select(lit(0L).as("doc_id"), col("text")), "text", "doc_id")
    val pairs2 = ix.probe(corpus.filter(col("doc_id") === 1), "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs2.length == 1 && pairs2.head._1 == 1L && pairs2.head._2 == 0L &&
      pairs2.head._3 == 1.0, // doc 1 is an exact dup of 0's ORIGINAL text
      s"expected one (1, 0, 1.0) pair, got ${pairs2.toSeq}")
  }

  test("parameter stamp: reopening with different banding fails fast") {
    val path = tmp()
    new NearDupIndex(spark, path, numHashes = 64, bands = 16)
      .append(corpus.limit(2), "text", "doc_id")
    val e = intercept[IllegalArgumentException] {
      new NearDupIndex(spark, path, numHashes = 128, bands = 32)
        .append(corpus.limit(1), "text", "doc_id")
    }
    assert(e.getMessage.contains("was built with"))
  }
}
