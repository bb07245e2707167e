package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan-shape regression guards: the scale posture (pushdown, pruning,
  * broadcasts, pre-shuffle top-k reduction, single-scan pipelines) asserted
  * mechanically on the declared queries, so a refactor that silently
  * devolves a plan — a lost broadcast hint, a filter that stops reaching
  * parquet, a window where an aggregate belongs — fails `sbt test` instead
  * of surfacing as a 100 TB incident. AQE is disabled for this suite only
  * (suites run sequentially in the forked test JVM): under AQE the
  * unexecuted plan is an opaque AdaptiveSparkPlanExec; without it,
  * `executedPlan` is the full static tree the assertions need. The shapes
  * asserted here (pushdown, broadcast, TakeOrdered, aggregate style) are
  * decided before AQE's runtime re-planning, which only re-partitions or
  * upgrades joins — it never walks these back.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
  }

  override def afterAll(): Unit = {
    spark.conf.unset("spark.sql.adaptive.enabled")
    super.afterAll()
  }

  private def planOf(name: String) =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan

  private def planStr(name: String) = planOf(name).toString

  test("q02: comparison predicates are pushed to the parquet scan") {
    val scans = planOf("q02_filter_project").collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    assert(scans.exists(_.metadata.get("PushedFilters").exists(_ != "[]")),
      "expected non-empty PushedFilters on the lineitem scan")
  }

  test("q01: scan is column-pruned to the referenced subset") {
    val scans = planOf("q01_pricing_summary").collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    // lineitem is 16 columns wide; the pricing summary needs 7
    assert(scans.head.requiredSchema.length <= 7,
      s"scan reads ${scans.head.requiredSchema.length} columns: ${scans.head.requiredSchema.fieldNames.mkString(",")}")
  }

  test("q04/q05: dimension joins broadcast — the fact side never shuffles for the join") {
    for (q <- Seq("q04_join_group", "q05_dict_enrich")) {
      val p = planStr(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: expected a broadcast join")
      assert(!p.contains("SortMergeJoin"), s"$q: dim join degraded to SMJ")
    }
  }

  test("q12: top-k plans as TakeOrderedAndProject, not global sort") {
    val p = planStr("q12_topk")
    assert(p.contains("TakeOrderedAndProject"), "expected TakeOrderedAndProject")
  }

  test("q41: brute-force top-k reduces via the heap aggregate, no per-probe window") {
    val p = planStr("q41_knn_brute")
    assert(p.contains("ObjectHashAggregate"),
      "expected the TopKByScore ObjectHashAggregate")
    assert(!p.contains("Window"),
      "per-probe Window would funnel all scored candidates through one task")
  }

  test("q39: the corpus pipeline is a single documents scan") {
    val scans = planOf("q39_corpus_pipeline").collect { case s: FileSourceScanExec => s }
    assert(scans.length == 1,
      s"pipeline should scan documents once, found ${scans.length} scans")
  }

  test("q62: per-group quality top-k reduces via the heap aggregate, no window") {
    val p = planStr("q62_quality_topk")
    assert(p.contains("ObjectHashAggregate"),
      "expected the TopKByScore ObjectHashAggregate")
    assert(!p.contains("Window"),
      "a per-language Window would sort every scored doc through one task")
  }

  test("Curation.chunk is shuffle-free (pure explode)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = Tables(spark, dir).documents
    val plan = graft.text.Curation.chunk(docs, "text", "doc_id", 200, 150)
      .queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      "chunking must not exchange — it is embarrassingly parallel")
  }

  test("q61: deterministic mixing filters before the aggregation's exchange") {
    // the md5 sample predicate must sit under the aggregate (filter-only
    // pre-shuffle), not after it
    val p = planOf("q61_corpus_mix")
    val agg = p.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a }
    assert(agg.nonEmpty)
    val filterUnderAgg = agg.last.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f }
    assert(filterUnderAgg.nonEmpty, "sample filter should precede the aggregate")
  }

  test("no accidental cartesian products in the relational pack") {
    // q07 is the deliberate cross join; every other relational query must
    // plan without a cartesian/nested-loop join
    for (q <- Seq("q01_pricing_summary", "q02_filter_project", "q04_join_group",
        "q06_subquery_join", "q08_compound_join", "q09_having_skew")) {
      val p = planStr(q)
      assert(!p.contains("CartesianProduct"), s"$q: CartesianProduct in plan")
    }
  }

  test("q44/q67: quantizer paths run on primitive expressions, no Scala UDFs") {
    // IVF assignment/probing and the PQ encode/LUT/score path were
    // interpreted per-row closures until round 5 — a ScalaUDF in these
    // plans means the boxed hot loop crept back
    for (q <- Seq("q44_knn_ivf", "q67_knn_pq")) {
      assert(!planStr(q).contains("UDF"), s"$q: interpreted UDF in plan")
    }
  }

  private def hashExchanges(name: String): Int =
    "Exchange hashpartitioning".r.findAllIn(planStr(name)).length

  test("asof/session/aggregate plans keep their exchange budgets") {
    // q63: one exchange per union side feeding ONE window pass; no joins
    assert(hashExchanges("q63_asof_join") <= 2,
      s"asof join grew extra shuffles: ${hashExchanges("q63_asof_join")}")
    assert(!planStr("q63_asof_join").contains("CartesianProduct"))
    // q64: the session aggregation must REUSE the window's user_id
    // partitioning (HashPartitioning(user) satisfies clustering on
    // (user, session_seq)) — exactly one exchange end-to-end
    assert(hashExchanges("q64_sessions") == 1,
      s"sessionize should be a single-exchange pipeline: ${hashExchanges("q64_sessions")}")
    // q69/q70: object-hash aggregates, one partial/final exchange each
    assert(hashExchanges("q69_topk_weighted") == 1)
    assert(hashExchanges("q70_sum_map") == 1)
  }
}
