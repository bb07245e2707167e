package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

import graft.dedup.NearDupIndex

/** PlanSpec's load-bearing shapes re-asserted on the ADAPTIVE FINAL plans —
  * the trees AQE actually ran, not the static ones it starts from. PlanSpec
  * disables AQE to read the full static tree; production (and Bench) run
  * AQE-on, so the broadcast/no-exchange/single-exchange properties must
  * also hold after runtime re-planning. Method: run the action, then unwrap
  * `AdaptiveSparkPlanExec.executedPlan` and recurse through the
  * materialized `QueryStageExec`s.
  */
class AqePlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  override def afterAll(): Unit = {
    spark.conf.unset("spark.sql.adaptive.enabled")
    super.afterAll()
  }

  /** Execute `df` and return its adaptive FINAL plan (asserting it was in
    * fact adaptive — a conf regression would silently test static plans).
    */
  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect(): Unit // materializes every adaptive stage
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => fail(s"expected an AdaptiveSparkPlanExec, got ${p.nodeName}")
    }
  }

  /** The whole executed tree, descending into materialized query stages. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    p +: kids.flatMap(flatten)
  }

  /** Distinct shuffle exchanges by identity (reused exchanges are leaves
    * referencing an instance that already appears in its own stage).
    */
  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[ShuffleExchangeExec, java.lang.Boolean]())
    flatten(p).foreach { case e: ShuffleExchangeExec => seen.add(e): Unit; case _ => }
    import scala.jdk.CollectionConverters._
    seen.asScala.toSeq
  }

  private def queryPlan(name: String): SparkPlan =
    finalPlan(SparkEntry.queries(name)(spark, dir))

  test("q04/q05: dimension joins stay broadcast in the adaptive final plan") {
    for (q <- Seq("q04_join_group", "q05_dict_enrich")) {
      val flat = flatten(queryPlan(q))
      assert(flat.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"$q: no BroadcastHashJoin in the AQE final plan")
      assert(!flat.exists(_.isInstanceOf[SortMergeJoinExec]),
        s"$q: dim join ran as SortMergeJoin under AQE")
    }
  }

  test("q64: sessionize runs as a single hash exchange under AQE") {
    val hash = shuffles(queryPlan("q64_sessions"))
      .count(_.outputPartitioning.isInstanceOf[HashPartitioning])
    assert(hash == 1, s"sessionize ran $hash hash exchanges under AQE (want 1)")
  }

  test("q49: the cluster-map join side is exchange-free in the AQE final plan") {
    // the CC result leaf carries hash(id) partitioning; the docs⋈clusters
    // join must consume it in place — a shuffle (or a broadcast REBUILD of
    // the docs side) appearing here would re-pay what the leaf already paid
    val flat = flatten(queryPlan("q49_dup_clusters"))
    val joins = flat.filter {
      case _: BroadcastHashJoinExec | _: SortMergeJoinExec | _: ShuffledHashJoinExec => true
      case _ => false
    }
    assert(joins.nonEmpty, "q49: expected the docs left-join in the AQE final plan")
    var sawLeaf = false
    for (j <- joins; side <- j.children) {
      val sideFlat = flatten(side)
      // the CC side is the one rooted at the checkpointed RDD scan
      val isCcSide = sideFlat.exists(_.nodeName.contains("ExistingRDD"))
      if (isCcSide) {
        sawLeaf = true
        assert(!sideFlat.exists(_.isInstanceOf[ShuffleExchangeExec]),
          s"q49: the cluster-map leaf ran under a shuffle exchange")
      }
    }
    assert(sawLeaf, "q49: no checkpointed cluster-map leaf found under the join")
  }

  test("q86/q89: probe-side joins stay broadcast in the adaptive final plan") {
    // q86's rerank fetch: the shortlisted (probe, neighbor) pairs and the
    // probes themselves are tiny against the corpus — both joins must
    // resolve to broadcasts, never a corpus-wide sort-merge. q89's
    // winner-fetch semi-join: groups × quota ids against the corpus —
    // same posture.
    for (q <- Seq("q86_knn_ivfpq_rerank", "q89_stratified_sample")) {
      val flat = flatten(queryPlan(q))
      assert(flat.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"$q: no BroadcastHashJoin in the AQE final plan")
      assert(!flat.exists(_.isInstanceOf[SortMergeJoinExec]),
        s"$q: a probe-sized join ran as SortMergeJoin under AQE")
    }
  }

  test("NearDupIndex probes: history never sits under an exchange in the executed plan") {
    val path = tmpDir("graft-aqe-ndi") + "/ix"
    val ix = new NearDupIndex(spark, path, numHashes = 32, bands = 16)
    ix.append(BenchScale.docs(spark, 2000), "text", "doc_id")
    val batch = BenchScale.docs(spark, 3000).filter(col("doc_id") >= 2000)

    def historyClean(plan: SparkPlan, what: String): Unit = {
      val joins = flatten(plan).filter {
        case _: BroadcastHashJoinExec | _: SortMergeJoinExec | _: ShuffledHashJoinExec => true
        case _ => false
      }
      assert(joins.nonEmpty, s"$what: expected a join in the AQE final plan")
      var sawHistory = false
      for (j <- joins; side <- j.children) {
        val sideFlat = flatten(side)
        val history = sideFlat.exists {
          case s: FileSourceScanExec =>
            s.relation.location.rootPaths.mkString(",").contains(path)
          case _ => false
        }
        if (history) {
          sawHistory = true
          assert(!sideFlat.exists(_.isInstanceOf[ShuffleExchangeExec]),
            s"$what: history scan executed under a shuffle exchange:\n$plan")
        }
      }
      assert(sawHistory, s"$what: no join side read the history table")
    }

    historyClean(finalPlan(ix.probe(batch, "text", "doc_id", 0.5)), "probe")
    historyClean(finalPlan(
      ix.historyDupIds(ix.banded(batch, "text", "doc_id"), 0.5)), "fused ingest probe")
  }
}
