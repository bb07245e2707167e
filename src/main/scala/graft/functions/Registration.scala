package graft.functions

import org.apache.spark.sql.SparkSession

/** Per-session idempotence guard for the `*.register(spark)` methods.
  *
  * Every pack entry point calls `register` defensively (queries must work
  * on a bare session), so before this guard a driver sweep re-bound each
  * function name hundreds of times and flooded the logs with
  * `SimpleFunctionRegistry ... replaced a previously registered function`
  * WARNs — burying real warnings. `once` runs a registration body a
  * single time per (session, key): repeats are a set lookup, re-binding
  * nothing and logging nothing.
  *
  * The key is only marked done after the OUTERMOST body frame COMPLETES,
  * so a body that throws retries on the next call. A body that re-enters
  * itself on the same thread (the analyzer-construction path — see
  * ChCompat's catalog guard) no-ops in the nested frame instead of
  * re-running or, worse, marking the key done before the outer frame's
  * remaining work has run (a nested-frame mark would make an outer-frame
  * failure permanently unretried). `createOrReplaceTempFunction` is
  * idempotent, so a duplicated partial run is harmless. Sessions are
  * weakly keyed — a closed session's guard state is GC'd with it, and
  * `newSession()` clones (fresh function registries) register afresh.
  */
private[graft] object Registration {
  private val done =
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]

  /** (session, key) pairs whose body is running on THIS thread.
    * SparkSession does not override equals, so tuple equality is reference
    * equality on the session — collision-proof, unlike an identity-hash
    * tag.
    */
  private val inProgress =
    ThreadLocal.withInitial[scala.collection.mutable.Set[(SparkSession, String)]](
      () => scala.collection.mutable.Set.empty[(SparkSession, String)])

  /** The dialect intentionally rebinds some Spark builtin names (`median`,
    * `now`, `transform`, …) to their CH semantics, so the registry's
    * "replaced a previously registered function" WARN fires by design on
    * every fresh session (including the per-stream session clones
    * MicroBatchExecution makes). Scope that one logger to ERROR — the
    * per-session guard already makes repeats silent; this silences the
    * expected first-bind overrides too.
    */
  private lazy val quietRegistryLogger: Unit =
    try Seq(
      "org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry",
      "org.apache.spark.sql.catalyst.analysis.SimpleTableFunctionRegistry"
    ).foreach(org.apache.logging.log4j.core.config.Configurator.setLevel(
      _, org.apache.logging.log4j.Level.ERROR))
    catch { case _: Throwable => () } // non-log4j2 backends: keep the WARNs

  def once(spark: SparkSession, key: String)(body: => Unit): Unit = {
    quietRegistryLogger
    val keys = done.synchronized {
      done.computeIfAbsent(spark,
        _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
    }
    if (!keys.contains(key)) {
      val tag = (spark, key)
      val running = inProgress.get()
      if (running.add(tag)) {
        try { body; keys.add(key): Unit }
        finally { running.remove(tag): Unit }
      } // else: re-entered from inside our own body frame — the outer
        // frame finishes (and marks done) after the nested caller returns
    }
  }
}
