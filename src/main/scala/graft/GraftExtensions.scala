package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point — the idiomatic packaging for a Spark
  * library's custom functions: start any session with
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)`) and every graft function —
  * bitmap aggregate family, MinHash, cosine, and the ClickHouse-dialect
  * names — resolves in SQL without further setup. The per-session
  * `ChCompat.register(spark)` call remains available for sessions created
  * without extensions (the injected rule covers new sessions at build time).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Function registration needs a live session registry; inject via a
    // no-op resolution rule that registers once on first analysis.
    ext.injectResolutionRule { session =>
      functions.ChCompat.register(session)
      // marker read by mv.Projection.attach: this session already runs
      // ProjectionRewrite in the main optimizer, don't add a second copy
      session.conf.set(GraftExtensions.MarkerConf, "true")
      NoopRule
    }
    // CH-projection-style automatic aggregate routing onto registered state
    // tables (no-op until graft.mv.Projection.register is called). The rule
    // carries ITS session: a plan optimized while another session is
    // thread-active still consults only this session's store.
    ext.injectOptimizerRule(session => new mv.ProjectionRewrite(session))
  }
}

object GraftExtensions {
  /** Session-conf marker set when [[GraftExtensions]] injected the
    * projection rewrite into the session's main optimizer.
    */
  val MarkerConf = "spark.graft.extensions.injected"
}

private object NoopRule
  extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = p
}
