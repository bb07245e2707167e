package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Catalyst Expression converters.
  *
  * Spark 4 wraps `Column` around a connect-compatible `ColumnNode` and marks
  * the classic-mode converters (`classic.ExpressionUtils`) private to
  * `org.apache.spark.sql`; a library that builds logical plans from analyzed
  * Catalyst expressions (graft.mv.Projection's rewrite rule) still needs
  * them. This object lives in a subpackage of `org.apache.spark.sql` purely
  * to satisfy that qualified-private access — the established packaging
  * technique for Spark-native libraries — and re-exports the two calls
  * unchanged. Nothing else in the build may bypass the public API through
  * this seam: keep it two one-liners.
  */
object ColumnBridge {
  /** Wrap an (optionally unresolved) Catalyst expression as a classic Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a classic Column to its Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
