package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the declared-query packs.
  *
  * Oracle-determinism rules (SURVEY.md §5):
  *  - money-ish doubles are summed as DECIMAL(18,2) then cast back to DOUBLE,
  *    so Spark and DuckDB produce bit-identical results regardless of
  *    per-partition summation order;
  *  - every declared query ends with an explicit ORDER BY;
  *  - aggregate/computed columns carry identical aliases on both sides.
  */
package object queries {
  /** Exact-decimal view of a 2-dp money double. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec(name: String): Column = dec(col(name))

  /** Order-independent exact sum of a money double, surfaced as DOUBLE. */
  def moneySum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  def moneySum(name: String): Column = moneySum(col(name))

  /** SQL fragment for the same thing, DuckDB side. */
  def moneySumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"
}
