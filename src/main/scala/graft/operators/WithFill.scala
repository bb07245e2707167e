package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ClickHouse `ORDER BY <col> WITH FILL [FROM a] [TO b] [STEP s]` — gap
  * densification for ordered reports: grid points of the fill axis that
  * have no row are inserted (other columns null), original rows —
  * including ones off the step grid — are kept untouched, and the result
  * is ordered by the axis. `TO` is exclusive, like CH.
  *
  * Shape: the synthesized axis is a `spark.range` of the grid (tiny —
  * it's a report axis), anti-joined against the present keys to find the
  * holes, unioned back, and sorted. The data side is an already-aggregated
  * report, so the union and final sort are the cheap tail of the query;
  * nothing here scales with the raw input.
  */
object WithFill {

  /** Densify `df`'s `orderCol` over [from, to) with `step`. */
  def densify(df: DataFrame, orderCol: String, from: Long, to: Long,
      step: Long = 1L): DataFrame = {
    require(step > 0, s"WITH FILL STEP must be positive, got $step")
    val s = df.sparkSession
    val axisType = df.schema(orderCol).dataType
    val axis = s.range(from, math.max(from, to), step)
      .select(col("id").cast(axisType).as(orderCol))
    val holes = axis.join(df.select(orderCol).distinct(), Seq(orderCol), "left_anti")
    df.unionByName(holes, allowMissingColumns = true).orderBy(orderCol)
  }

  private val fillRe =
    ("""(?is)\border\s+by\s+(\w+)\s+with\s+fill""" +
      """(?:\s+from\s+(-?\d+))?(?:\s+to\s+(-?\d+))?(?:\s+step\s+(-?\d+))?""").r

  def applies(sql: String): Boolean = fillRe.findFirstIn(sql).isDefined

  /** Run `query`, translating one `ORDER BY ... WITH FILL` clause: the
    * modifier is stripped (the plain ORDER BY stays), the query runs, and
    * the result is densified. FROM/TO default to the result's own
    * min / max+step (the CH behavior when the bounds are omitted).
    */
  def sql(spark: SparkSession, query: String): DataFrame = {
    val m = fillRe.findFirstMatchIn(query).getOrElse(
      sys.error("WithFill: no ORDER BY ... WITH FILL clause in query"))
    val orderCol = m.group(1)
    val step = Option(m.group(4)).map(_.toLong).getOrElse(1L)
    val stripped = query.substring(0, m.start) +
      s" ORDER BY $orderCol " + query.substring(m.end)
    val base = spark.sql(stripped)
    val (from, to) = (Option(m.group(2)).map(_.toLong), Option(m.group(3)).map(_.toLong)) match {
      case (Some(a), Some(b)) => (a, b)
      case (a, b) =>
        // bounds from the data itself — the report result is small by
        // construction, so this extra aggregate is cheap
        val r = base.agg(min(col(orderCol)).cast("long"), max(col(orderCol)).cast("long")).head()
        require(!r.isNullAt(0), "WithFill: empty result and no FROM/TO bounds")
        (a.getOrElse(r.getLong(0)), b.getOrElse(r.getLong(1) + step))
    }
    densify(base, orderCol, from, to, step)
  }
}
