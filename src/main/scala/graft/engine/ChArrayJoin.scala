package graft.engine

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, explode, explode_outer}

/** ClickHouse `ARRAY JOIN` clause → an explode projection: lets a CH user
  * run the literal syntax
  *
  *   SELECT ... FROM t [alias] [LEFT] ARRAY JOIN arr [AS elem]
  *   [WHERE ...] [GROUP BY ...] [ORDER BY ...]
  *
  * (CH docs: ARRAY JOIN clause; the row-expanding FROM modifier, distinct
  * from the `arrayJoin()` function [[graft.functions.ChCompat]] also
  * registers). Semantics preserved:
  *  - bare `ARRAY JOIN arr` REPLACES the array column with its elements
  *    under the same name (one output row per element; empty arrays drop
  *    the row);
  *  - `ARRAY JOIN arr AS elem` keeps the original array column AND adds
  *    the element column;
  *  - `LEFT ARRAY JOIN` keeps empty-array rows with a NULL element
  *    (explode_outer).
  *
  * CH's multi-array zip form (`ARRAY JOIN a, b`) is rejected with a clear
  * error — compose `arrays_zip` explicitly if needed. Translation mirrors
  * [[ChAsof]]/[[ChAnyJoin]]: resolve the table, execute the projection,
  * splice a temp view, strip qualifiers.
  */
object ChArrayJoin {

  private val viewSeq = new AtomicInteger

  private val arrayJoinRe =
    ("(?is)\\bfrom\\s+([\\w.]+)(?:\\s+(?:as\\s+)?(?!left\\b|array\\b)(\\w+))?" +
      "\\s+(left\\s+)?array\\s+join\\s+([^\\s,]+)(\\s*,)?(?:\\s+(?:as\\s+)?(?!where\\b|group\\b|order\\b|having\\b|limit\\b|settings\\b)(\\w+))?" +
      "(?=\\s+where\\b|\\s+group\\s+by\\b|\\s+order\\s+by\\b|" +
      "\\s+having\\b|\\s+limit\\b|\\s+settings\\b|\\s*$)").r

  /** Does the query contain an ARRAY JOIN clause to translate? */
  def applies(sql: String): Boolean = arrayJoinRe.findFirstIn(sql).isDefined

  /** Run `sql`, translating one ARRAY JOIN clause; table references
    * resolve through `resolve` (defaults to the session catalog).
    */
  def sql(spark: SparkSession, query: String,
      resolve: String => DataFrame = null): DataFrame = {
    val r = Option(resolve).getOrElse((n: String) => spark.table(n))
    spark.sql(rewrite(spark, query, r))
  }

  /** Rewrite the ARRAY JOIN span into a plain FROM over a temp view
    * holding the exploded projection; throws if none present.
    */
  def rewrite(spark: SparkSession, query: String,
      resolve: String => DataFrame): String = {
    val m = arrayJoinRe.findFirstMatchIn(query).getOrElse(
      sys.error("ChArrayJoin: no ARRAY JOIN clause in query"))
    val (tableName, alias) = (m.group(1), Option(m.group(2)))
    val isLeft = m.group(3) != null
    if (m.group(5) != null) sys.error(
      "ChArrayJoin: multi-array ARRAY JOIN (a, b) is not supported — " +
        "zip the arrays explicitly (arrays_zip) and ARRAY JOIN the result")
    val elemAlias = Option(m.group(6))

    val df = resolve(tableName)
    val quals = ((alias.toSeq :+ tableName) ++ tableName.split('.').lastOption)
      .distinct.filter(_.nonEmpty)
    // the array reference may be qualified (`t.arr`) — strip a known
    // qualifier before resolving it against the frame
    val rawArr = m.group(4)
    val arrCol = {
      val dot = rawArr.lastIndexOf('.')
      if (dot > 0 && quals.exists(_.equalsIgnoreCase(rawArr.substring(0, dot))))
        rawArr.substring(dot + 1)
      else rawArr
    }
    require(df.columns.exists(_.equalsIgnoreCase(arrCol)),
      s"ChArrayJoin: $tableName has no column $arrCol")

    val gen = if (isLeft) explode_outer(col(arrCol)) else explode(col(arrCol))
    val out = elemAlias match {
      // AS elem: original array kept, element column added
      case Some(e) =>
        require(!df.columns.exists(_.equalsIgnoreCase(e)),
          s"ChArrayJoin: element alias $e collides with an existing column")
        df.select(df.columns.map(col).toSeq :+ gen.as(e): _*)
      // bare form: the array column is REPLACED by its elements
      case None =>
        df.select(df.columns.filterNot(_.equalsIgnoreCase(arrCol)).map(col).toSeq :+
          gen.as(arrCol): _*)
    }

    val view = s"graft_array_join_${viewSeq.incrementAndGet()}"
    out.createOrReplaceTempView(view)
    val spliced = query.substring(0, m.start) + s" FROM $view " + query.substring(m.end)
    ChJoinSyntax.stripQualifiers(spliced, quals)
  }
}
