package graft.engine

/** Pure string-level ClickHouse dialect shims, shared by
  * [[ChReplay.runQuery]] and usable directly around `spark.sql` —
  * constructs whose Spark equivalent needs only a mechanical rewrite:
  *
  *  - `PREWHERE` — CH's manual predicate-pushdown stage; Spark's optimizer
  *    already pushes filters to the scan, so it reads as WHERE (and merges
  *    with an existing WHERE by conjunction, CH's combined semantics);
  *  - trailing `FORMAT <name>` — output formatting, meaningless for a
  *    DataFrame result;
  *  - `GROUP BY ... WITH TOTALS` — the grand-total companion row, as
  *    `GROUPING SETS ((keys), ())`. Documented divergence: CH renders the
  *    totals row's key columns as type defaults (0/''), grouping sets
  *    yield NULLs — the relational convention Spark and DuckDB share;
  *  - `GLOBAL` join/IN prefix — CH's ship-to-every-shard hint; Catalyst
  *    owns distribution, the keyword drops.
  */
object ChSql {

  /** PREWHERE → WHERE; `PREWHERE a ... WHERE b` → `WHERE (a) AND b`. */
  def prewhere(q: String): String = {
    val both = """(?is)\bprewhere\b(.*?)\bwhere\b""".r
    both.findFirstIn(q) match {
      case Some(_) => both.replaceAllIn(q, m =>
        java.util.regex.Matcher.quoteReplacement(s"WHERE (${m.group(1).trim}) AND "))
      case None => q.replaceAll("(?i)\\bprewhere\\b", "WHERE")
    }
  }

  /** Drop a trailing `FORMAT <name>` (with or without closing `;`). */
  def stripFormat(q: String): String =
    q.replaceAll("(?is)\\bformat\\s+\\w+\\s*;?\\s*$", "")

  /** `GROUP BY keys WITH TOTALS` → `GROUP BY GROUPING SETS ((keys), ())`. */
  def withTotals(q: String): String =
    """(?is)\bgroup\s+by\s+(.*?)\s+with\s+totals\b""".r.replaceAllIn(q, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"GROUP BY GROUPING SETS ((${m.group(1).trim}), ())"))

  /** Drop CH's `GLOBAL` distribution keyword (GLOBAL [ANY|…] JOIN /
    * GLOBAL [NOT] IN): on CH it forces shipping the right side to every
    * shard; Catalyst owns distribution (broadcast vs shuffle) from
    * statistics, and on one engine the unprefixed form is semantically
    * identical.
    */
  def stripGlobal(q: String): String =
    q.replaceAll("(?i)\\bglobal\\s+(?=((any|all|left|right|inner|full|cross|semi|anti|asof)\\s+)*join\\b|(not\\s+)?in\\s*\\()", "")

  /** All shims, in the order they compose. */
  def apply(q: String): String = withTotals(stripFormat(prewhere(stripGlobal(q))))
}
