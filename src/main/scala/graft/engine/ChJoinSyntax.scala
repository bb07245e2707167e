package graft.engine

import java.util.regex.Pattern

import org.apache.spark.sql.DataFrame

/** Shared pieces of the string-level CH join-dialect translators
  * ([[ChAsof]], [[ChAnyJoin]]): ON-term side classification against the
  * two resolved tables, and qualifier stripping around the spliced
  * result view (the executed join is one flat namespace).
  */
private[engine] object ChJoinSyntax {

  /** Which side does `alias.col` / bare `col` name? Returns ('l'|'r', col). */
  def sideOf(term: String, lQuals: Seq[String], rQuals: Seq[String],
      leftDf: DataFrame, rightDf: DataFrame, who: String): (Char, String) = {
    val dot = term.lastIndexOf('.')
    if (dot > 0) {
      val (qual, c) = (term.substring(0, dot), term.substring(dot + 1))
      if (lQuals.exists(_.equalsIgnoreCase(qual))) ('l', c)
      else if (rQuals.exists(_.equalsIgnoreCase(qual))) ('r', c)
      else sys.error(s"$who: unknown qualifier '$qual' in ON term '$term'")
    } else {
      val inL = leftDf.columns.exists(_.equalsIgnoreCase(term))
      val inR = rightDf.columns.exists(_.equalsIgnoreCase(term))
      if (inL && inR) sys.error(
        s"$who: ambiguous ON term '$term' (qualify it with the table alias)")
      else if (inL) ('l', term)
      else if (inR) ('r', term)
      else sys.error(s"$who: ON term '$term' is in neither side")
    }
  }

  /** Remove `qual.` prefixes outside single-quoted literals. */
  def stripQualifiers(sql: String, quals: Seq[String]): String = {
    val pat = ("(?i)(?<![\\w.])(?:" +
      quals.map(Pattern.quote).mkString("|") + ")\\.").r
    // literals protected by the shared escape-aware lexer
    ChSql.mapCode(sql)(pat.replaceAllIn(_, ""))
  }
}
