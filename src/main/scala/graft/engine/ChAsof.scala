package graft.engine

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** ClickHouse `ASOF JOIN` dialect → [[graft.operators.AsOfJoin]]: lets a
  * CH user run the literal syntax
  *
  *   SELECT ... FROM l [la] ASOF [LEFT] JOIN r [ra]
  *     ON la.k = ra.k [AND ...] AND la.t >= ra.t
  *   [WHERE ...] [ORDER BY ...]
  *
  * (ref doc's join-dialect surface; CH docs ASOF JOIN) without hand-porting
  * to the Scala operator. The ON clause must carry ≥1 equality and exactly
  * one inequality between the two sides' time columns — `>=`/`>` pick the
  * latest right row at-or-before/strictly-before the left time (CH's
  * default ASOF direction), `<=`/`<` the earliest at-or-after/strictly-
  * after; either operand order is accepted (`ra.t <= la.t` ≡ `la.t >= ra.t`).
  *
  * Translation: resolve both table references, rename the right join keys
  * onto the left's names, run the window-formulation sort-merge
  * ([[graft.operators.AsOfJoin.asof]] — one shuffle per side, no interval
  * explosion), register the result as a temp view, and splice that view
  * into the original query with the side qualifiers stripped (the joined
  * view carries every left column plus the right payload under their
  * original names). `ASOF JOIN` without LEFT is the inner form: left rows
  * with no match are dropped (CH inner-ASOF semantics).
  *
  * Constraints (same as the Scala operator, checked with clear errors):
  * non-key right columns — including the right time column — must not
  * collide with left column names; project/alias the right side first
  * (CH users do the same to disambiguate, since the output here is one
  * flat namespace, not a qualified one).
  */
object ChAsof {

  private val viewSeq = new AtomicInteger

  private val asofJoinRe =
    ("(?is)\\bfrom\\s+([\\w.]+)(?:\\s+(?:as\\s+)?(?!asof\\b)(\\w+))?" +
      "\\s+asof\\s+(left\\s+)?join\\s+([\\w.]+)(?:\\s+(?:as\\s+)?(?!on\\b|using\\b)(\\w+))?" +
      "\\s+(?:on\\s+(.*?)|using\\s*\\(([^)]*)\\)\\s*)" +
      "(?=\\bwhere\\b|\\bgroup\\s+by\\b|\\border\\s+by\\b|" +
      "\\bhaving\\b|\\blimit\\b|\\bwindow\\b|\\bsettings\\b|$)").r

  /** Does the query contain an ASOF JOIN to translate? */
  def applies(sql: String): Boolean = asofJoinRe.findFirstIn(sql).isDefined

  /** Run `sql`, translating one ASOF JOIN clause; table references resolve
    * through `resolve` (defaults to the session catalog / temp views).
    */
  def sql(spark: SparkSession, query: String,
      resolve: String => DataFrame = null): DataFrame = {
    val r = Option(resolve).getOrElse((n: String) => spark.table(n))
    spark.sql(rewrite(spark, query, r))
  }

  /** Rewrite the ASOF JOIN span of `query` into a plain FROM over a temp
    * view holding the executed asof join; throws if no ASOF JOIN present.
    */
  def rewrite(spark: SparkSession, query: String,
      resolve: String => DataFrame): String = {
    val m = asofJoinRe.findFirstMatchIn(query).getOrElse(
      sys.error("ChAsof: no ASOF JOIN clause in query"))
    val (leftName, leftAlias) = (m.group(1), Option(m.group(2)))
    val isLeft = m.group(3) != null
    val (rightName, rightAlias) = (m.group(4), Option(m.group(5)))
    val onClause = Option(m.group(6)).map(_.trim)
    val usingCols = Option(m.group(7))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)

    val leftDf = resolve(leftName)
    val rightDf = resolve(rightName)
    val lQuals = (leftAlias.toSeq :+ leftName) ++ leftName.split('.').lastOption
    val rQuals = (rightAlias.toSeq :+ rightName) ++ rightName.split('.').lastOption

    // classify each operand: which side does `alias.col` / bare `col` name?
    def side(term: String): (Char, String) =
      ChJoinSyntax.sideOf(term, lQuals, rQuals, leftDf, rightDf, "ChAsof")

    val condRe = """(?s)^([\w.]+)\s*(>=|<=|!?=|<>|>|<)\s*([\w.]+)$""".r
    var keyPairs = Vector.empty[(String, String)] // (left col, right col)
    var timePair: Option[(String, String, String)] = None // (op as l-vs-r, lcol, rcol)
    // the USING form (CH: last USING column is the time axis, `>=`
    // semantics): same-named keys on both sides, and the shared time
    // column is aliased on the right so the operator's no-collision
    // contract holds; the alias is dropped from the output below
    val usingRightTs = "__asof_using_rts"
    for (cols <- usingCols) {
      require(cols.length >= 2,
        s"ChAsof: ASOF USING needs >= 2 columns (keys..., time), got (${cols.mkString(", ")})")
      keyPairs = cols.init.map(c => (c, c)).toVector
      timePair = Some((">=", cols.last, usingRightTs))
    }
    for (raw <- onClause.toSeq.flatMap(_.split("(?i)\\band\\b")).map(_.trim).filter(_.nonEmpty)) {
      val cm = condRe.findFirstMatchIn(raw).getOrElse(
        sys.error(s"ChAsof: unsupported ON condition '$raw'"))
      val (s1, c1) = side(cm.group(1))
      val (s2, c2) = side(cm.group(3))
      if (s1 == s2) sys.error(s"ChAsof: ON condition '$raw' references one side twice")
      // normalize to left-operand-first (flip the comparator when the
      // condition was written right-side-first: `ra.t <= la.t` ≡ `la.t >= ra.t`)
      val (lc, rc) = if (s1 == 'l') (c1, c2) else (c2, c1)
      val op = if (s1 == 'l') cm.group(2)
        else cm.group(2) match {
          case ">=" => "<="
          case "<=" => ">="
          case ">" => "<"
          case "<" => ">"
          case other => other
        }
      op match {
        case "=" => keyPairs :+= (lc, rc)
        case ">=" | "<=" | ">" | "<" =>
          if (timePair.isDefined) sys.error(
            "ChAsof: ASOF JOIN needs exactly ONE inequality in ON; found a second: " + raw)
          timePair = Some((op, lc, rc))
        case other => sys.error(s"ChAsof: operator '$other' not allowed in ASOF ON")
      }
    }
    if (keyPairs.isEmpty) sys.error("ChAsof: ASOF JOIN needs at least one equality key")
    val (op, leftTs, rightTs) = timePair.getOrElse(
      sys.error("ChAsof: ASOF JOIN needs one inequality (the time condition)"))
    val (forward, strict) = op match {
      case ">=" => (false, false)
      case ">" => (false, true)
      case "<=" => (true, false)
      case "<" => (true, true)
    }

    // rename right keys onto the left's names (the operator's contract);
    // refuse renames that would collide with an existing right column —
    // checked against the PROGRESSIVELY renamed frame, so chains like
    // `l.a = r.b AND l.b = r.c` (b renamed away before the second pair
    // needs the name) pass, and duplicate key reuse is rejected up front
    require(keyPairs.map(_._1.toLowerCase).distinct.size == keyPairs.size,
      s"ChAsof: duplicate left key in ON: ${keyPairs.map(_._1).mkString(", ")}")
    require(keyPairs.map(_._2.toLowerCase).distinct.size == keyPairs.size,
      s"ChAsof: duplicate right key in ON: ${keyPairs.map(_._2).mkString(", ")}")
    var right2 = rightDf
    for ((lk, rk) <- keyPairs if !lk.equalsIgnoreCase(rk)) {
      require(!right2.columns.exists(_.equalsIgnoreCase(lk)),
        s"ChAsof: cannot rename right key $rk -> $lk: right already has a column $lk")
      right2 = right2.withColumnRenamed(rk, lk)
    }
    if (usingCols.isDefined) right2 = right2.withColumnRenamed(leftTs, rightTs)

    val joined = graft.operators.AsOfJoin.asof(
      leftDf, right2, keyPairs.map(_._1), leftTs, rightTs, forward, strict)
    val matched = if (isLeft) joined else joined.filter(col(rightTs).isNotNull)
    // USING output is one flat namespace: the right time column only
    // existed under its alias for the join — drop it (CH USING keeps the
    // left's)
    val result = if (usingCols.isDefined) matched.drop(usingRightTs) else matched

    val view = s"graft_asof_join_${viewSeq.incrementAndGet()}"
    result.createOrReplaceTempView(view)

    // splice: FROM <view> replaces the whole ASOF span, then strip the two
    // sides' qualifiers everywhere outside string literals (the view is one
    // flat namespace carrying both sides' original column names)
    val spliced = query.substring(0, m.start) + s" FROM $view " + query.substring(m.end)
    val quals = (lQuals ++ rQuals).distinct.filter(_.nonEmpty)
    ChJoinSyntax.stripQualifiers(spliced, quals)
  }
}
