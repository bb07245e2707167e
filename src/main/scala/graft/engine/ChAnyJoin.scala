package graft.engine

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ClickHouse ANY-strictness join dialect → [[graft.operators.AnyJoin]]:
  * lets a CH user run the literal syntax
  *
  *   SELECT ... FROM l [la] [LEFT|RIGHT|INNER] ANY JOIN r [ra]
  *     ON la.k = ra.k [AND ...] | USING (k, ...)
  *   [WHERE ...] [ORDER BY ...]
  *
  * with both CH word orders accepted (`ANY LEFT JOIN` ≡ `LEFT ANY JOIN`;
  * bare `ANY JOIN` is the inner form). The ON clause must be a
  * conjunction of equalities between the two sides.
  *
  * Documented divergence from CH: ClickHouse's ANY picks an *arbitrary*
  * matching row; here the pick is deterministic (lexicographically
  * smallest non-key tuple — see [[graft.operators.AnyJoin]]), which is a
  * refinement of the CH contract (any CH-legal answer set has exactly
  * this shape; ours is additionally reproducible).
  *
  * Translation mirrors [[ChAsof]]: resolve both tables, rename right keys
  * onto the left's names, execute the ANY join, register a temp view, and
  * splice it into the query with side qualifiers stripped. Non-key right
  * columns must not collide with left column names (project/alias first —
  * the output is one flat namespace).
  */
object ChAnyJoin {

  private val viewSeq = new AtomicInteger

  private val anyJoinRe =
    ("(?is)\\bfrom\\s+([\\w.]+)(?:\\s+(?:as\\s+)?(?!any\\b|left\\b|right\\b|inner\\b|join\\b)(\\w+))?" +
      "\\s+(?:(left|right|inner)\\s+any|any\\s+(left|right|inner)|any)\\s+join" +
      "\\s+([\\w.]+)(?:\\s+(?:as\\s+)?(?!on\\b|using\\b)(\\w+))?" +
      "\\s+(?:on\\s+(.*?)|using\\s*\\(([^)]*)\\)\\s*)" +
      "(?=\\bwhere\\b|\\bgroup\\s+by\\b|\\border\\s+by\\b|" +
      "\\bhaving\\b|\\blimit\\b|\\bwindow\\b|\\bsettings\\b|$)").r

  /** Does the query contain an ANY join to translate? */
  def applies(sql: String): Boolean = anyJoinRe.findFirstIn(sql).isDefined

  /** Run `sql`, translating one ANY join clause; table references resolve
    * through `resolve` (defaults to the session catalog / temp views).
    */
  def sql(spark: SparkSession, query: String,
      resolve: String => DataFrame = null): DataFrame = {
    val r = Option(resolve).getOrElse((n: String) => spark.table(n))
    spark.sql(rewrite(spark, query, r))
  }

  /** Rewrite the ANY join span of `query` into a plain FROM over a temp
    * view holding the executed join; throws if no ANY join present.
    */
  def rewrite(spark: SparkSession, query: String,
      resolve: String => DataFrame): String = {
    val m = anyJoinRe.findFirstMatchIn(query).getOrElse(
      sys.error("ChAnyJoin: no ANY join clause in query"))
    val (leftName, leftAlias) = (m.group(1), Option(m.group(2)))
    val strictness = Option(m.group(3)).orElse(Option(m.group(4)))
      .map(_.toLowerCase).getOrElse("inner")
    val (rightName, rightAlias) = (m.group(5), Option(m.group(6)))
    val onClause = Option(m.group(7)).map(_.trim)
    val usingCols = Option(m.group(8))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)

    val leftDf = resolve(leftName)
    val rightDf = resolve(rightName)
    val lQuals = (leftAlias.toSeq :+ leftName) ++ leftName.split('.').lastOption
    val rQuals = (rightAlias.toSeq :+ rightName) ++ rightName.split('.').lastOption

    val condRe = """(?s)^([\w.]+)\s*=\s*([\w.]+)$""".r
    var keyPairs = Vector.empty[(String, String)] // (left col, right col)
    for (cols <- usingCols) {
      require(cols.nonEmpty, "ChAnyJoin: empty USING column list")
      keyPairs = cols.map(c => (c, c)).toVector
    }
    for (raw <- onClause.toSeq.flatMap(_.split("(?i)\\band\\b")).map(_.trim).filter(_.nonEmpty)) {
      val cm = condRe.findFirstMatchIn(raw).getOrElse(
        sys.error(s"ChAnyJoin: unsupported ON condition '$raw' (equalities only)"))
      val (s1, c1) = ChJoinSyntax.sideOf(cm.group(1), lQuals, rQuals, leftDf, rightDf, "ChAnyJoin")
      val (s2, c2) = ChJoinSyntax.sideOf(cm.group(2), lQuals, rQuals, leftDf, rightDf, "ChAnyJoin")
      if (s1 == s2) sys.error(s"ChAnyJoin: ON condition '$raw' references one side twice")
      keyPairs :+= (if (s1 == 'l') (c1, c2) else (c2, c1))
    }
    if (keyPairs.isEmpty) sys.error("ChAnyJoin: ANY join needs at least one equality key")

    // rename right keys onto the left's names (one flat output namespace);
    // a key pair may not reuse a column either side, and each collision
    // check runs against the PROGRESSIVELY renamed frame — checking the
    // original would spuriously reject `l.a = r.b AND l.b = r.c` (b is
    // renamed away before the second pair needs the name)
    require(keyPairs.map(_._1.toLowerCase).distinct.size == keyPairs.size,
      s"ChAnyJoin: duplicate left key in ON: ${keyPairs.map(_._1).mkString(", ")}")
    require(keyPairs.map(_._2.toLowerCase).distinct.size == keyPairs.size,
      s"ChAnyJoin: duplicate right key in ON: ${keyPairs.map(_._2).mkString(", ")}")
    var right2 = rightDf
    for ((lk, rk) <- keyPairs if !lk.equalsIgnoreCase(rk)) {
      require(!right2.columns.exists(_.equalsIgnoreCase(lk)),
        s"ChAnyJoin: cannot rename right key $rk -> $lk: right already has a column $lk")
      right2 = right2.withColumnRenamed(rk, lk)
    }
    val keys = keyPairs.map(_._1)
    val collisions = right2.columns
      .filter(c => !keys.exists(_.equalsIgnoreCase(c)))
      .filter(c => leftDf.columns.exists(_.equalsIgnoreCase(c)))
    require(collisions.isEmpty,
      s"ChAnyJoin: right columns collide with left: ${collisions.mkString(", ")} — " +
        "project/alias the right side first")

    val joined = strictness match {
      case "left" => graft.operators.AnyJoin.anyLeft(leftDf, right2, keys)
      case "right" => graft.operators.AnyJoin.anyRight(leftDf, right2, keys)
      case _ => graft.operators.AnyJoin.anyInner(leftDf, right2, keys)
    }

    val view = s"graft_any_join_${viewSeq.incrementAndGet()}"
    joined.createOrReplaceTempView(view)

    val spliced = query.substring(0, m.start) + s" FROM $view " + query.substring(m.end)
    val quals = (lQuals ++ rQuals).distinct.filter(_.nonEmpty)
    ChJoinSyntax.stripQualifiers(spliced, quals)
  }
}
