package graft.fuzz

import scala.util.Random

/** Seeded differential query generator (VERDICT r9 #2).
  *
  * Emits (Spark-dialect SQL, DuckDB oracle SQL) pairs over the sf0.01
  * fixture tables, probing the combinatorial edges the fixed declared-query
  * corpus can't reach: combinator × type × null × empty-group. Every choice
  * derives from the seed — no wall clock, no global RNG — so a seed list is
  * a reproducible regression corpus.
  *
  * Determinism rules (same discipline as the declared packs, SURVEY.md §5):
  *  - money-ish double sums go through DECIMAL(18,2) on BOTH sides;
  *  - int sums are CAST(... AS BIGINT) on the DuckDB side (HUGEINT would
  *    come back as float64 through pandas and trip the strict dtype gate);
  *  - every result is totally ordered (group keys with NULLS FIRST, or the
  *    table's unique key for scalar probes);
  *  - aliases match on both sides; the gate sorts columns by name.
  *
  * Functions deliberately exercised through their CH spellings on the Spark
  * side: sumIf/minIf/maxIf/countIf/uniqExactIf, uniqExact, medianExact,
  * groupArray+arraySort, toYear/toMonth, if(), nullIf (null-edge injection).
  */
object FuzzGen {

  /** `viaChSql`: the Spark side is CH-DIALECT text that must pass through
    * `graft.engine.ChSql(...)` before `spark.sql` — the band that
    * differentially tests the string-level shim chain itself (PREWHERE,
    * SETTINGS, scalar WITH, WITH TOTALS, GLOBAL IN, quoted-unit dateDiff)
    * against a hand-mirrored DuckDB form, with literal edge cases
    * (doubled quotes, keywords inside strings) in the line of fire.
    */
  /** `mustRoute`: the harness asserts the Spark plan answered from the
    * registered projection's state table (no raw events scan) — without
    * it a silently-declining rewrite would make the band vacuous.
    * `mixedRoute`: a UNION of a routable branch and a deliberately
    * unroutable one — the harness asserts the plan reads BOTH the state
    * table and the raw events scan (partial routing, no cross-branch
    * contamination).
    */
  final case class FuzzQuery(name: String, sparkSql: String, duckSql: String,
      viaChSql: Boolean = false, mustRoute: Boolean = false,
      mixedRoute: Boolean = false)

  sealed trait Kind
  case object IntK extends Kind
  case object FloatK extends Kind
  case object StrK extends Kind
  case object TimeK extends Kind

  /** lo/hi bound the predicate constants; strs is the equality/IN pool. */
  final case class Col(name: String, kind: Kind,
      lo: Double = 0, hi: Double = 0, strs: Seq[String] = Nil)

  /** `uniqueKey` is what scalar probes SELECT as the row id; `totalOrder`
    * (defaults to it) must totally order the table — lineitem's synthetic
    * (l_orderkey, l_linenumber) is NOT unique here, so it orders by every
    * column (full rows are distinct). `name` is the whole FROM fragment,
    * so a join pair is just a composite Tbl (TPC-H column names are
    * prefix-unique, no qualification needed); `allowGroupArray` is off for
    * joins (fan-out duplication makes the array contents a join-shape
    * detail rather than an aggregate property).
    */
  final case class Tbl(name: String, uniqueKey: Seq[String], cols: Seq[Col],
      totalOrderOverride: Seq[String] = Nil, allowGroupArray: Boolean = true) {
    def of(k: Kind): Seq[Col] = cols.filter(_.kind == k)
    def totalOrder: Seq[String] =
      if (totalOrderOverride.nonEmpty) totalOrderOverride else uniqueKey
  }

  val tables: Seq[Tbl] = Seq(
    Tbl("lineitem", Seq("l_orderkey", "l_linenumber"), Seq(
      Col("l_orderkey", IntK, 1, 60000),
      Col("l_partkey", IntK, 1, 2000),
      Col("l_suppkey", IntK, 1, 100),
      Col("l_linenumber", IntK, 1, 7),
      Col("l_quantity", FloatK, 1, 50),
      Col("l_extendedprice", FloatK, 900, 100000),
      Col("l_discount", FloatK, 0, 0.1),
      Col("l_tax", FloatK, 0, 0.08),
      Col("l_returnflag", StrK, strs = Seq("A", "N", "R")),
      Col("l_linestatus", StrK, strs = Seq("O", "F")),
      Col("l_shipdate", TimeK, 1995, 2001)),
      totalOrderOverride = Seq("l_orderkey", "l_linenumber", "l_partkey",
        "l_suppkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")),
    Tbl("orders", Seq("o_orderkey"), Seq(
      Col("o_orderkey", IntK, 1, 15000),
      Col("o_custkey", IntK, 1, 1500),
      Col("o_totalprice", FloatK, 1000, 500000),
      Col("o_orderstatus", StrK, strs = Seq("F", "O", "P")),
      Col("o_orderpriority", StrK,
        strs = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
      Col("o_orderdate", TimeK, 1995, 2001))),
    Tbl("events", Seq("event_id"), Seq(
      Col("event_id", IntK, 1, 10000),
      Col("user_id", IntK, 0, 149),
      Col("value", FloatK, 0, 490),
      Col("event_type", StrK, strs = Seq("click", "error", "purchase", "signup", "view")),
      Col("ts", TimeK, 2024, 2024))),
    Tbl("documents", Seq("doc_id"), Seq(
      Col("doc_id", IntK, 1, 500),
      Col("n_chars", IntK, 48, 553),
      Col("lang", StrK, strs = Seq("de", "en", "es", "fr", "zh")),
      Col("source", StrK, strs = Seq("src0", "src1", "src2", "src3", "src4")))),
    Tbl("customer", Seq("c_custkey"), Seq(
      Col("c_custkey", IntK, 1, 1500),
      Col("c_nationkey", IntK, 0, 24),
      Col("c_acctbal", FloatK, -1000, 10000),
      Col("c_mktsegment", StrK,
        strs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")))),
    Tbl("part", Seq("p_partkey"), Seq(
      Col("p_partkey", IntK, 1, 2000),
      Col("p_size", IntK, 1, 50),
      Col("p_retailprice", FloatK, 900, 2000),
      Col("p_brand", StrK, strs = Seq("Brand#1", "Brand#2", "Brand#3", "Brand#4")),
      Col("p_type", StrK, strs = Seq("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY")))))

  /** Two-table join frames (seeds past 200): the FROM fragment is shared
    * verbatim by both engines; only the aggregate spellings translate.
    * `orders LEFT JOIN lineitem` null-extends 257 childless orders in this
    * synthetic data — the null-edge the single-table draws can't produce.
    */
  val joins: Seq[Tbl] = {
    def byName(n: String) = tables.find(_.name == n).get
    val li = byName("lineitem"); val o = byName("orders")
    val c = byName("customer"); val p = byName("part")
    Seq(
      Tbl("lineitem JOIN orders ON l_orderkey = o_orderkey",
        Nil, li.cols ++ o.cols, allowGroupArray = false),
      Tbl("orders LEFT JOIN lineitem ON o_orderkey = l_orderkey",
        Nil, o.cols ++ li.cols, allowGroupArray = false),
      Tbl("orders JOIN customer ON o_custkey = c_custkey",
        Nil, o.cols ++ c.cols, allowGroupArray = false),
      Tbl("lineitem JOIN part ON l_partkey = p_partkey",
        Nil, li.cols ++ p.cols, allowGroupArray = false))
  }

  def queries(seeds: Range): Seq[FuzzQuery] = seeds.map(queryFor)

  def queryFor(seed: Int): FuzzQuery = {
    val rnd = new Random(seed.toLong * 1000003L + 17L)
    val name = f"fz$seed%03d"
    if (seed > 680) bitMathQuery(name, rnd)
    else if (seed > 650) jsonQuery(name, rnd)
    else if (seed > 620) stringQuery(name, rnd)
    else if (seed > 590) dateQuery(name, rnd)
    else if (seed > 560) arrayQuery(name, rnd)
    else if (seed > 530) projectionPostAggQuery(name, rnd)
    else if (seed > 510) rollupQuery(name, rnd)
    else if (seed > 480) projectionQuery(name, rnd)
    else if (seed > 450) groupLimitQuery(name, seed, rnd)
    else if (seed > 425) quantileQuery(name, rnd)
    else if (seed > 400) asofQuery(name, rnd)
    else if (seed > 360) windowQuery(name, rnd)
    else if (seed > 320) stateMergeQuery(name, rnd)
    else if (seed > 300) quotedIdentQuery(name, rnd)
    else if (seed > 260) chSqlQuery(name, rnd)
    else if (seed > 200) aggQuery(name, joins(rnd.nextInt(joins.length)), rnd)
    else {
      val t = tables(rnd.nextInt(tables.length))
      if (rnd.nextDouble() < 0.25) scalarQuery(name, t, rnd)
      else aggQuery(name, t, rnd)
    }
  }

  // ---- ChSql shim-chain queries (seeds past 260) ----------------------

  /** One CH-dialect query per seed, exercising the string-level shims end
    * to end. Every variant plants a string literal with a doubled-quote
    * escape and shim keywords INSIDE it ('it''s from (where') — masking
    * bugs in any shim corrupt the literal or miss the rewrite, and the
    * strict compare catches both.
    */
  private def chSqlQuery(name: String, rnd: Random): FuzzQuery = {
    val lit = "it''s from (where"
    val t = tables.find(_.name == "events").get
    val p = atom(t, rnd)
    val c = 20 + rnd.nextInt(100)
    rnd.nextInt(5) match {
      case 0 => // PREWHERE + trailing SETTINGS
        FuzzQuery(name,
          s"SELECT event_type AS k, '$lit' AS s, count(*) AS c, sum(user_id) AS su " +
            s"FROM events PREWHERE $p GROUP BY event_type " +
            "ORDER BY k ASC NULLS FIRST SETTINGS max_threads = 4, log_comment = 'a,b;c''d'",
          s"SELECT event_type AS k, '$lit' AS s, count(*) AS c, " +
            s"CAST(sum(user_id) AS BIGINT) AS su FROM events WHERE $p " +
            "GROUP BY event_type ORDER BY k ASC NULLS FIRST",
          viaChSql = true)
      case 1 => // scalar WITH alias inlined through the body
        FuzzQuery(name,
          s"WITH $c AS lim SELECT event_type AS k, '$lit' AS s, " +
            s"countIf(user_id < lim) AS c1, count(*) AS c FROM events WHERE $p " +
            "GROUP BY event_type ORDER BY k ASC NULLS FIRST",
          s"SELECT event_type AS k, '$lit' AS s, " +
            s"count(*) FILTER (WHERE user_id < $c) AS c1, count(*) AS c " +
            s"FROM events WHERE $p GROUP BY event_type ORDER BY k ASC NULLS FIRST",
          viaChSql = true)
      case 2 => // GROUP BY ... WITH TOTALS -> GROUPING SETS ((k), ())
        // guaranteed-non-empty predicate (uniform user ids cover every
        // residue): over EMPTY input the engines genuinely diverge —
        // DuckDB emits the () totals row (su NULL, c 0), Spark's
        // GROUPING SETS emits nothing — an edge the string shim cannot
        // and should not paper over, so the fuzz stays out of it
        val pne = s"user_id % ${2 + rnd.nextInt(8)} = ${rnd.nextInt(2)}"
        FuzzQuery(name,
          s"SELECT event_type AS k, sum(user_id) AS su, count(*) AS c " +
            s"FROM events WHERE $pne GROUP BY event_type WITH TOTALS " +
            "ORDER BY k ASC NULLS FIRST",
          s"SELECT event_type AS k, CAST(sum(user_id) AS BIGINT) AS su, " +
            s"count(*) AS c FROM events WHERE $pne " +
            "GROUP BY GROUPING SETS ((event_type), ()) ORDER BY k ASC NULLS FIRST",
          viaChSql = true)
      case 3 => // GLOBAL IN strips; literal keyword stays data
        val vals = Seq.fill(2 + rnd.nextInt(3))(pick(rnd, t.of(StrK).head.strs)).distinct
        FuzzQuery(name,
          s"SELECT event_id AS id, '$lit' AS s FROM events " +
            s"WHERE event_type GLOBAL IN (${vals.map(v => s"'$v'").mkString(", ")}) " +
            "ORDER BY id LIMIT 40",
          s"SELECT event_id AS id, '$lit' AS s FROM events " +
            s"WHERE event_type IN (${vals.map(v => s"'$v'").mkString(", ")}) " +
            "ORDER BY id LIMIT 40",
          viaChSql = true)
      case _ => // CH quoted-unit dateDiff (boundary-crossing on both sides)
        val m = 1 + rnd.nextInt(12)
        FuzzQuery(name,
          s"SELECT event_id AS id, " +
            f"dateDiff('day', ts, TIMESTAMP '2024-$m%02d-15 00:00:00') AS dd, " +
            s"'$lit' AS s FROM events WHERE $p ORDER BY id LIMIT 40",
          s"SELECT event_id AS id, " +
            f"CAST(date_diff('day', ts, TIMESTAMP '2024-$m%02d-15 00:00:00') AS BIGINT) AS dd, " +
            s"'$lit' AS s FROM events WHERE $p ORDER BY id LIMIT 40",
          viaChSql = true)
    }
  }

  /** Seeds past 300: quoted identifiers NAMED AFTER clause keywords in the
    * line of fire of the shim scans (`offset`/`where`/`limit` as aliases,
    * referenced from ORDER BY), plus an OR-bearing companion WHERE merged
    * under a PREWHERE — the two scanner edges the sixth review pass hit:
    * keyword lookalikes must be masked out of the clause-boundary scans
    * (Spark spells them `backtick`, DuckDB "double-quote"), and the merged
    * companion must keep its own parens so a top-level OR binds CH-style.
    */
  private def quotedIdentQuery(name: String, rnd: Random): FuzzQuery = {
    val lit = "it''s from (where"
    val t = tables.find(_.name == "events").get
    rnd.nextInt(3) match {
      case 0 => // PREWHERE + OR companion + alias named `offset`
        val p1 = atom(t, rnd); val p2 = atom(t, rnd); val p3 = atom(t, rnd)
        FuzzQuery(name,
          s"SELECT event_type AS `offset`, count(*) AS c, sum(user_id) AS su " +
            s"FROM events PREWHERE $p1 WHERE $p2 OR $p3 " +
            "GROUP BY event_type ORDER BY `offset` ASC NULLS FIRST",
          s"""SELECT event_type AS "offset", count(*) AS c, """ +
            s"CAST(sum(user_id) AS BIGINT) AS su " +
            s"FROM events WHERE ($p1) AND ($p2 OR $p3) " +
            """GROUP BY event_type ORDER BY "offset" ASC NULLS FIRST""",
          viaChSql = true)
      case 1 => // alias named `where`, literal keywords, SETTINGS tail
        val p = atom(t, rnd)
        FuzzQuery(name,
          s"SELECT event_type AS `where`, '$lit' AS s, count(*) AS c " +
            s"FROM events PREWHERE $p GROUP BY event_type " +
            "ORDER BY `where` ASC NULLS FIRST SETTINGS max_threads = 2",
          s"""SELECT event_type AS "where", '$lit' AS s, count(*) AS c """ +
            s"FROM events WHERE $p GROUP BY event_type " +
            """ORDER BY "where" ASC NULLS FIRST""",
          viaChSql = true)
      case _ => // WITH TOTALS under an alias named `limit`
        val pne = s"user_id % ${2 + rnd.nextInt(8)} = ${rnd.nextInt(2)}"
        FuzzQuery(name,
          s"SELECT event_type AS `limit`, sum(user_id) AS su, count(*) AS c " +
            s"FROM events WHERE $pne GROUP BY event_type WITH TOTALS " +
            "ORDER BY `limit` ASC NULLS FIRST",
          s"""SELECT event_type AS "limit", CAST(sum(user_id) AS BIGINT) AS su, """ +
            s"count(*) AS c FROM events WHERE $pne " +
            "GROUP BY GROUPING SETS ((event_type), ()) " +
            """ORDER BY "limit" ASC NULLS FIRST""",
          viaChSql = true)
    }
  }

  // ---- two-phase -State/-Merge rollups (seeds past 320) ----------------

  /** Randomized MV-shape probes of the build's central invariant: the
    * inner SELECT partial-aggregates at a FINER key set via the -State
    * spellings, the outer merges at a strict subset of those keys via
    * -Merge — and DuckDB computes the rollup DIRECTLY over raw rows. This
    * fuzzes merge-of-states == direct at combinator × key × filter × null
    * shapes the fixed corpus (q20/q23/q159) can't reach.
    */
  private def stateMergeQuery(name: String, rnd: Random): FuzzQuery = {
    val t = tables.find(_.name == "events").get
    val timeKey = pick(rnd, Seq("year", "month", "day"))
    val tk = s"$timeKey(CAST(ts AS DATE))" // identical spelling both sides
    val where = predicate(t, rnd).map(p => s" WHERE $p").getOrElse("")
    // null-edge on the UV argument: nullIf knocks one residue class out
    val k = 2 + rnd.nextInt(7); val r = rnd.nextInt(k)
    val (uvS, uvD) =
      if (rnd.nextBoolean()) (s"nullIf(user_id % $k, $r)", s"nullif(user_id % $k, $r)")
      else ("user_id", "user_id")
    // metric pool: (inner -State column, outer -Merge expr, duck mirror)
    val condS = s"event_id % ${2 + rnd.nextInt(5)} = 0"
    val pool = Seq(
      ("countIf(true) AS m_cnt", "sumMerge(m_cnt) AS m_cnt",
        "COUNT(*) AS m_cnt"),
      (s"countIf($condS) AS m_cif", s"sumMerge(m_cif) AS m_cif",
        s"COUNT(*) FILTER (WHERE $condS) AS m_cif"),
      ("sumState(CAST(user_id % 97 AS BIGINT)) AS m_si",
        "sumMerge(m_si) AS m_si",
        "CAST(SUM(user_id % 97) AS BIGINT) AS m_si"),
      ("sumState(CAST(value AS DECIMAL(18,2))) AS m_sd",
        "CAST(sumMerge(m_sd) AS DOUBLE) AS m_sd",
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS m_sd"),
      (s"groupBitmapState($uvS) AS m_uv", "groupBitmapMerge(m_uv) AS m_uv",
        s"COUNT(DISTINCT $uvD) AS m_uv"),
      (s"groupBitmapStateIf(user_id, $condS) AS m_uvi",
        "groupBitmapMerge(m_uvi) AS m_uvi",
        s"COUNT(DISTINCT user_id) FILTER (WHERE $condS) AS m_uvi"))
    val picked = rnd.shuffle(pool).take(2 + rnd.nextInt(2))
    // outer keys: event_type alone (rolling the time key away), or both
    val both = rnd.nextBoolean()
    val (outerKeys, duckKeys) =
      if (both) ("event_type, tk", s"event_type, $tk AS tk")
      else ("event_type", "event_type")
    val order =
      if (both) "event_type ASC NULLS FIRST, tk ASC NULLS FIRST"
      else "event_type ASC NULLS FIRST"
    FuzzQuery(name,
      s"SELECT $outerKeys, ${picked.map(_._2).mkString(", ")} FROM (" +
        s"SELECT event_type, $tk AS tk, ${picked.map(_._1).mkString(", ")} " +
        s"FROM events$where GROUP BY event_type, $tk" +
        s") GROUP BY ${if (both) "event_type, tk" else "event_type"} ORDER BY $order",
      s"SELECT $duckKeys, ${picked.map(_._3).mkString(", ")} " +
        s"FROM events$where GROUP BY ${if (both) s"event_type, $tk" else "event_type"} " +
        s"ORDER BY $order")
  }

  // ---- window functions + QUALIFY (seeds past 360) ---------------------

  /** Randomized OVER-window shapes vs DuckDB's independent window engine:
    * ranking × navigation (incl. the CH lagInFrame/leadInFrame spellings)
    * × framed aggregates × partitioning × direction, with a QUALIFY clause
    * (translated by [[graft.engine.ChSql]]/ChQualify on the Spark side,
    * native on DuckDB's) on a third of the seeds. Determinism discipline:
    * value-position-sensitive functions (row_number, ntile, lag/lead,
    * first/last_value, ROWS frames) only ever order by the UNIQUE
    * event_id; tie-tolerant functions (rank, dense_rank, percent_rank,
    * cume_dist, RANGE frames) may order by the tied user_id. Decimal lane
    * for float sums; BIGINT casts on DuckDB's HUGEINT window sums.
    */
  private def windowQuery(name: String, rnd: Random): FuzzQuery = {
    val t = tables.find(_.name == "events").get
    val part = rnd.nextInt(3) match {
      case 0 => ""
      case 1 => "PARTITION BY event_type "
      case 2 => s"PARTITION BY user_id % ${2 + rnd.nextInt(5)} "
    }
    val dir = if (rnd.nextBoolean()) "ASC" else "DESC"
    val uniqOrd = s"ORDER BY event_id $dir"
    def rowsFrame(): String = rnd.nextInt(3) match {
      case 0 => s"ROWS BETWEEN ${1 + rnd.nextInt(9)} PRECEDING AND CURRENT ROW"
      case 1 => s"ROWS BETWEEN ${1 + rnd.nextInt(5)} PRECEDING AND ${rnd.nextInt(5)} FOLLOWING"
      case 2 => "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
    }
    // (sparkExpr, duckExpr) pairs, aliased identically by the caller
    def draw(alias: String): (String, String) = rnd.nextInt(10) match {
      case 0 =>
        val e = s"row_number() OVER ($part$uniqOrd) AS $alias"
        (e, e)
      case 1 =>
        val f = pick(rnd, Seq("rank", "dense_rank"))
        val e = s"$f() OVER (${part}ORDER BY user_id $dir) AS $alias"
        (e, e)
      case 2 =>
        val f = pick(rnd, Seq("percent_rank", "cume_dist"))
        val e = s"round($f() OVER (${part}ORDER BY user_id $dir), 6) AS $alias"
        (e, e)
      case 3 =>
        val (s, d) = (pick(rnd, Seq("lag" -> "lag", "lead" -> "lead",
          "lagInFrame" -> "lag", "leadInFrame" -> "lead")))
        val off = rnd.nextInt(4); val dflt = -1 - rnd.nextInt(9)
        ((s"$s(event_id, $off, $dflt) OVER ($part$uniqOrd) AS $alias"),
          (s"$d(event_id, $off, $dflt) OVER ($part$uniqOrd) AS $alias"))
      case 4 =>
        val fr = rowsFrame()
        (s"CAST(sum(CAST(value AS DECIMAL(18,2))) OVER ($part$uniqOrd $fr) AS DOUBLE) AS $alias",
          s"CAST(sum(CAST(value AS DECIMAL(18,2))) OVER ($part$uniqOrd $fr) AS DOUBLE) AS $alias")
      case 5 =>
        val f = pick(rnd, Seq("min", "max")); val fr = rowsFrame()
        val e = s"$f(user_id) OVER ($part$uniqOrd $fr) AS $alias"
        (e, e)
      case 6 => // whole-partition aggregate, no ORDER BY in the window
        val p = if (part.isEmpty) "PARTITION BY event_type " else part
        (s"count(*) OVER (${p.trim}) AS $alias",
          s"CAST(count(*) OVER (${p.trim}) AS BIGINT) AS $alias")
      case 7 =>
        val f = pick(rnd, Seq("first_value", "last_value"))
        val e = s"$f(event_id) OVER ($part$uniqOrd " +
          s"ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS $alias"
        (e, e)
      case 8 =>
        val e = s"ntile(${2 + rnd.nextInt(7)}) OVER ($part$uniqOrd) AS $alias"
        (e, e)
      case _ => // RANGE frame over tied keys: peers included on both sides
        val c = 1 + rnd.nextInt(20)
        (s"sum(CAST(user_id AS BIGINT)) OVER (${part}ORDER BY user_id " +
          s"RANGE BETWEEN $c PRECEDING AND CURRENT ROW) AS $alias",
          s"CAST(sum(user_id) OVER (${part}ORDER BY user_id " +
            s"RANGE BETWEEN $c PRECEDING AND CURRENT ROW) AS BIGINT) AS $alias")
    }
    val k = 1 + rnd.nextInt(2)
    val pairs = (0 until k).map(i => draw(s"w$i"))
    val where = predicate(t, rnd).map(p => s" WHERE $p").getOrElse("")
    // QUALIFY references an ALIASED window column (ChQualify's documented
    // contract — the idiomatic CH form; raw window calls can't live in the
    // outer WHERE its rewrite produces). DuckDB resolves the alias too.
    val (qcol, qualify) =
      if (rnd.nextInt(3) == 0)
        (s", row_number() OVER ($part$uniqOrd) AS qrn",
          s" QUALIFY qrn % ${2 + rnd.nextInt(3)} = 0")
      else ("", "")
    val spark = s"SELECT event_id, ${pairs.map(_._1).mkString(", ")}$qcol " +
      s"FROM events$where$qualify ORDER BY event_id"
    val duck = s"SELECT event_id, ${pairs.map(_._2).mkString(", ")}$qcol " +
      s"FROM events$where$qualify ORDER BY event_id"
    FuzzQuery(name, spark, duck, viaChSql = true)
  }

  // ---- ASOF joins (seeds past 400) -------------------------------------

  /** The ASOF band: CH `ASOF [LEFT] JOIN` dialect text through the
    * [[graft.engine.ChAsof]] string rewrite + [[graft.operators.AsOfJoin]]
    * operator, against a hand-mirrored DuckDB LATERAL limit-1 probe (the
    * direction-agnostic oracle — DuckDB's own ASOF JOIN is not used, so
    * this is independent of its direction support). The right side is
    * unique on (user_id, rts) BY CONSTRUCTION (both engines' asof ties on
    * duplicate right timestamps are tie-break details, not semantics).
    * Views fz_asof_l / fz_asof_r are created by FuzzParitySpec on the
    * Spark side and mirrored as WITH clauses here on the DuckDB side —
    * SAME text, asofViewSql, so they cannot drift.
    */
  val asofViewSql: Seq[(String, String)] = Seq(
    "fz_asof_l" ->
      ("SELECT event_id, user_id, ts, event_type, value FROM events " +
        "WHERE event_id % 5 < 3"),
    "fz_asof_r" ->
      ("SELECT user_id, ts AS rts, MAX(event_id) AS r_eid, " +
        "CAST(COUNT(*) AS BIGINT) AS r_n FROM events " +
        "WHERE event_id % 5 >= 3 GROUP BY user_id, ts"))

  private def asofQuery(name: String, rnd: Random): FuzzQuery = {
    val (op, revOrd) = pick(rnd, Seq(
      (">=", "DESC"), (">", "DESC"), ("<=", "ASC"), ("<", "ASC")))
    val isLeft = rnd.nextBoolean()
    val joinWord = if (isLeft) "ASOF LEFT JOIN" else "ASOF JOIN"
    // left-side filter: per-row asof matching commutes with left filtering,
    // so WHERE after the join is equivalent on both sides
    val where = rnd.nextInt(3) match {
      case 0 => ""
      case 1 => s" WHERE user_id % ${2 + rnd.nextInt(4)} = ${rnd.nextInt(2)}"
      case _ => s" WHERE event_type IN ('click', 'view', 'purchase')"
    }
    // DuckDB mirror: LEFT JOIN LATERAL limit-1 probe; the inner (non-LEFT)
    // CH form drops unmatched left rows, mirrored by `r_eid IS NOT NULL`
    val duckWith = asofViewSql.map { case (v, q) => s"$v AS ($q)" }
      .mkString("WITH ", ", ", " ")
    val duckJoin =
      s"FROM fz_asof_l l LEFT JOIN LATERAL (" +
        s"SELECT rts, r_eid, r_n FROM fz_asof_r r " +
        s"WHERE r.user_id = l.user_id AND l.ts $op r.rts " +
        s"ORDER BY r.rts $revOrd LIMIT 1) m ON true"
    // both sides' WHERE: the user-drawn left filter, plus (duck only) the
    // inner-form match requirement; duck needs l. qualifiers (user_id is
    // ambiguous against the lateral subquery's correlation scope)
    def duckWhere(extraInner: Boolean): String = {
      val parts =
        (if (where.isEmpty) Nil
         else Seq(where.stripPrefix(" WHERE ").replace("user_id", "l.user_id")
           .replace("event_type", "l.event_type"))) ++
          (if (extraInner) Seq("r_eid IS NOT NULL") else Nil)
      if (parts.isEmpty) "" else parts.mkString(" WHERE (", ") AND (", ")")
    }
    if (rnd.nextBoolean()) {
      // row-probe form: enriched rows, totally ordered by the unique left id
      val spark = s"SELECT event_id, user_id, rts, r_eid, r_n " +
        s"FROM fz_asof_l l $joinWord fz_asof_r r " +
        s"ON l.user_id = r.user_id AND l.ts $op r.rts" + where +
        " ORDER BY event_id"
      val duck = s"${duckWith}SELECT event_id, l.user_id AS user_id, rts, r_eid, r_n " +
        duckJoin + duckWhere(!isLeft) + " ORDER BY event_id"
      FuzzQuery(name, spark, duck, viaChSql = true)
    } else {
      // aggregate form: per-event_type match profile
      val spark = s"SELECT event_type, count(r_eid) AS matched, " +
        s"CAST(sum(r_n) AS BIGINT) AS total_n, count(*) AS rows_out " +
        s"FROM fz_asof_l l $joinWord fz_asof_r r " +
        s"ON l.user_id = r.user_id AND l.ts $op r.rts" + where +
        " GROUP BY event_type ORDER BY event_type"
      val duck = s"${duckWith}SELECT l.event_type AS event_type, " +
        s"CAST(count(r_eid) AS BIGINT) AS matched, " +
        s"CAST(sum(r_n) AS BIGINT) AS total_n, " +
        s"CAST(count(*) AS BIGINT) AS rows_out " +
        duckJoin + duckWhere(!isLeft) +
        " GROUP BY l.event_type ORDER BY event_type"
      FuzzQuery(name, spark, duck, viaChSql = true)
    }
  }

  // ---- exact quantile levels (seeds past 425) --------------------------

  /** Random levels × argument expressions × groupings for the Excel-
    * convention exact quantiles: Inclusive (R-7) against DuckDB's OWN
    * independent quantile_cont; Exclusive against the clamped
    * h = level·(n+1) rank formula written out over a sorted list.
    */
  private def quantileQuery(name: String, rnd: Random): FuzzQuery = {
    val level = (5 + rnd.nextInt(90)) / 100.0 // 0.05 .. 0.94
    val ls = f"$level%.2f"
    // identical argument text on both sides
    val argS = rnd.nextInt(3) match {
      case 0 => s"CAST(user_id % ${7 + rnd.nextInt(90)} AS DOUBLE)"
      case 1 => "CAST(value AS DOUBLE)"
      case _ => "CAST(event_id % 1000 AS DOUBLE)"
    }
    val arg = argS
    val key = pick(rnd, Seq("event_type", "user_id % 5", "year(CAST(ts AS DATE))"))
    val where = rnd.nextInt(3) match {
      case 0 => ""
      case _ => s" WHERE event_id % ${2 + rnd.nextInt(5)} != 0"
    }
    if (rnd.nextBoolean()) {
      FuzzQuery(name,
        s"SELECT $key AS k, round(quantileExactInclusive($argS, ${ls}D), 6) AS qv " +
          s"FROM events$where GROUP BY $key ORDER BY k",
        s"SELECT $key AS k, round(quantile_cont($arg, $ls), 6) AS qv " +
          s"FROM events$where GROUP BY $key ORDER BY k")
    } else {
      FuzzQuery(name,
        s"SELECT $key AS k, round(quantileExactExclusive($argS, ${ls}D), 6) AS qv " +
          s"FROM events$where GROUP BY $key ORDER BY k",
        s"""WITH g AS (
           |  SELECT $key AS k, list($arg ORDER BY $arg) l,
           |         CAST(COUNT(*) AS DOUBLE) n
           |  FROM events$where GROUP BY $key),
           |e AS (
           |  SELECT k, l, n, GREATEST(1.0, LEAST($ls * (n + 1.0), n)) h FROM g)
           |SELECT k, round(
           |  l[CAST(FLOOR(h) AS INT)] + (h - FLOOR(h)) *
           |    (l[LEAST(CAST(FLOOR(h) AS INT) + 1, CAST(n AS INT))] -
           |     l[CAST(FLOOR(h) AS INT)]), 6) AS qv
           |FROM e ORDER BY k""".stripMargin)
    }
  }

  // ---- per-group limit family (seeds past 450) -------------------------

  /** CH `LIMIT [o,] n BY cols` / `SELECT DISTINCT ON (cols)` / `LIMIT n
    * WITH TIES` dialect text through the ChLimitBy / ChDistinctOn /
    * ChSql.withTies string rewrites, vs independent DuckDB spellings:
    * QUALIFY row_number() for LIMIT BY, DuckDB's NATIVE `DISTINCT ON`
    * for the distinct form, QUALIFY rank() for WITH TIES. The WITH TIES
    * draws select ONLY the ordering column, so intra-tie-group row order
    * cannot affect the compare (tie rows are identical).
    */
  private def groupLimitQuery(name: String, seed: Int, rnd: Random): FuzzQuery = {
    val dir = if (rnd.nextBoolean()) "ASC" else "DESC"
    if (seed <= 462) { // LIMIT [o,] n BY event_type
      val n = 1 + rnd.nextInt(5)
      val off = if (rnd.nextBoolean()) rnd.nextInt(3) else 0
      val byClause =
        if (off == 0) s"LIMIT $n BY event_type"
        else if (rnd.nextBoolean()) s"LIMIT $off, $n BY event_type"
        else s"LIMIT $n OFFSET $off BY event_type"
      val finalLimit = if (rnd.nextBoolean()) s" LIMIT ${5 + rnd.nextInt(20)}" else ""
      val where = rnd.nextInt(3) match {
        case 0 => ""
        case _ => s" WHERE user_id % ${2 + rnd.nextInt(5)} != 1"
      }
      val sort = s"ORDER BY value $dir, event_id"
      FuzzQuery(name,
        s"SELECT event_type, event_id, user_id, value FROM events$where " +
          s"$sort $byClause$finalLimit",
        s"SELECT event_type, event_id, user_id, value FROM events$where " +
          s"QUALIFY row_number() OVER (PARTITION BY event_type $sort) " +
          s"BETWEEN ${off + 1} AND ${off + n} $sort$finalLimit",
        viaChSql = true)
    } else if (seed <= 470) { // DISTINCT ON — DuckDB's native form mirrors
      val where = rnd.nextInt(3) match {
        case 0 => ""
        case _ => s" WHERE event_id % ${2 + rnd.nextInt(4)} = 0"
      }
      val keys = if (rnd.nextBoolean()) "event_type"
        else s"event_type, user_id % ${2 + rnd.nextInt(3)}"
      val sort = s"ORDER BY value $dir, event_id"
      FuzzQuery(name,
        s"SELECT DISTINCT ON ($keys) event_type, event_id, user_id, value " +
          s"FROM events$where $sort",
        s"SELECT * FROM (SELECT DISTINCT ON ($keys) " +
          s"event_type, event_id, user_id, value FROM events$where $sort) " +
          s"ORDER BY value $dir, event_id",
        viaChSql = true)
    } else { // LIMIT n WITH TIES over a heavily-tied single column
      val n = 1 + rnd.nextInt(40)
      val (tbl, c) = pick(rnd, Seq(
        ("lineitem", "l_quantity"), ("lineitem", "l_linenumber"),
        ("orders", "o_orderstatus"), ("events", "event_type")))
      val where = rnd.nextInt(3) match {
        case 0 => ""
        case _ => s" WHERE $c IS NOT NULL"
      }
      FuzzQuery(name,
        s"SELECT $c FROM $tbl$where ORDER BY $c $dir LIMIT $n WITH TIES",
        s"SELECT $c FROM $tbl$where " +
          s"QUALIFY rank() OVER (ORDER BY $c $dir) <= $n ORDER BY $c $dir",
        viaChSql = true)
    }
  }

  // ---- projection routing (seeds past 480) -----------------------------

  /** Randomized aggregates over the projection-registered events source:
    * the Spark side is a plain raw-events query the ProjectionRewrite
    * must answer from the state table (the harness asserts the routed
    * plan), DuckDB aggregates the raw rows directly — so every seed
    * differentially proves the routing detour value-invisible at
    * grouping × metric × key-filter shapes the fixed q171 can't reach.
    * Groupings/filters are key-expressible BY CONSTRUCTION (the table's
    * keys are (day = CAST(ts AS DATE), event_type)); the metric pool is
    * exactly the registered def battery, avg(user_id) exercising the
    * sum/count decomposition.
    */
  private def projectionQuery(name: String, rnd: Random): FuzzQuery = {
    val groupings: Seq[(String, String)] = pick(rnd, Seq(
      Seq("event_type" -> "g_et"),
      Seq("CAST(ts AS DATE)" -> "g_day"),
      Seq("event_type" -> "g_et", "CAST(ts AS DATE)" -> "g_day"),
      Seq("year(CAST(ts AS DATE))" -> "g_y", "event_type" -> "g_et"),
      Seq("month(CAST(ts AS DATE))" -> "g_m")))
    val pool: Seq[(String, String)] = Seq(
      ("count(1) AS m_cnt", "CAST(COUNT(*) AS BIGINT) AS m_cnt"),
      ("CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS m_vs",
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS m_vs"),
      ("count(DISTINCT user_id) AS m_uv",
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS m_uv"),
      ("min(value) AS m_min", "MIN(value) AS m_min"),
      ("max(value) AS m_max", "MAX(value) AS m_max"),
      ("count(user_id) AS m_uc", "CAST(COUNT(user_id) AS BIGINT) AS m_uc"),
      ("avg(user_id) AS m_au", "AVG(user_id) AS m_au"))
    val picked = rnd.shuffle(pool).take(1 + rnd.nextInt(4))
    val where = rnd.nextInt(4) match {
      case 0 => ""
      case 1 => " WHERE event_type IN ('click', 'view', 'purchase')"
      case 2 => s" WHERE CAST(ts AS DATE) >= DATE '2024-01-${10 + rnd.nextInt(15)}'"
      case _ => s" WHERE CAST(ts AS DATE) < DATE '2024-01-${8 + rnd.nextInt(18)}' " +
        s"AND event_type != 'error'"
    }
    val gSel = groupings.map { case (e, a) => s"$e AS $a" }.mkString(", ")
    val gBy = groupings.map(_._1).mkString(", ")
    val ord = groupings.map(_._2).map(a => s"$a ASC NULLS FIRST").mkString(", ")
    FuzzQuery(name,
      s"SELECT $gSel, ${picked.map(_._1).mkString(", ")} FROM events$where " +
        s"GROUP BY $gBy ORDER BY $ord",
      s"SELECT $gSel, ${picked.map(_._2).mkString(", ")} FROM events$where " +
        s"GROUP BY $gBy ORDER BY $ord",
      mustRoute = true)
  }

  // ---- projection routing under post-aggregate clauses (seeds past 530) --

  /** The routed Aggregate with machinery ABOVE it: HAVING over merged
    * metrics (incl. the avg decomposition and metrics HAVING-only, not
    * selected), ORDER BY a metric + LIMIT over the routed output, and
    * mixed UNION ALL where one branch routes and the other (an
    * unregistered aggregate) must stay raw — each shape differentially
    * proved value-invisible vs DuckDB on the raw rows, with the plan
    * asserted routed (or part-routed for the unions).
    */
  private def projectionPostAggQuery(name: String, rnd: Random): FuzzQuery = {
    val groupings: Seq[(String, String)] = pick(rnd, Seq(
      Seq("event_type" -> "g_et"),
      Seq("CAST(ts AS DATE)" -> "g_day"),
      Seq("event_type" -> "g_et", "CAST(ts AS DATE)" -> "g_day"),
      Seq("month(CAST(ts AS DATE))" -> "g_m", "event_type" -> "g_et")))
    val gSel = groupings.map { case (e, a) => s"$e AS $a" }.mkString(", ")
    val gBy = groupings.map(_._1).mkString(", ")
    val gOrd = groupings.map(_._2).map(a => s"$a ASC NULLS FIRST").mkString(", ")
    val where = rnd.nextInt(3) match {
      case 0 => ""
      case 1 => " WHERE event_type IN ('click', 'view', 'purchase')"
      case _ => s" WHERE CAST(ts AS DATE) >= DATE '2024-01-${8 + rnd.nextInt(16)}'"
    }
    // (spark spelling, duckdb spelling) pairs — identical semantics and
    // ONE shared threshold per pair; both engines compute the identical
    // doubles (sums < 2^53), so threshold compares can never disagree at
    // the boundary
    val (h1, h2, h3, h4, h5) = (5 + rnd.nextInt(60), 3 + rnd.nextInt(40),
      100 + rnd.nextInt(400), 200 + rnd.nextInt(500), 300 + rnd.nextInt(600))
    val havingPool: Seq[(String, String)] = Seq(
      (s"count(1) > $h1", s"COUNT(*) > $h1"),
      (s"count(DISTINCT user_id) >= $h2", s"COUNT(DISTINCT user_id) >= $h2"),
      (s"min(value) < $h3", s"MIN(value) < $h3"),
      (s"max(value) > $h4", s"MAX(value) > $h4"),
      (s"avg(user_id) > $h5.5", s"AVG(user_id) > $h5.5"))
    rnd.nextInt(3) match {
      case 0 => // HAVING over merged metrics (some HAVING-only)
        val hs = rnd.shuffle(havingPool).take(1 + rnd.nextInt(2))
        FuzzQuery(name,
          s"SELECT $gSel, count(1) AS m_cnt, " +
            s"CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS m_vs " +
            s"FROM events$where GROUP BY $gBy " +
            s"HAVING ${hs.map(_._1).mkString(" AND ")} ORDER BY $gOrd",
          s"SELECT $gSel, CAST(COUNT(*) AS BIGINT) AS m_cnt, " +
            s"CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS m_vs " +
            s"FROM events$where GROUP BY $gBy " +
            s"HAVING ${hs.map(_._2).mkString(" AND ")} ORDER BY $gOrd",
          mustRoute = true)
      case 1 => // ORDER BY a metric + LIMIT above the routed aggregate
        val n = 2 + rnd.nextInt(12)
        val dir = if (rnd.nextBoolean()) "DESC" else "ASC"
        FuzzQuery(name,
          s"SELECT $gSel, count(1) AS m_cnt, count(DISTINCT user_id) AS m_uv " +
            s"FROM events$where GROUP BY $gBy " +
            s"ORDER BY m_cnt $dir, $gOrd LIMIT $n",
          s"SELECT $gSel, CAST(COUNT(*) AS BIGINT) AS m_cnt, " +
            s"CAST(COUNT(DISTINCT user_id) AS BIGINT) AS m_uv " +
            s"FROM events$where GROUP BY $gBy " +
            s"ORDER BY m_cnt $dir, $gOrd LIMIT $n",
          mustRoute = true)
      case _ => // mixed union: one branch routes, the other must stay raw
        // sum(event_id) is not a registered def — that branch CANNOT route
        FuzzQuery(name,
          s"SELECT event_type AS g_et, 'routed' AS src, " +
            s"CAST(count(1) AS BIGINT) AS m FROM events$where GROUP BY event_type " +
            s"UNION ALL " +
            s"SELECT event_type AS g_et, 'raw' AS src, " +
            s"CAST(sum(event_id) AS BIGINT) AS m FROM events$where GROUP BY event_type " +
            s"ORDER BY g_et, src",
          s"SELECT event_type AS g_et, 'routed' AS src, " +
            s"CAST(COUNT(*) AS BIGINT) AS m FROM events$where GROUP BY event_type " +
            s"UNION ALL " +
            s"SELECT event_type AS g_et, 'raw' AS src, " +
            s"CAST(SUM(event_id) AS BIGINT) AS m FROM events$where GROUP BY event_type " +
            s"ORDER BY g_et, src",
          mixedRoute = true)
    }
  }

  // ---- WITH ROLLUP / CUBE / TOTALS (seeds past 510) ---------------------

  /** CH `GROUP BY ... WITH ROLLUP|CUBE|TOTALS` through the ChSql rewrites
    * vs DuckDB's NATIVE ROLLUP/CUBE/GROUPING SETS — independent
    * super-aggregate engines computing the same subtotal lattice. Keys are
    * non-null by construction so NULL marks subtotal rows unambiguously
    * and (k1, k2) stays a total order across cells, subtotals, and the
    * grand total (NULLS FIRST).
    */
  private def rollupQuery(name: String, rnd: Random): FuzzQuery = {
    val keys = pick(rnd, Seq(
      Seq("event_type"),
      Seq("event_type", "user_id % 5"),
      Seq("year(CAST(ts AS DATE))", "event_type"),
      Seq("event_type", "user_id % 3", "event_id % 2")))
    val form = rnd.nextInt(3) match {
      case 0 => "WITH ROLLUP"
      case 1 => "WITH CUBE"
      case _ => "WITH TOTALS"
    }
    val duckBy = form match {
      case "WITH ROLLUP" => s"ROLLUP(${keys.mkString(", ")})"
      case "WITH CUBE" => s"CUBE(${keys.mkString(", ")})"
      case _ => s"GROUPING SETS ((${keys.mkString(", ")}), ())"
    }
    val aggs = rnd.shuffle(Seq(
      ("count(1) AS m_cnt", "CAST(COUNT(*) AS BIGINT) AS m_cnt"),
      ("CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS m_vs",
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS m_vs"),
      ("uniqExact(user_id) AS m_uv",
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS m_uv"),
      ("min(event_id) AS m_min", "MIN(event_id) AS m_min"))).take(1 + rnd.nextInt(3))
    // Non-empty-result predicates ONLY: over EMPTY input Spark's grouping
    // sets emit no rows at all where DuckDB (and the SQL standard) emit
    // the () grand-total row — the divergence ChSql's scaladoc documents.
    // The fixed corpus pins that note; fuzzing it would just re-find it.
    val where = rnd.nextInt(3) match {
      case 0 => ""
      case 1 => s" WHERE user_id % ${2 + rnd.nextInt(5)} != 1"
      case _ => " WHERE event_type IN ('click', 'view', 'error', 'signup')"
    }
    val kSel = keys.zipWithIndex.map { case (k, i) => s"$k AS k$i" }.mkString(", ")
    val ord = keys.indices.map(i => s"k$i ASC NULLS FIRST").mkString(", ")
    FuzzQuery(name,
      s"SELECT $kSel, ${aggs.map(_._1).mkString(", ")} FROM events$where " +
        s"GROUP BY ${keys.mkString(", ")} $form ORDER BY $ord",
      s"SELECT $kSel, ${aggs.map(_._2).mkString(", ")} FROM events$where " +
        s"GROUP BY $duckBy ORDER BY $ord",
      viaChSql = true)
  }

  /** The array-lambda band (seeds past 560): CH's array battery — the
    * lambda-FIRST argument order (arrayMap/Filter/Exists/Count), the
    * (offset, length) 1-based arraySlice, CH's 0-when-absent indexOf,
    * sort/reverse/distinct/push/pop/concat composition — chained 0-2 deep
    * over arrays built row-wise from the table's own integer columns
    * (BIGINT lanes on both sides), against DuckDB's independently-spelled
    * list_* battery (list-LAST lambdas, list_slice's INCLUSIVE end index,
    * coalesce-0 for list_sum/list_position's NULL returns). Reducers are
    * total on EMPTY arrays too (a filter chain can drain the array):
    * sum/uniq/has/indexOf/exists/count coalesce to their CH empties, and
    * min/max agree on NULL-for-empty in both engines. A third of the
    * seeds source the array from arraySort(groupArray(k)) under GROUP BY
    * instead of row-wise construction — the collect order is partition-
    * dependent, so the sort is load-bearing for determinism.
    */
  private def arrayQuery(name: String, rnd: Random): FuzzQuery = {
    val pool = tables.filter(_.of(IntK).size >= 2)
    val t = pool(rnd.nextInt(pool.length))
    val intCols = t.of(IntK)

    // base array: 3-5 BIGINT elements derived from two integer columns —
    // identical element text on both sides, only the constructor differs
    def base(): (String, String) = {
      val c1 = pick(rnd, intCols).name
      val c2 = pick(rnd, intCols).name
      val k = 1 + rnd.nextInt(9)
      val elems = Seq(
        s"CAST($c1 AS BIGINT)", s"CAST($c2 AS BIGINT)",
        s"CAST($c1 + $c2 AS BIGINT)", s"CAST($c1 % $k + 1 AS BIGINT)",
        s"CAST($k AS BIGINT)").take(3 + rnd.nextInt(3))
      (s"array(${elems.mkString(", ")})", s"[${elems.mkString(", ")}]")
    }

    def step(sp: String, du: String): (String, String) = rnd.nextInt(10) match {
      case 0 =>
        val m = 2 + rnd.nextInt(3); val b = rnd.nextInt(6)
        (s"arrayMap(x -> x * $m + $b, $sp)", s"list_transform($du, x -> x * $m + $b)")
      case 1 =>
        // nonneg elements only, so % agrees across engines
        val d = 2 + rnd.nextInt(3); val r = rnd.nextInt(d)
        (s"arrayFilter(x -> x % $d = $r, $sp)", s"list_filter($du, x -> x % $d = $r)")
      case 2 => (s"arraySort($sp)", s"list_sort($du)")
      case 3 => (s"arrayReverseSort($sp)", s"list_reverse_sort($du)")
      case 4 => (s"arrayReverse($sp)", s"list_reverse($du)")
      case 5 =>
        // CH arrayDistinct keeps first occurrence, DuckDB list_distinct
        // is unordered — the trailing sort makes the pair comparable
        (s"arraySort(arrayDistinct($sp))", s"list_sort(list_distinct($du))")
      case 6 =>
        val k1 = rnd.nextInt(20); val k2 = rnd.nextInt(20)
        (s"arrayConcat($sp, array(CAST($k1 AS BIGINT), CAST($k2 AS BIGINT)))",
         s"list_concat($du, [CAST($k1 AS BIGINT), CAST($k2 AS BIGINT)])")
      case 7 =>
        val k = rnd.nextInt(20)
        if (rnd.nextBoolean())
          (s"arrayPushBack($sp, CAST($k AS BIGINT))", s"list_append($du, CAST($k AS BIGINT))")
        else
          (s"arrayPushFront($sp, CAST($k AS BIGINT))", s"list_prepend(CAST($k AS BIGINT), $du)")
      case 8 =>
        val o = 1 + rnd.nextInt(2); val len = 1 + rnd.nextInt(3)
        (s"arraySlice($sp, $o, $len)", s"list_slice($du, $o, ${o + len - 1})")
      case _ =>
        // both sides are EMPTY-safe: graft's pops return [] on [], and
        // list_slice clamps (len([])-1 = -1 / begin 2 past the end -> [])
        if (rnd.nextBoolean())
          (s"arrayPopBack($sp)", s"list_slice($du, 1, len($du) - 1)")
        else
          (s"arrayPopFront($sp)", s"list_slice($du, 2, len($du))")
    }

    def reducer(sp: String, du: String, alias: String): (String, String) =
      rnd.nextInt(7) match {
        case 0 => (s"CAST(arraySum($sp) AS BIGINT) AS $alias",
                   s"CAST(coalesce(list_sum($du), 0) AS BIGINT) AS $alias")
        case 1 => (s"CAST(arrayUniq($sp) AS BIGINT) AS $alias",
                   s"CAST(len(list_distinct($du)) AS BIGINT) AS $alias")
        case 2 =>
          val k = rnd.nextInt(30)
          (s"has($sp, CAST($k AS BIGINT)) AS $alias",
           s"coalesce(list_contains($du, CAST($k AS BIGINT)), false) AS $alias")
        case 3 =>
          val k = rnd.nextInt(30)
          (s"CAST(indexOf($sp, CAST($k AS BIGINT)) AS BIGINT) AS $alias",
           s"CAST(coalesce(list_position($du, CAST($k AS BIGINT)), 0) AS BIGINT) AS $alias")
        case 4 =>
          val k = rnd.nextInt(100)
          (s"arrayExists(x -> x > $k, $sp) AS $alias",
           s"len(list_filter($du, x -> x > $k)) > 0 AS $alias")
        case 5 =>
          val k = rnd.nextInt(100)
          (s"CAST(arrayCount(x -> x > $k, $sp) AS BIGINT) AS $alias",
           s"CAST(len(list_filter($du, x -> x > $k)) AS BIGINT) AS $alias")
        case _ =>
          if (rnd.nextBoolean())
            (s"CAST(arrayMin($sp) AS BIGINT) AS $alias",
             s"CAST(list_aggregate($du, 'min') AS BIGINT) AS $alias")
          else
            (s"CAST(arrayMax($sp) AS BIGINT) AS $alias",
             s"CAST(list_aggregate($du, 'max') AS BIGINT) AS $alias")
      }

    def chain(start: (String, String), maxSteps: Int): (String, String) = {
      var (sp, du) = start
      (0 until rnd.nextInt(maxSteps + 1)).foreach { _ =>
        val (s2, d2) = step(sp, du); sp = s2; du = d2
      }
      (sp, du)
    }

    val where = predicate(t, rnd).map(p => s" WHERE $p").getOrElse("")
    if (rnd.nextInt(3) == 0 && t.allowGroupArray && t.of(StrK).nonEmpty) {
      val g = pick(rnd, t.of(StrK)).name
      val k = pick(rnd, intCols).name
      val (sp, du) = chain(
        (s"arraySort(groupArray(CAST($k AS BIGINT)))",
         s"list_sort(list(CAST($k AS BIGINT)))"), maxSteps = 2)
      val (rs, rd) = reducer(sp, du, "v")
      FuzzQuery(name,
        s"SELECT $g AS g, $rs FROM ${t.name}$where GROUP BY $g ORDER BY g",
        s"SELECT $g AS g, $rd FROM ${t.name}$where GROUP BY $g ORDER BY g")
    } else {
      val pairs = (0 until 1 + rnd.nextInt(2)).map { i =>
        val (sp, du) = chain(base(), maxSteps = 2)
        reducer(sp, du, s"a$i")
      }
      def render(side: ((String, String)) => String): String = {
        val sel = (t.uniqueKey ++ pairs.map(side)).mkString(", ")
        s"SELECT $sel FROM ${t.name}$where ORDER BY ${t.totalOrder.mkString(", ")} LIMIT 60"
      }
      FuzzQuery(name, render(_._1), render(_._2))
    }
  }

  /** The date/time band (seeds past 590): CH's calendar battery — the
    * toStartOf* truncation family (DATE-typed like CH), toMonday,
    * Monday=1 toDayOfWeek, ISO weeks, toYYYYMM packing, last-day /
    * month-name / formatDateTime rendering, addDate/subDate arithmetic,
    * and (timestamp columns) time-of-day extraction plus epoch-anchored
    * hour/day truncation — against DuckDB's independently-spelled
    * calendar functions (isodow, weekofyear, date_trunc + CAST,
    * last_day, monthname, strftime, INTERVAL arithmetic, epoch). A third
    * of the seeds GROUP BY the drawn expression (ordinal-keyed on both
    * sides) instead of probing row-wise.
    */
  private def dateQuery(name: String, rnd: Random): FuzzQuery = {
    val pool = tables.filter(_.of(TimeK).nonEmpty)
    val t = pool(rnd.nextInt(pool.length))
    val c = pick(rnd, t.of(TimeK)).name
    val isTs = t.name == "events" // ts is a timestamp; the other cols are DATEs

    def draw(alias: String): (String, String) = {
      val base = Seq[() => (String, String)](
        () => (s"toYear($c) AS $alias", s"year($c) AS $alias"),
        () => (s"toQuarter($c) AS $alias", s"quarter($c) AS $alias"),
        () => (s"toMonth($c) AS $alias", s"month($c) AS $alias"),
        () => (s"toDayOfMonth($c) AS $alias", s"day($c) AS $alias"),
        // CH counts Monday = 1, DuckDB's ISO spelling agrees
        () => (s"toDayOfWeek($c) AS $alias", s"isodow($c) AS $alias"),
        () => (s"toDayOfYear($c) AS $alias", s"dayofyear($c) AS $alias"),
        () => (s"toISOWeek($c) AS $alias", s"weekofyear($c) AS $alias"),
        () => (s"CAST(toYYYYMM($c) AS BIGINT) AS $alias",
               s"CAST(year($c)*100 + month($c) AS BIGINT) AS $alias"),
        () => (s"toStartOfMonth($c) AS $alias",
               s"CAST(date_trunc('month', $c) AS DATE) AS $alias"),
        () => (s"toStartOfQuarter($c) AS $alias",
               s"CAST(date_trunc('quarter', $c) AS DATE) AS $alias"),
        () => (s"toStartOfYear($c) AS $alias",
               s"CAST(date_trunc('year', $c) AS DATE) AS $alias"),
        () => (s"toMonday($c) AS $alias",
               s"CAST(date_trunc('week', $c) AS DATE) AS $alias"),
        () => (s"toLastDayOfMonth($c) AS $alias",
               s"last_day(CAST($c AS DATE)) AS $alias"),
        () => (s"monthName($c) AS $alias", s"monthname($c) AS $alias"),
        () => (s"formatDateTime($c, '%Y-%m-%d') AS $alias",
               s"strftime($c, '%Y-%m-%d') AS $alias"),
        () => { val k = 1 + rnd.nextInt(40)
          (s"CAST(addDate($c, $k) AS DATE) AS $alias",
           s"CAST($c + INTERVAL ($k) DAY AS DATE) AS $alias") },
        () => { val k = 1 + rnd.nextInt(40)
          (s"CAST(subDate($c, $k) AS DATE) AS $alias",
           s"CAST($c - INTERVAL ($k) DAY AS DATE) AS $alias") })
      val tod = Seq[() => (String, String)](
        () => (s"toHour($c) AS $alias", s"hour($c) AS $alias"),
        () => (s"toMinute($c) AS $alias", s"minute($c) AS $alias"),
        () => (s"toSecond($c) AS $alias", s"second($c) AS $alias"),
        // epoch-anchored truncation: integer compare, no timestamp-dtype
        // friction (both sessions run UTC)
        () => (s"CAST(toUnixTimestamp(toStartOfHour($c)) AS BIGINT) AS $alias",
               s"CAST(epoch(date_trunc('hour', $c)) AS BIGINT) AS $alias"),
        () => (s"CAST(toUnixTimestamp(toStartOfDay($c)) AS BIGINT) AS $alias",
               s"CAST(epoch(date_trunc('day', $c)) AS BIGINT) AS $alias"))
      pick(rnd, if (isTs) base ++ tod else base)()
    }

    batteryQuery(name, t, rnd, draw, groupOdds = 3)
  }

  /** The string band (seeds past 620): CH's string battery — split +
    * rejoin (splitByChar/arrayStringConcat), CH-argument-order position,
    * non-overlapping countSubstrings, pad/trim families, literal and
    * regexp replacement, base64 round-trips, UTF8-suffixed basics,
    * multiSearchAny, starts/endsWith — against DuckDB's independently-
    * spelled battery (string_split/array_to_string, `position(n IN h)`,
    * the length-difference counting identity, lpad/rpad/trim,
    * replace/regexp_replace('g'), encode/to_base64/from_base64/decode,
    * contains-OR chains). Base strings derive from the table's own
    * string columns with engine-identical builders (concat/upper/lower),
    * and needles include absent ones (position/count must agree on 0).
    */
  private def stringQuery(name: String, rnd: Random): FuzzQuery = {
    val pool = tables.filter(_.of(StrK).size >= 2)
    val t = pool(rnd.nextInt(pool.length))
    def sc = pick(rnd, t.of(StrK)).name

    // derived base string — IDENTICAL SQL text on both sides
    def base(): String = rnd.nextInt(4) match {
      case 0 => sc
      case 1 => s"concat(upper($sc), '-', $sc)"
      case 2 => s"concat($sc, '#', $sc)"
      case _ => s"lower(concat($sc, '_', $sc))"
    }
    val needles = Seq("A", "E", "R", "-", "1", "o", "ING", "UR", "zq")

    def draw(alias: String): (String, String) = {
      val b = base()
      val n = pick(rnd, needles)
      rnd.nextInt(15) match {
        case 0 => (s"arrayStringConcat(splitByChar('-', $b), '|') AS $alias",
                   s"array_to_string(string_split($b, '-'), '|') AS $alias")
        case 1 => (s"CAST(arrayCount(x -> true, splitByChar('-', $b)) AS BIGINT) AS $alias",
                   s"CAST(len(string_split($b, '-')) AS BIGINT) AS $alias")
        case 2 => (s"CAST(position($b, '$n') AS BIGINT) AS $alias",
                   s"CAST(position('$n' IN $b) AS BIGINT) AS $alias")
        case 3 => (s"CAST(countSubstrings($b, '$n') AS BIGINT) AS $alias",
                   s"CAST((length($b) - length(replace($b, '$n', ''))) / " +
                     s"length('$n') AS BIGINT) AS $alias")
        case 4 =>
          val w = 8 + rnd.nextInt(8)
          (s"leftPad($b, $w, '*') AS $alias", s"lpad($b, $w, '*') AS $alias")
        case 5 =>
          val w = 8 + rnd.nextInt(8)
          (s"rightPad($b, $w, '.') AS $alias", s"rpad($b, $w, '.') AS $alias")
        case 6 => (s"trimBoth(concat('  ', $b, ' ')) AS $alias",
                   s"trim(concat('  ', $b, ' ')) AS $alias")
        case 7 => (s"trimLeft(concat('  ', $b)) AS $alias",
                   s"ltrim(concat('  ', $b)) AS $alias")
        case 8 => (s"replaceAll($b, '$n', '@') AS $alias",
                   s"replace($b, '$n', '@') AS $alias")
        case 9 => (s"replaceRegexpAll($b, '[AEIOU]', '#') AS $alias",
                   s"regexp_replace($b, '[AEIOU]', '#', 'g') AS $alias")
        case 10 => (s"base64Decode(base64Encode($b)) AS $alias",
                    s"decode(from_base64(to_base64(encode($b)))) AS $alias")
        case 11 =>
          val o = 1 + rnd.nextInt(3); val l = 1 + rnd.nextInt(5)
          (s"substringUTF8($b, $o, $l) AS $alias", s"substring($b, $o, $l) AS $alias")
        case 12 => (s"reverseUTF8($b) AS $alias", s"reverse($b) AS $alias")
        case 13 => (s"multiSearchAny($b, array('$n', 'zq')) AS $alias",
                    s"(contains($b, '$n') OR contains($b, 'zq')) AS $alias")
        case _ =>
          if (rnd.nextBoolean())
            (s"startsWith($b, '$n') AS $alias", s"starts_with($b, '$n') AS $alias")
          else
            (s"endsWith($b, '$n') AS $alias", s"ends_with($b, '$n') AS $alias")
      }
    }

    batteryQuery(name, t, rnd, draw, groupOdds = 4)
  }

  /** The JSON band (seeds past 650): CH's JSON family — name-keyed
    * JSONExtractString/Int/Float, JSONHas (incl. missing keys, where this
    * engine and DuckDB agree on NULL/false), sorted JSONExtractKeys,
    * JSONLength's array-length-or-key-count contract, raw extraction —
    * over per-row JSON built from the table's own columns with an
    * engine-identical concat builder (CAST AS STRING is a VARCHAR alias
    * in DuckDB; the categorical string columns carry no quotes to
    * escape), against DuckDB's path-keyed json_extract battery.
    */
  private def jsonQuery(name: String, rnd: Random): FuzzQuery = {
    val pool = tables.filter(t => t.of(IntK).nonEmpty && t.of(StrK).nonEmpty)
    val t = pool(rnd.nextInt(pool.length))
    val ik = pick(rnd, t.of(IntK)).name
    val ik2 = pick(rnd, t.of(IntK)).name
    val sc = pick(rnd, t.of(StrK)).name
    val j = s"""concat('{"id":', CAST($ik AS STRING), ',"tag":"', $sc, """ +
      s"""'","f":', CAST($ik2 AS STRING), '.5,"arr":[1,', CAST($ik2 AS STRING), ']}')"""

    def draw(alias: String): (String, String) = rnd.nextInt(9) match {
      case 0 => (s"JSONExtractString($j, 'tag') AS $alias",
                 s"json_extract_string($j, '$$.tag') AS $alias")
      case 1 => (s"JSONExtractInt($j, 'id') AS $alias",
                 s"CAST(json_extract($j, '$$.id') AS BIGINT) AS $alias")
      case 2 => (s"JSONExtractFloat($j, 'f') AS $alias",
                 s"CAST(json_extract($j, '$$.f') AS DOUBLE) AS $alias")
      case 3 => (s"JSONHas($j, 'tag') AS $alias",
                 s"json_extract($j, '$$.tag') IS NOT NULL AS $alias")
      case 4 => // missing key: NULL through the typed casts, false for Has
        if (rnd.nextBoolean())
          (s"JSONExtractInt($j, 'zz') AS $alias",
           s"CAST(json_extract($j, '$$.zz') AS BIGINT) AS $alias")
        else
          (s"JSONHas($j, 'zz') AS $alias",
           s"json_extract($j, '$$.zz') IS NOT NULL AS $alias")
      case 5 => (s"arrayStringConcat(arraySort(JSONExtractKeys($j)), ',') AS $alias",
                 s"array_to_string(list_sort(json_keys($j)), ',') AS $alias")
      case 6 => (s"CAST(JSONLength($j, 'arr') AS BIGINT) AS $alias",
                 s"CAST(json_array_length($j, '$$.arr') AS BIGINT) AS $alias")
      case 7 => (s"CAST(JSONLength($j) AS BIGINT) AS $alias",
                 s"CAST(len(json_keys($j)) AS BIGINT) AS $alias")
      case _ => (s"JSONExtractRaw($j, 'arr') AS $alias",
                 s"CAST(json_extract($j, '$$.arr') AS VARCHAR) AS $alias")
    }
    batteryQuery(name, t, rnd, draw, groupOdds = 4)
  }

  /** The bit/int-math band (seeds past 680): CH's exact-integer scalar
    * battery — bitAnd/Or/Xor/Not, shifts, bitCount, bitTest, intDiv,
    * multiIf — against DuckDB's independently-spelled operators
    * (`&`/`|`/xor()/`~`/`<<`/`>>`/bit_count/`//`/CASE). All-integer
    * arithmetic: no libm, no rounding band, bit-exact by construction
    * (shift counts stay below the width so neither engine's wrap rule
    * fires). nullIf/ifnull ride the same spelling on both engines,
    * injecting the null edge through the typed casts.
    */
  private def bitMathQuery(name: String, rnd: Random): FuzzQuery = {
    val pool = tables.filter(_.of(IntK).nonEmpty)
    val t = pool(rnd.nextInt(pool.length))
    def draw(alias: String): (String, String) = {
      val ik = pick(rnd, t.of(IntK)).name
      val k = 1 + rnd.nextInt(255)
      rnd.nextInt(11) match {
        case 0 => (s"CAST(bitAnd($ik, $k) AS BIGINT) AS $alias",
                   s"CAST(($ik & $k) AS BIGINT) AS $alias")
        case 1 => (s"CAST(bitOr($ik, $k) AS BIGINT) AS $alias",
                   s"CAST(($ik | $k) AS BIGINT) AS $alias")
        case 2 => (s"CAST(bitXor($ik, $k) AS BIGINT) AS $alias",
                   s"CAST(xor(CAST($ik AS BIGINT), CAST($k AS BIGINT)) AS BIGINT) AS $alias")
        case 3 => (s"CAST(bitNot($ik) AS BIGINT) AS $alias",
                   s"CAST((~CAST($ik AS BIGINT)) AS BIGINT) AS $alias")
        case 4 =>
          val s = 1 + rnd.nextInt(11)
          (s"CAST(bitShiftLeft($ik % 256, $s) AS BIGINT) AS $alias",
           s"CAST(((CAST($ik AS BIGINT) % 256) << $s) AS BIGINT) AS $alias")
        case 5 =>
          val s = 1 + rnd.nextInt(7)
          (s"CAST(bitShiftRight($ik, $s) AS BIGINT) AS $alias",
           s"CAST((CAST($ik AS BIGINT) >> $s) AS BIGINT) AS $alias")
        case 6 => (s"CAST(bitCount($ik) AS INT) AS $alias",
                   s"CAST(bit_count(CAST($ik AS BIGINT)) AS INT) AS $alias")
        case 7 =>
          val b = rnd.nextInt(8)
          (s"CAST(bitTest($ik, $b) AS INT) AS $alias",
           s"CAST(((CAST($ik AS BIGINT) >> $b) & 1) AS INT) AS $alias")
        case 8 =>
          val d = 2 + rnd.nextInt(8)
          (s"CAST(intDiv($ik, $d) AS BIGINT) AS $alias",
           s"CAST(($ik // $d) AS BIGINT) AS $alias")
        case 9 =>
          val (c1, c2) = (1 + rnd.nextInt(9), 1 + rnd.nextInt(9))
          (s"CAST(multiIf($ik % 7 = 0, $c1, $ik % 3 = 0, $c2, -1) AS BIGINT) AS $alias",
           s"CAST(CASE WHEN $ik % 7 = 0 THEN $c1 WHEN $ik % 3 = 0 THEN $c2 " +
             s"ELSE -1 END AS BIGINT) AS $alias")
        case _ =>
          val d = 2 + rnd.nextInt(8)
          // identical spelling both sides; nullif injects the null edge
          val e = s"CAST(ifnull(nullif($ik % $d, 0), -1) AS BIGINT) AS $alias"
          (e, e)
      }
    }
    batteryQuery(name, t, rnd, draw, groupOdds = 5)
  }

  /** Shared probe/grouped assembly for the function-battery bands (date,
    * string): with probability 1/groupOdds the drawn expression becomes a
    * GROUP BY key (ordinal-keyed on both sides, count beside it);
    * otherwise 1-3 row-wise probes ride the unique key with the band's
    * total ordering and LIMIT. The rnd call order matches the bands'
    * original inline tails, so seeds keep generating identical queries.
    */
  private def batteryQuery(name: String, t: Tbl, rnd: Random,
      draw: String => (String, String), groupOdds: Int): FuzzQuery = {
    val where = predicate(t, rnd).map(p => s" WHERE $p").getOrElse("")
    if (rnd.nextInt(groupOdds) == 0) {
      val (gs, gd) = draw("g")
      FuzzQuery(name,
        s"SELECT $gs, count(1) AS cnt FROM ${t.name}$where " +
          "GROUP BY 1 ORDER BY 1 NULLS FIRST",
        s"SELECT $gd, CAST(count(*) AS BIGINT) AS cnt FROM ${t.name}$where " +
          "GROUP BY 1 ORDER BY 1 NULLS FIRST")
    } else {
      val pairs = (0 until 1 + rnd.nextInt(3)).map(i => draw(s"e$i"))
      def render(side: ((String, String)) => String): String = {
        val sel = (t.uniqueKey ++ pairs.map(side)).mkString(", ")
        s"SELECT $sel FROM ${t.name}$where ORDER BY ${t.totalOrder.mkString(", ")} LIMIT 60"
      }
      FuzzQuery(name, render(_._1), render(_._2))
    }
  }

  // ---- predicates (identical text on both sides) ----------------------

  private def pick[A](rnd: Random, xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

  private def intConst(rnd: Random, c: Col): Long =
    c.lo.toLong + (rnd.nextDouble() * (c.hi - c.lo)).toLong

  private def atom(t: Tbl, rnd: Random): String = {
    val c = pick(rnd, t.cols)
    c.kind match {
      case IntK =>
        rnd.nextInt(3) match {
          case 0 => s"${c.name} ${pick(rnd, Seq("<", "<=", ">", ">=", "=", "<>"))} ${intConst(rnd, c)}"
          case 1 => s"${c.name} % ${2 + rnd.nextInt(8)} = ${rnd.nextInt(2)}"
          case _ =>
            val ks = Seq.fill(2 + rnd.nextInt(3))(intConst(rnd, c)).distinct
            s"${c.name} IN (${ks.mkString(", ")})"
        }
      case FloatK =>
        val v = c.lo + rnd.nextDouble() * (c.hi - c.lo)
        val lit = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
        s"${c.name} ${pick(rnd, Seq("<", "<=", ">", ">="))} $lit"
      case StrK =>
        rnd.nextInt(3) match {
          case 0 => s"${c.name} ${pick(rnd, Seq("=", "<>"))} '${pick(rnd, c.strs)}'"
          case 1 =>
            val vs = Seq.fill(2 + rnd.nextInt(2))(pick(rnd, c.strs)).distinct
            s"${c.name} IN (${vs.map(v => s"'$v'").mkString(", ")})"
          case _ =>
            val v = pick(rnd, c.strs)
            s"${c.name} LIKE '%${v.take(1 + rnd.nextInt(math.max(1, v.length - 1)))}%'"
        }
      case TimeK =>
        val y = c.lo.toInt + rnd.nextInt(c.hi.toInt - c.lo.toInt + 1)
        val m = 1 + rnd.nextInt(12)
        val d = 1 + rnd.nextInt(28)
        f"${c.name}%s ${pick(rnd, Seq("<", ">="))}%s TIMESTAMP '$y%d-$m%02d-$d%02d 00:00:00'"
    }
  }

  private def predicate(t: Tbl, rnd: Random): Option[String] =
    rnd.nextInt(10) match {
      case 0 => None                                   // no WHERE at all
      case 1 =>                                        // empty-result edge
        val c = pick(rnd, t.of(IntK))
        Some(s"${c.name} < ${c.lo.toLong - 5}")
      case n if n <= 4 => Some(atom(t, rnd))
      case n if n <= 7 =>
        Some(s"${atom(t, rnd)} ${pick(rnd, Seq("AND", "OR"))} ${atom(t, rnd)}")
      case 8 => Some(s"NOT (${atom(t, rnd)})")
      case _ =>
        Some(s"(${atom(t, rnd)} OR ${atom(t, rnd)}) AND ${atom(t, rnd)}")
    }

  // ---- aggregate queries ----------------------------------------------

  /** (sparkExpr, duckExpr) for one aggregate over a value column; `ifCond`
    * exercises the -If combinators against DuckDB's FILTER clause.
    */
  private def aggPair(t: Tbl, rnd: Random, alias: String): (String, String) = {
    val intCols = t.of(IntK)
    val floatCols = t.of(FloatK)
    val strCols = t.of(StrK)
    // null-edge injection: CH nullIf on the value argument on both sides
    def nullable(c: Col): (String, String) = c.kind match {
      case IntK if rnd.nextDouble() < 0.25 =>
        val k = intConst(rnd, c)
        (s"nullIf(${c.name}, $k)", s"nullif(${c.name}, $k)")
      case StrK if rnd.nextDouble() < 0.25 =>
        val v = pick(rnd, c.strs)
        (s"nullIf(${c.name}, '$v')", s"nullif(${c.name}, '$v')")
      case _ => (c.name, c.name)
    }
    def cond(): String = atom(t, rnd)

    val choices = Seq.newBuilder[() => (String, String)]
    choices += (() => (s"count(*) AS $alias", s"count(*) AS $alias"))
    if (intCols.nonEmpty) {
      def ic = pick(rnd, intCols)
      choices += { () =>
        val (sv, dv) = nullable(ic)
        (s"sum($sv) AS $alias", s"CAST(sum($dv) AS BIGINT) AS $alias")
      }
      choices += { () =>
        val (sv, dv) = nullable(ic); val p = cond()
        (s"sumIf($sv, $p) AS $alias",
         s"CAST(sum($dv) FILTER (WHERE $p) AS BIGINT) AS $alias")
      }
      choices += { () =>
        val (sv, dv) = nullable(ic)
        (s"avg($sv) AS $alias", s"avg($dv) AS $alias")
      }
      choices += { () =>
        val (sv, dv) = nullable(ic); val p = cond()
        val fn = pick(rnd, Seq("min", "max"))
        (s"${fn}If($sv, $p) AS $alias",
         s"$fn($dv) FILTER (WHERE $p) AS $alias")
      }
      choices += { () =>
        val (sv, dv) = nullable(ic)
        (s"uniqExact($sv) AS $alias", s"count(DISTINCT $dv) AS $alias")
      }
      choices += { () =>
        val (sv, dv) = nullable(ic); val p = cond()
        (s"uniqExactIf($sv, $p) AS $alias",
         s"count(DISTINCT $dv) FILTER (WHERE $p) AS $alias")
      }
      choices += { () =>
        val c = ic
        (s"medianExact(${c.name}) AS $alias",
         s"quantile_cont(${c.name}, 0.5) AS $alias")
      }
      choices += { () =>
        val (sv, dv) = nullable(ic); val p = cond()
        (s"avgIf($sv, $p) AS $alias", s"avg($dv) FILTER (WHERE $p) AS $alias")
      }
      // -Distinct combinators
      choices += { () =>
        val (sv, dv) = nullable(ic)
        (s"sumDistinct($sv) AS $alias",
         s"CAST(sum(DISTINCT $dv) AS BIGINT) AS $alias")
      }
      choices += { () =>
        val (sv, dv) = nullable(ic)
        (s"avgDistinct($sv) AS $alias", s"avg(DISTINCT $dv) AS $alias")
      }
      // -OrNull / -OrDefault combinators (empty-set edge: the no-WHERE /
      // impossible-WHERE / all-false-nullIf draws hit the NULL branches)
      choices += { () =>
        val (sv, dv) = nullable(ic)
        (s"sumOrNull($sv) AS $alias", s"CAST(sum($dv) AS BIGINT) AS $alias")
      }
      choices += { () =>
        val (sv, dv) = nullable(ic)
        (s"sumOrDefault($sv) AS $alias",
         s"CAST(coalesce(sum($dv), 0) AS BIGINT) AS $alias")
      }
      choices += { () =>
        val (sv, dv) = nullable(ic)
        (s"minOrDefault($sv) AS $alias", s"coalesce(min($dv), 0) AS $alias")
      }
      choices += { () =>
        val (sv, dv) = nullable(ic)
        (s"avgOrDefault($sv) AS $alias", s"coalesce(avg($dv), 0.0) AS $alias")
      }
      choices += { () =>
        val (sv, dv) = nullable(ic)
        (s"countOrNull($sv) AS $alias", s"nullif(count($dv), 0) AS $alias")
      }
    }
    if (floatCols.nonEmpty) {
      def fc = pick(rnd, floatCols)
      choices += { () =>
        val c = fc
        (s"CAST(sum(CAST(${c.name} AS DECIMAL(18,2))) AS DOUBLE) AS $alias",
         s"CAST(SUM(CAST(${c.name} AS DECIMAL(18,2))) AS DOUBLE) AS $alias")
      }
      choices += { () =>
        val c = fc; val p = cond()
        (s"CAST(sumIf(CAST(${c.name} AS DECIMAL(18,2)), $p) AS DOUBLE) AS $alias",
         s"CAST(SUM(CAST(${c.name} AS DECIMAL(18,2))) FILTER (WHERE $p) AS DOUBLE) AS $alias")
      }
      choices += { () =>
        val c = fc
        val fn = pick(rnd, Seq("min", "max"))
        (s"$fn(${c.name}) AS $alias", s"$fn(${c.name}) AS $alias")
      }
      choices += { () =>
        val c = fc
        (s"medianExact(${c.name}) AS $alias",
         s"quantile_cont(${c.name}, 0.5) AS $alias")
      }
    }
    if (strCols.nonEmpty) {
      def sc = pick(rnd, strCols)
      choices += { () =>
        val (sv, dv) = nullable(sc)
        (s"uniqExact($sv) AS $alias", s"count(DISTINCT $dv) AS $alias")
      }
      choices += { () =>
        val c = sc
        val fn = pick(rnd, Seq("min", "max"))
        (s"$fn(${c.name}) AS $alias", s"$fn(${c.name}) AS $alias")
      }
      choices += { () =>
        val p = cond()
        (s"countIf($p) AS $alias", s"count(*) FILTER (WHERE $p) AS $alias")
      }
    }
    pick(rnd, choices.result())()
  }

  private def aggQuery(name: String, t: Tbl, rnd: Random): FuzzQuery = {
    // group keys: 0 (global), 1, or 2; drawn from strings / small-int
    // modulo buckets / year(time) / a null-edged string
    val keyPool = Seq.newBuilder[(String, String, String)] // (spark, duck, alias)
    t.of(StrK).foreach { c =>
      keyPool += ((c.name, c.name, c.name))
      keyPool += ((s"nullIf(${c.name}, '${c.strs.head}')",
                   s"nullif(${c.name}, '${c.strs.head}')", s"nk_${c.name}"))
    }
    t.of(IntK).filter(c => c.hi - c.lo <= 200).foreach { c =>
      keyPool += ((c.name + " % 7", c.name + " % 7", s"mk_${c.name}"))
    }
    t.of(TimeK).foreach { c =>
      keyPool += ((s"toYear(${c.name})", s"year(${c.name})", s"y_${c.name}"))
      keyPool += ((s"toMonth(${c.name})", s"month(${c.name})", s"m_${c.name}"))
    }
    val pool = rnd.shuffle(keyPool.result())
    val nKeys = rnd.nextInt(3) min pool.length
    val keys = pool.take(nKeys)

    val nAggs = 1 + rnd.nextInt(3)
    val aggs = (0 until nAggs).map(i => aggPair(t, rnd, s"agg$i"))
    // groupArray: sorted exact array equality, raw never-null int col only
    val withGa =
      if (t.allowGroupArray && nKeys >= 1 && rnd.nextDouble() < 0.15 && t.of(IntK).nonEmpty) {
        val c = pick(rnd, t.of(IntK))
        aggs :+ ((s"arraySort(groupArray(${c.name})) AS garr",
                  s"list_sort(list(${c.name})) AS garr"))
      } else aggs

    val where = predicate(t, rnd)
    val having = if (nKeys >= 1 && rnd.nextDouble() < 0.3)
      Some(s"count(*) > ${1 + rnd.nextInt(5)}") else None

    def render(keyExprs: Seq[(String, String)], aggExprs: Seq[String]): String = {
      val sel = (keyExprs.map { case (e, a) => s"$e AS $a" } ++ aggExprs).mkString(", ")
      val wh = where.map(p => s" WHERE $p").getOrElse("")
      val gb = if (keyExprs.nonEmpty)
        s" GROUP BY ${(1 to keyExprs.length).mkString(", ")}" else ""
      val hv = having.map(h => s" HAVING $h").getOrElse("")
      val ob = if (keyExprs.nonEmpty)
        s" ORDER BY ${keyExprs.map(_._2 + " ASC NULLS FIRST").mkString(", ")}" else ""
      s"SELECT $sel FROM ${t.name}$wh$gb$hv$ob"
    }
    FuzzQuery(name,
      render(keys.map(k => (k._1, k._3)), withGa.map(_._1)),
      render(keys.map(k => (k._2, k._3)), withGa.map(_._2)))
  }

  // ---- scalar (row-level) queries -------------------------------------

  private def scalarPair(t: Tbl, rnd: Random, alias: String): (String, String) = {
    val choices = Seq.newBuilder[() => (String, String)]
    t.of(IntK).foreach { c =>
      choices += (() => (s"${c.name} % 9 AS $alias", s"${c.name} % 9 AS $alias"))
      choices += { () =>
        val k = intConst(rnd, c)
        (s"abs(${c.name} - $k) AS $alias", s"abs(${c.name} - $k) AS $alias")
      }
    }
    t.of(FloatK).foreach { c =>
      choices += (() => (s"round(${c.name}, 2) AS $alias", s"round(${c.name}, 2) AS $alias"))
      choices += (() => (s"${c.name} * 2.0 AS $alias", s"${c.name} * 2.0 AS $alias"))
      choices += { () =>
        // floor: Spark returns BIGINT, DuckDB DOUBLE — align on the duck side
        (s"floor(${c.name}) AS $alias", s"CAST(floor(${c.name}) AS BIGINT) AS $alias")
      }
    }
    t.of(StrK).foreach { c =>
      choices += (() => (s"upper(${c.name}) AS $alias", s"upper(${c.name}) AS $alias"))
      choices += (() => (s"length(${c.name}) AS $alias", s"length(${c.name}) AS $alias"))
      choices += (() => (s"substring(${c.name}, 1, 3) AS $alias", s"substring(${c.name}, 1, 3) AS $alias"))
      choices += { () =>
        val v = pick(rnd, c.strs)
        (s"coalesce(nullIf(${c.name}, '$v'), 'other') AS $alias",
         s"coalesce(nullif(${c.name}, '$v'), 'other') AS $alias")
      }
      choices += { () =>
        val p = atom(t, rnd)
        (s"if($p, 'hi', 'lo') AS $alias",
         s"CASE WHEN $p THEN 'hi' ELSE 'lo' END AS $alias")
      }
    }
    t.of(TimeK).foreach { c =>
      choices += (() => (s"toYear(${c.name}) AS $alias", s"year(${c.name}) AS $alias"))
      choices += (() => (s"toMonth(${c.name}) AS $alias", s"month(${c.name}) AS $alias"))
    }
    pick(rnd, choices.result())()
  }

  private def scalarQuery(name: String, t: Tbl, rnd: Random): FuzzQuery = {
    val nExprs = 1 + rnd.nextInt(3)
    val pairs = (0 until nExprs).map(i => scalarPair(t, rnd, s"e$i"))
    val where = predicate(t, rnd)
    def render(side: ((String, String)) => String): String = {
      val sel = (t.uniqueKey ++ pairs.map(side)).mkString(", ")
      val wh = where.map(p => s" WHERE $p").getOrElse("")
      val ob = t.totalOrder.mkString(", ")
      s"SELECT $sel FROM ${t.name}$wh ORDER BY $ob LIMIT 50"
    }
    FuzzQuery(name, render(_._1), render(_._2))
  }
}
