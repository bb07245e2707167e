package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** ClickHouse-dialect function names registered as Spark SQL functions, so
  * the reference's queries run verbatim through `spark.sql(...)` —
  * the "a user of the reference could switch" surface.
  *
  * Each name maps onto the Spark expression with matching semantics
  * (SURVEY.md §2.7's function-by-function table):
  *
  * {{{
  *   toDate(second)            -> cast to date            (ods.action_001_dis.sql:3)
  *   toStartOfHour(second)     -> date_trunc('HOUR', ·)   (:4)
  *   toUInt32(x)               -> truncate + wrap mod 2^32 (dwm:50,114)
  *   toUInt64(x)               -> truncate to long        (see note below)
  *   uniqCombined(x)           -> approx_count_distinct   (doc:304-316)
  *   uniqExact(x)              -> count(distinct)         (doc:305)
  *   groupBitmap(x)            -> bitmap cardinality of bitmap_agg (dwm:134-139)
  *   bitmapCardinality / bitmapAnd / bitmapOr /
  *   bitmapAndCardinality / bitmapOrCardinality           (doc:1207-1238)
  *   medianExact(x)            -> percentile(x, 0.5)      (dwm:83)
  * }}}
  *
  * Plus the full `-State` / `-Merge` / `-If` combinator family the
  * reference's flagship MV SELECT and read-side merge are written in
  * (dwm.mainpage_stat_mv_dis.sql:28-70, 100-131, 184-200, 280-290):
  * `uniqCombinedState[If]` / `uniqCombinedMerge[State]` / `uniqCombinedIf`
  * over Spark's Datasketches HLL aggregates, `groupBitmapState[If]` /
  * `groupBitmapMerge[State]` over [[Bitmaps]], `medianExactState` /
  * `medianExactMerge[State]` over sorted-array states, `sumState` /
  * `sumSimpleState` / `sumMerge` (SimpleAggregateFunction: the partial IS
  * the value, doc:510-605), and `sumIf` / `countIf` / `uniqExactIf`.
  *
  * `dictGet('db.dict', 'attr', key)` resolves through the
  * [[Dictionaries]] registry (ref dim.dict_user_dim.sql:24-27) — the
  * dictionary must be registered on the session before the query is parsed.
  *
  * toUInt64 note: CH wraps negatives mod 2^64 into [2^63, 2^64) which has
  * no JVM-long representation; our toUInt64 keeps the two's-complement
  * bit pattern (same 64 bits, different sign display). toUInt32 wraps
  * exactly (mask 0xFFFFFFFF), matching CH for all inputs.
  */
object ChCompat {

  /** True while this thread is inside the system.one catalog setup — breaks
    * the register → catalog → analyzer-build → register recursion when the
    * extensions path invokes register during analyzer construction.
    */
  private val inCatalogSetup: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  def register(spark: SparkSession): Unit = Registration.once(spark, "ChCompat") {
    Bitmaps.register(spark)
    MinHash.register(spark)
    VectorOps.register(spark)
    FreqTopK.register(spark)
    WindowFunnel.register(spark)
    SequenceMatch.register(spark)
    UniqUpTo.register(spark)
    MapAggregates.register(spark)
    Simhash.register(spark)
    Hashes.register(spark)
    graft.text.TextFunctions.register(spark)
    graft.text.Bpe.register(spark)
    ForEach.register(spark)
    StatAggregates.register(spark)
    StringDistance.register(spark)
    GeoFormat.register(spark)
    Moving.register(spark)
    SketchAggs.register(spark)
    SequenceNextNode.register(spark)
    StatMatrix.register(spark)
    HtmlText.register(spark)
    // CH's one-row system table (`FROM system.one` — the doc's hand-built
    // rows idiom, doc:335-495, selects literals from it). The catalog
    // round-trip needs the session's ANALYZER; when register() itself runs
    // from inside analyzer construction (GraftExtensions injects it as a
    // resolution-rule builder), touching spark.catalog here would re-enter
    // the builder and recurse without bound. The thread-local guard makes
    // the nested call skip the catalog block — function registration (all
    // registry-only, analyzer-free) still happens, analyzer construction
    // completes, and the OUTER frame then creates system.one normally.
    if (!inCatalogSetup.get()) {
      inCatalogSetup.set(true)
      try {
        if (!spark.catalog.databaseExists("system") ||
            !spark.catalog.tableExists("system.one")) {
          spark.sql("CREATE DATABASE IF NOT EXISTS system")
          spark.sql("CREATE OR REPLACE VIEW system.one AS SELECT 0 AS dummy")
        }
      } finally inCatalogSetup.set(false)
    }
    val reg = spark.sessionState.functionRegistry
    def f(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")

    // ---- scalar date/time/casts --------------------------------------
    f("toDate") { es => Cast(es.head, DateType) }
    f("toStartOfHour") { es => TruncTimestamp(Literal("HOUR"), es.head) }
    f("toStartOfDay") { es => TruncTimestamp(Literal("DAY"), es.head) }
    f("toStartOfMinute") { es => TruncTimestamp(Literal("MINUTE"), es.head) }
    f("toStartOfMonth") { es => Cast(TruncTimestamp(Literal("MONTH"), es.head), DateType) }
    f("toStartOfQuarter") { es => Cast(TruncTimestamp(Literal("QUARTER"), es.head), DateType) }
    // CH toMonday = Monday-start week truncation (toStartOfWeek's mode
    // games are skipped — Spark/ISO weeks start Monday, same as toMonday)
    f("toMonday") { es => Cast(TruncTimestamp(Literal("WEEK"), es.head), DateType) }
    f("toYear") { es => Year(es.head) }
    f("toQuarter") { es => Quarter(es.head) }
    f("toMonth") { es => Month(es.head) }
    f("toDayOfMonth") { es => DayOfMonth(es.head) }
    f("toHour") { es => Hour(es.head) }
    f("toMinute") { es => Minute(es.head) }
    f("toSecond") { es => Second(es.head) }
    // the PARTITION BY staples: toYYYYMM(ts) = 202401, toYYYYMMDD = 20240131
    f("toYYYYMM") { es =>
      Add(Multiply(Year(es.head), Literal(100)), Month(es.head))
    }
    f("toYYYYMMDD") { es =>
      Add(Multiply(Add(Multiply(Year(es.head), Literal(100)), Month(es.head)),
        Literal(100)), DayOfMonth(es.head))
    }
    f("toStartOfYear") { es => Cast(TruncTimestamp(Literal("YEAR"), es.head), DateType) }
    // CH toStartOfWeek: mode 0/2 = Sunday-start, mode 1/3 = Monday-start
    // (the default mode is 0 — toMonday is the Monday shorthand)
    f("toStartOfWeek") { es =>
      val monday = es.lift(1) match {
        case Some(Literal(m: Int, IntegerType)) => m == 1 || m == 3
        case Some(other) => throw new IllegalArgumentException(
          s"toStartOfWeek: mode must be an int literal, got $other")
        case None => false
      }
      if (monday) Cast(TruncTimestamp(Literal("WEEK"), es.head), DateType)
      else DateSub(Cast(es.head, DateType),
        Subtract(DayOfWeek(es.head), Literal(1))) // DayOfWeek: Sunday = 1
    }
    f("toDayOfWeek") { es => Add(WeekDay(es.head), Literal(1)) } // CH: Monday = 1
    f("toDayOfYear") { es => DayOfYear(es.head) }
    // CH DateTime is wall-clock seconds — TIMESTAMP_NTZ is the faithful type
    f("toDateTime") { es => Cast(es.head, TimestampNTZType) }
    // timestamp->long cast = whole seconds since epoch (CH UInt32 analog)
    f("toUnixTimestamp") { es => Cast(Cast(es.head, TimestampType), LongType) }
    // epoch seconds of a wall-clock value (UTC session — build.sbt pins it)
    def epochOf(e: Expression): Expression = Cast(Cast(e, TimestampType), LongType)
    // CH timeSlot: round down to the half-hour
    f("timeSlot") { es =>
      Cast(SecondsToTimestamp(Multiply(IntegralDivide(epochOf(es.head),
        Literal(1800L)), Literal(1800L))), TimestampNTZType)
    }
    // CH timeSlots(start, duration[, size]): every size-aligned slot the
    // [start, start+duration] window touches
    f("timeSlots") { es =>
      val size = if (es.length >= 3) Cast(es(2), LongType) else Literal(1800L)
      val u = epochOf(es(0))
      val t = UnresolvedNamedLambdaVariable(Seq("__ts_t"))
      ArrayTransform(
        new Sequence(Multiply(IntegralDivide(u, size), size),
          Add(u, Cast(es(1), LongType)), size),
        LambdaFunction(Cast(SecondsToTimestamp(t), TimestampNTZType), Seq(t)))
    }
    // CH toRelative*Num: units elapsed since the epoch (month/year are
    // calendar positions, like CH)
    f("toRelativeSecondNum") { es => epochOf(es.head) }
    f("toRelativeMinuteNum") { es => IntegralDivide(epochOf(es.head), Literal(60L)) }
    f("toRelativeHourNum") { es => IntegralDivide(epochOf(es.head), Literal(3600L)) }
    f("toRelativeDayNum") { es =>
      DateDiff(Cast(es.head, DateType), Cast(Literal("1970-01-01"), DateType))
    }
    f("toRelativeMonthNum") { es =>
      Add(Multiply(Year(es.head), Literal(12)), Month(es.head))
    }
    f("toRelativeYearNum") { es => Year(es.head) }
    // Modified Julian Day: days since 1858-11-17
    f("toModifiedJulianDay") { es =>
      DateDiff(Cast(es.head, DateType), Cast(Literal("1858-11-17"), DateType))
    }
    f("fromModifiedJulianDay") { es =>
      DateAdd(Cast(Literal("1858-11-17"), DateType), es.head)
    }
    f("monthName") { es => DateFormatClass(Cast(es.head, TimestampType), Literal("MMMM")) }
    // CH dateName('part', d): the named/numbered component as a string
    f("dateName") { es =>
      val part = es.head match {
        case lit if lit.foldable => String.valueOf(lit.eval()).toLowerCase
        case _ => throw new IllegalArgumentException(
          "dateName: part must be a string literal")
      }
      val d = es(1)
      val e: Expression = part match {
        case "year" => Year(d)
        case "quarter" => Quarter(d)
        case "month" => DateFormatClass(Cast(d, TimestampType), Literal("MMMM"))
        case "week" => WeekOfYear(d)
        case "dayofyear" => DayOfYear(d)
        case "day" => DayOfMonth(d)
        case "weekday" => DateFormatClass(Cast(d, TimestampType), Literal("EEEE"))
        case "hour" => Hour(d)
        case "minute" => Minute(d)
        case "second" => Second(d)
        case other => throw new IllegalArgumentException(s"dateName: unknown part '$other'")
      }
      Cast(e, StringType)
    }
    // CH age('unit', s, e): COMPLETE units between s and e (vs dateDiff's
    // boundary crossings) — months_between carries the day/time compare,
    // fixed-duration units divide the epoch difference
    f("age") { es =>
      val unit = es.head match {
        case lit if lit.foldable => String.valueOf(lit.eval()).toLowerCase
        case _ => throw new IllegalArgumentException("age: unit must be a string literal")
      }
      val (s, e) = (es(1), es(2))
      def bySeconds(n: Long): Expression =
        IntegralDivide(Subtract(epochOf(e), epochOf(s)), Literal(n))
      // truncate toward zero like the seconds-based units (a reversed
      // range counts the same magnitude either direction)
      def months: Expression = Cast(
        MonthsBetween(Cast(e, TimestampType), Cast(s, TimestampType),
          Literal(false), None),
        LongType)
      unit match {
        case "second" => bySeconds(1L)
        case "minute" => bySeconds(60L)
        case "hour" => bySeconds(3600L)
        case "day" => bySeconds(86400L)
        case "week" => bySeconds(604800L)
        case "month" => months
        case "quarter" => IntegralDivide(months, Literal(3L))
        case "year" => IntegralDivide(months, Literal(12L))
        case other => throw new IllegalArgumentException(s"age: unknown unit '$other'")
      }
    }
    // CH add*/subtract* family — calendar-aware month/year arithmetic,
    // fixed-duration below a day (naive timestamps: no DST games)
    for ((name, unit) <- Seq("addSeconds" -> "SECOND", "addMinutes" -> "MINUTE",
        "addHours" -> "HOUR", "addDays" -> "DAY", "addWeeks" -> "WEEK",
        "addMonths" -> "MONTH", "addYears" -> "YEAR")) {
      f(name) { es => TimestampAdd(unit, es(1), es(0)) }
      f(name.replace("add", "subtract")) { es =>
        TimestampAdd(unit, UnaryMinus(es(1)), es(0)) }
    }
    // CH dateDiff('unit', a, b): BOUNDARY CROSSINGS from a to b (calendar
    // semantics — dateDiff('day', 23:59, 00:01) = 1), not complete
    // intervals, so Spark's TimestampDiff (complete units) is the wrong
    // tool; built from truncations instead. DuckDB's date_diff counts the
    // same boundaries, so oracles mirror 1:1. Registered as chDateDiff:
    // Spark's parser special-cases 3-arg datediff before function lookup,
    // so the CH spelling reaches this via ChSql.dateDiff's rewrite.
    f("chDateDiff") { es =>
      val unit = es.head match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
          s.toString.toLowerCase
        case other => throw new IllegalArgumentException(
          s"dateDiff: unit must be a string literal, got $other")
      }
      val (a, b) = (es(1), es(2))
      def secs(e: Expression) = Cast(Cast(e, TimestampType), LongType)
      def floorDiv(e: Expression, d: Long) =
        IntegralDivide(e, Literal(d), EvalMode.LEGACY)
      def dayDiff(x: Expression, y: Expression) =
        Cast(DateDiff(Cast(y, DateType), Cast(x, DateType)), LongType)
      def monthIdx(e: Expression) =
        Add(Multiply(Year(e), Literal(12)), Month(e))
      unit match {
        case "second" => Subtract(secs(b), secs(a))
        case "minute" => Subtract(floorDiv(secs(b), 60), floorDiv(secs(a), 60))
        case "hour" => Subtract(floorDiv(secs(b), 3600), floorDiv(secs(a), 3600))
        case "day" => dayDiff(a, b)
        case "week" => floorDiv(dayDiff( // Monday boundaries, like CH
          Cast(TruncTimestamp(Literal("WEEK"), a), DateType),
          Cast(TruncTimestamp(Literal("WEEK"), b), DateType)), 7)
        case "month" => Cast(Subtract(monthIdx(b), monthIdx(a)), LongType)
        case "quarter" => Cast(Subtract(
          Add(Multiply(Year(b), Literal(4)), Quarter(b)),
          Add(Multiply(Year(a), Literal(4)), Quarter(a))), LongType)
        case "year" => Cast(Subtract(Year(b), Year(a)), LongType)
        case other => throw new IllegalArgumentException(
          s"dateDiff: unsupported unit '$other'")
      }
    }
    // formatDateTime with CH/MySQL specifiers (%i = minute); translated to
    // a Java pattern at registration time
    f("formatDateTime") { es =>
      val fmt = es(1) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"formatDateTime: format must be a string literal, got $other")
      }
      DateFormatClass(es.head, Literal(ChCompat.chFormatToJava(fmt)))
    }
    f("intDiv") { es => IntegralDivide(es(0), es(1), EvalMode.LEGACY) }
    f("splitByChar") { es =>
      val sep = es.head match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"splitByChar: separator must be a string literal, got $other")
      }
      require(sep.length == 1, s"splitByChar: separator must be one char, got '$sep'")
      StringSplit(es(1), Literal(java.util.regex.Pattern.quote(sep)), Literal(-1))
    }
    f("arrayStringConcat") { es =>
      ArrayJoin(es.head, if (es.length > 1) es(1) else Literal(""), None)
    }
    f("empty") { es => EqualTo(Length(es.head), Literal(0)) }
    f("notEmpty") { es => GreaterThan(Length(es.head), Literal(0)) }
    // splitByString: literal multi-char separator (regex-quoted under
    // Spark's regex split). CH drops NOTHING — trailing empties ride, so
    // limit -1 matches.
    f("splitByString") { es =>
      val sep = es.head match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"splitByString: separator must be a string literal, got $other")
      }
      require(sep.nonEmpty, "splitByString: separator must be non-empty")
      StringSplit(es(1), Literal(java.util.regex.Pattern.quote(sep)), Literal(-1))
    }
    // CH string-name aliases onto exact-semantics Spark natives. The
    // *UTF8 spellings are the same operation here: Spark strings are
    // already character-addressed (CH splits the names because its plain
    // forms are byte-addressed).
    f("lengthUTF8") { es => Length(es.head) }
    f("lowerUTF8") { es => Lower(es.head) }
    f("upperUTF8") { es => Upper(es.head) }
    f("reverseUTF8") { es => Reverse(es.head) }
    f("substringUTF8") { es => Substring(es(0), es(1), es(2)) }
    f("leftPad") { es =>
      new StringLPad(es(0), es(1), if (es.length > 2) es(2) else Literal(" "))
    }
    f("rightPad") { es =>
      new StringRPad(es(0), es(1), if (es.length > 2) es(2) else Literal(" "))
    }
    f("trimBoth") { es => new StringTrim(es.head) }
    f("trimLeft") { es => new StringTrimLeft(es.head) }
    f("trimRight") { es => new StringTrimRight(es.head) }
    // array predicates/counts CH spells beyond has/hasAny
    f("hasAll") { es => EqualTo(Size(ArrayExcept(es(1), es(0))), Literal(0)) }
    f("countEqual") { es =>
      Size(ArrayFilter(es(0), LambdaFunction(
        EqualNullSafe(UnresolvedNamedLambdaVariable(Seq("ce_x")), es(1)),
        Seq(UnresolvedNamedLambdaVariable(Seq("ce_x"))))))
    }
    // occurrence numbering: arrayEnumerateUniq(a)[i] = 1-based index of
    // a[i] among equal values so far (O(n²) per row — per-row arrays)
    f("arrayEnumerateUniq") { es =>
      val arr = es.head
      ArrayTransform(arr, LambdaFunction(
        Size(ArrayFilter(
          Slice(arr, Literal(1), Add(UnresolvedNamedLambdaVariable(Seq("aeu_i")), Literal(1))),
          LambdaFunction(
            EqualNullSafe(UnresolvedNamedLambdaVariable(Seq("aeu_y")),
              UnresolvedNamedLambdaVariable(Seq("aeu_x"))),
            Seq(UnresolvedNamedLambdaVariable(Seq("aeu_y")))))),
        Seq(UnresolvedNamedLambdaVariable(Seq("aeu_x")),
          UnresolvedNamedLambdaVariable(Seq("aeu_i")))))
    }
    // ---- CH URL functions (composed on ParseUrl — codegen'd java.net
    // parsing, no UDF). CH returns '' where java yields null/absent, so
    // every part is coalesced onto ''. Divergence notes: no public-suffix
    // list ships here, so topLevelDomain is the last dot label (CH agrees
    // for ordinary hosts; differs on exotic multi-part suffix queries via
    // firstSignificantSubdomain, which is out of scope).
    def urlPart(url: Expression, part: String): Expression =
      Coalesce(Seq(ParseUrl(Seq(url, Literal(part)), failOnError = false), Literal("")))
    f("protocol") { es => urlPart(es.head, "PROTOCOL") }
    f("domain") { es => urlPart(es.head, "HOST") }
    f("domainWithoutWWW") { es =>
      RegExpReplace(urlPart(es.head, "HOST"), Literal("^www\\."), Literal(""))
    }
    f("topLevelDomain") { es =>
      RegExpExtract(urlPart(es.head, "HOST"), Literal("\\.([^.]+)$"), Literal(1))
    }
    f("path") { es => urlPart(es.head, "PATH") }
    f("queryString") { es => urlPart(es.head, "QUERY") }
    f("fragment") { es => urlPart(es.head, "REF") }
    // pathFull = path + ?query + #fragment (CH includes both)
    f("pathFull") { es =>
      val q = ParseUrl(Seq(es.head, Literal("QUERY")), failOnError = false)
      val r = ParseUrl(Seq(es.head, Literal("REF")), failOnError = false)
      Concat(Seq(
        urlPart(es.head, "PATH"),
        Coalesce(Seq(Concat(Seq(Literal("?"), q)), Literal(""))),
        Coalesce(Seq(Concat(Seq(Literal("#"), r)), Literal("")))))
    }
    f("queryStringAndFragment") { es =>
      val r = ParseUrl(Seq(es.head, Literal("REF")), failOnError = false)
      Concat(Seq(
        urlPart(es.head, "QUERY"),
        Coalesce(Seq(Concat(Seq(Literal("#"), r)), Literal("")))))
    }
    f("extractURLParameter") { es =>
      Coalesce(Seq(ParseUrl(Seq(es.head, Literal("QUERY"), es(1)), failOnError = false),
        Literal("")))
    }
    f("cutQueryString") { es =>
      // only a '?' BEFORE any '#' starts a query string — '?' inside the
      // fragment is legal and stays (CH agrees)
      RegExpReplace(es.head, Literal("^([^#?]*)\\?[^#]*"), Literal("$1"))
    }
    f("cutFragment") { es =>
      RegExpReplace(es.head, Literal("#.*$"), Literal(""))
    }
    f("cutQueryStringAndFragment") { es =>
      RegExpReplace(es.head, Literal("[?#].*$"), Literal(""))
    }
    f("cutWWW") { es =>
      RegExpReplace(es.head, Literal("^((?:[A-Za-z][A-Za-z0-9+.-]*://)?)www\\."), Literal("$1"))
    }
    // ---- CH string-search functions ----------------------------------
    // CH position counts BYTES (1-based; 0 = absent) where Spark counts
    // characters — identical on ASCII, documented divergence beyond;
    // positionUTF8 (characters on both engines) is the exact twin.
    f("position") { es => StringLocate(es(1), es.head, Literal(1)) }
    f("positionUTF8") { es => StringLocate(es(1), es.head, Literal(1)) }
    f("positionCaseInsensitive") { es =>
      StringLocate(Lower(es(1)), Lower(es.head), Literal(1))
    }
    // hasToken: the needle appears as a whole token, i.e. bounded by
    // non-alphanumeric bytes or the string edges (the CH tokenbf
    // tokenizer contract). Needle must be a literal — it is compiled
    // into the match regex.
    f("hasToken") { es =>
      val tok = es(1) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"hasToken: token must be a string literal, got $other")
      }
      require(tok.nonEmpty && tok.forall(_.isLetterOrDigit),
        s"hasToken: token must be non-empty alphanumeric, got '$tok'")
      RLike(es.head, Literal(
        "(^|[^A-Za-z0-9])" + java.util.regex.Pattern.quote(tok) + "([^A-Za-z0-9]|$)"))
    }
    f("multiSearchAny") { es =>
      val x = UnresolvedNamedLambdaVariable(Seq("__ms_x"))
      ArrayExists(es(1), LambdaFunction(Contains(es.head, x), Seq(x)))
    }
    f("countSubstrings") { es =>
      If(Or(IsNull(es(1)), EqualTo(Length(es(1)), Literal(0))), Literal(0L),
        IntegralDivide(
          Subtract(Length(es.head), Length(StringReplace(es.head, es(1), Literal("")))),
          Length(es(1)), EvalMode.LEGACY))
    }
    f("match") { es => RLike(es.head, es(1)) }
    f("extractAll") { es =>
      // CH: the capturing group if the pattern has one, else the whole match
      val grp = es(1) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType)
          if java.util.regex.Pattern.compile(s.toString).matcher("").groupCount() > 0 => 1
        case _ => 0
      }
      RegExpExtractAll(es.head, es(1), Literal(grp))
    }
    f("replaceAll") { es => StringReplace(es.head, es(1), es(2)) }
    f("replaceRegexpAll") { es => RegExpReplace(es.head, es(1), es(2)) }
    // ---- CH array functions (lambda-first argument order) ------------
    f("arrayMap") { es => ArrayTransform(es(1), es.head) }
    f("arrayFilter") { es => ArrayFilter(es(1), es.head) }
    f("arrayExists") { es => ArrayExists(es(1), es.head) }
    f("arrayAll") { es => ArrayForAll(es(1), es.head) }
    // the analyzer only admits lambda args when the registered function
    // RESOLVES to a HigherOrderFunction, so arrayCount must BE one —
    // an aggregate folding the user's predicate, not Size(ArrayFilter)
    f("arrayCount") { es =>
      val lf = es.head.asInstanceOf[LambdaFunction]
      val acc = UnresolvedNamedLambdaVariable(Seq("__count_acc"))
      val merge = LambdaFunction(
        Add(acc, If(lf.function, Literal(1), Literal(0))), acc +: lf.arguments)
      ArrayAggregate(es(1), Literal(0), merge, LambdaFunction.identity)
    }
    // CH arrayJoin(arr): duplicate the row per element — exactly Spark's
    // explode generator; resolves anywhere a generator does (SELECT list /
    // LATERAL VIEW), with CH's one-arrayJoin-per-SELECT restriction
    // becoming Spark's one-generator-per-SELECT analysis error
    f("arrayJoin") { es => Explode(es.head) }
    f("has") { es => ArrayContains(es(0), es(1)) }
    f("hasAny") { es => ArraysOverlap(es(0), es(1)) }
    f("arrayDistinct") { es => ArrayDistinct(es.head) }
    f("arrayUniq") { es => Size(ArrayDistinct(es.head)) }
    f("arraySort") { es => new SortArray(es.head) }
    f("arrayReverse") { es => Reverse(es.head) }
    f("indexOf") { es => ArrayPosition(es(0), es(1)) }
    f("arrayConcat") { es => Concat(es) }
    f("arrayIntersect") { es => es.reduceLeft(ArrayIntersect(_, _)) }
    f("arrayFlatten") { es => Flatten(es.head) }
    f("arraySlice") { es =>
      if (es.length == 3) Slice(es(0), es(1), es(2))
      else Slice(es(0), es(1), Subtract(Size(es(0)), Subtract(es(1), Literal(1))))
    }
    // ---- CH array analytics (series math over per-row arrays) --------
    // index-lambda forms: Spark's HOF lambdas take (element, 0-based
    // index); element_at is 1-based, so element_at(a, i) IS the previous
    // element at lambda index i — the off-by-one the shapes below lean on
    def lamVar(n: String) = UnresolvedNamedLambdaVariable(Seq(n))
    f("arrayEnumerate") { es =>
      val (x, i) = (lamVar("__en_x"), lamVar("__en_i"))
      ArrayTransform(es.head, LambdaFunction(Add(i, Literal(1)), Seq(x, i)))
    }
    // running sums: one functional fold over the row's array, bigint
    // lanes. Cost note: ArrayAppend copies the accumulated output each
    // step, so the fold is O(n²) element copies for an n-element lane —
    // fine for per-document arrays (tens to hundreds of tokens), not a
    // shape for 1e5-element lanes (no immutable-array O(n) exists at the
    // expression level; CH pays a native loop here)
    f("arrayCumSum") { es =>
      val acc = lamVar("__cs_acc"); val x = lamVar("__cs_x"); val fin = lamVar("__cs_fin")
      val accSum = GetStructField(acc, 0, Some("s"))
      val zero = CreateNamedStruct(Seq(
        Literal("s"), Literal(0L),
        Literal("out"), Literal.create(Seq.empty[Long], ArrayType(LongType))))
      val merge = LambdaFunction(CreateNamedStruct(Seq(
        Literal("s"), Add(accSum, Cast(x, LongType)),
        Literal("out"), ArrayAppend(GetStructField(acc, 1, Some("out")),
          Add(accSum, Cast(x, LongType))))), Seq(acc, x))
      ArrayAggregate(es.head, zero, merge,
        LambdaFunction(GetStructField(fin, 1, Some("out")), Seq(fin)))
    }
    // neighbor deltas: [0, a1-a0, a2-a1, ...] (CH pins the first lane 0)
    f("arrayDifference") { es =>
      val (x, i) = (lamVar("__df_x"), lamVar("__df_i"))
      ArrayTransform(es.head, LambdaFunction(
        Subtract(x, If(EqualTo(i, Literal(0)), x, ElementAt(es.head, i))), Seq(x, i)))
    }
    // collapse CONSECUTIVE duplicates (run-length heads), nulls compared
    // null-safely like CH
    f("arrayCompact") { es =>
      val (x, i) = (lamVar("__cp_x"), lamVar("__cp_i"))
      ArrayFilter(es.head, LambdaFunction(
        Or(EqualTo(i, Literal(0)), Not(EqualNullSafe(x, ElementAt(es.head, i)))),
        Seq(x, i)))
    }
    def arraySumOf(arr: Expression): Expression = {
      val acc = lamVar("__as_acc"); val x = lamVar("__as_x")
      ArrayAggregate(arr, Literal(0L),
        LambdaFunction(Add(acc, Cast(x, LongType)), Seq(acc, x)),
        LambdaFunction.identity)
    }
    def arrayAvgOf(arr: Expression): Expression = {
      val acc = lamVar("__av_acc"); val x = lamVar("__av_x")
      val s = ArrayAggregate(arr, Literal(0.0),
        LambdaFunction(Add(acc, Cast(x, DoubleType)), Seq(acc, x)),
        LambdaFunction.identity)
      If(EqualTo(Size(arr), Literal(0)), Literal(0.0),
        Divide(s, Cast(Size(arr), DoubleType)))
    }
    f("arraySum") { es => arraySumOf(es.head) }
    f("arrayAvg") { es => arrayAvgOf(es.head) }
    // ---- CH array completion: product, clamped cumsum, fill / split,
    // rotate, shingles, AUC ---------------------------------------------
    f("arrayProduct") { es =>
      val acc = lamVar("__pr_acc"); val x = lamVar("__pr_x")
      ArrayAggregate(es.head, Literal(1.0),
        LambdaFunction(Multiply(acc, Cast(x, DoubleType)), Seq(acc, x)),
        LambdaFunction.identity)
    }
    // running sum clamped at zero (CH's non-negative scan): s = max(0, s+x)
    // — integral arrays keep exact BIGINT lanes, float arrays ride doubles
    // (CH returns Float64 there)
    f("arrayCumSumNonNegative") { es =>
      val floatIn = es.head.dataType match {
        case ArrayType(DoubleType | FloatType, _) => true
        case _ => false
      }
      val laneT: DataType = if (floatIn) DoubleType else LongType
      def zeroLit: Expression = if (floatIn) Literal(0.0) else Literal(0L)
      val acc = lamVar("__cn_acc"); val x = lamVar("__cn_x"); val fin = lamVar("__cn_fin")
      val accSum = GetStructField(acc, 0, Some("s"))
      val clamped = Greatest(Seq(zeroLit, Add(accSum, Cast(x, laneT))))
      val zero = CreateNamedStruct(Seq(
        Literal("s"), zeroLit,
        Literal("out"), Literal.create(Seq.empty[Any], ArrayType(laneT))))
      val merge = LambdaFunction(CreateNamedStruct(Seq(
        Literal("s"), clamped,
        Literal("out"), ArrayAppend(GetStructField(acc, 1, Some("out")), clamped))),
        Seq(acc, x))
      ArrayAggregate(es.head, zero, merge,
        LambdaFunction(GetStructField(fin, 1, Some("out")), Seq(fin)))
    }
    // forward fill: where the predicate is false the element takes the
    // previous (already-filled) value; a false head stays as-is
    def fillOf(lf: LambdaFunction, arr: Expression, backward: Boolean): Expression = {
      // a lambda-taking registration must RESOLVE to a HigherOrderFunction
      // at top level, so the backward form reverses inside the fold: scan
      // Reverse(arr) and un-reverse in the finish lambda
      val tag = if (backward) "r" else "f"
      val out = lamVar(s"__fl_out$tag"); val fin = lamVar(s"__fl_fin$tag")
      val x = lf.arguments.head
      val scanned = if (backward) Reverse(arr) else arr
      val merge = LambdaFunction(
        ArrayAppend(out, If(lf.function, x,
          If(EqualTo(Size(out), Literal(0)), x, ElementAt(out, Literal(-1))))),
        out +: lf.arguments)
      val finish = if (backward) LambdaFunction(Reverse(fin), Seq(fin))
        else LambdaFunction.identity
      ArrayAggregate(scanned, Slice(arr, Literal(1), Literal(0)), merge, finish)
    }
    f("arrayFill") { es =>
      fillOf(es.head.asInstanceOf[LambdaFunction], es(1), backward = false)
    }
    f("arrayReverseFill") { es =>
      fillOf(es.head.asInstanceOf[LambdaFunction], es(1), backward = true)
    }
    // arraySplit cuts BEFORE each element where the predicate holds;
    // arrayReverseSplit cuts AFTER. Accumulator: (piece-closed?, pieces).
    def splitOf(lf: LambdaFunction, arr: Expression, after: Boolean): Expression = {
      val tag = if (after) "a" else "b"
      val acc = lamVar(s"__sp_acc$tag"); val fin = lamVar(s"__sp_fin$tag")
      val x = lf.arguments.head
      val closed = GetStructField(acc, 0, Some("closed"))
      val out = GetStructField(acc, 1, Some("out"))
      val emptyPieces = Slice(CreateArray(Seq(Slice(arr, Literal(1), Literal(0)))),
        Literal(1), Literal(0))
      val startNew = if (after) Or(closed, EqualTo(Size(out), Literal(0)))
        else Or(lf.function, EqualTo(Size(out), Literal(0)))
      val appended = If(startNew,
        ArrayAppend(out, CreateArray(Seq(x))),
        ArrayAppend(Slice(out, Literal(1), Subtract(Size(out), Literal(1))),
          ArrayAppend(ElementAt(out, Literal(-1)), x)))
      val zero = CreateNamedStruct(Seq(
        Literal("closed"), Literal(true), Literal("out"), emptyPieces))
      val merge = LambdaFunction(CreateNamedStruct(Seq(
        Literal("closed"), if (after) lf.function else Literal(false),
        Literal("out"), appended)), acc +: lf.arguments)
      ArrayAggregate(arr, zero, merge,
        LambdaFunction(GetStructField(fin, 1, Some("out")), Seq(fin)))
    }
    // CH arrayFold(lambda(acc, x), arr, init): the general left fold —
    // exactly Spark's ArrayAggregate with an identity finish; CH's
    // (acc, x) lambda parameter order matches ArrayAggregate's merge
    f("arrayFold") { es =>
      require(es.length == 3,
        s"arrayFold(lambda, arr, init) — the one-array form; got ${es.length} args")
      val lf = es.head match {
        case l: LambdaFunction => l
        case other => throw new IllegalArgumentException(
          s"arrayFold: first argument must be a lambda, got $other")
      }
      val fin = lamVar("__fold_fin")
      ArrayAggregate(es(1), es(2), lf, LambdaFunction(fin, Seq(fin)))
    }
    f("arraySplit") { es =>
      splitOf(es.head.asInstanceOf[LambdaFunction], es(1), after = false)
    }
    f("arrayReverseSplit") { es =>
      splitOf(es.head.asInstanceOf[LambdaFunction], es(1), after = true)
    }
    def rotL(arr: Expression, n: Expression): Expression = {
      val k = Pmod(Cast(n, IntegerType), Size(arr))
      If(LessThanOrEqual(Size(arr), Literal(0)), arr,
        Concat(Seq(Slice(arr, Add(k, Literal(1)), Subtract(Size(arr), k)),
          Slice(arr, Literal(1), k))))
    }
    f("arrayRotateLeft") { es => rotL(es(0), es(1)) }
    f("arrayRotateRight") { es => rotL(es(0), UnaryMinus(es(1))) }
    // arrayShiftLeft/Right(arr, n[, default]): dropped slots fill with the
    // explicit default (2-arg form fills with the element type's default,
    // resolved at runtime by the dedicated expression — the builder can't
    // inspect unresolved child types)
    f("arrayShiftLeft") { es =>
      ArrayShiftExpr(es(0), es(1), es.drop(2).headOption, shiftLeft = true)
    }
    f("arrayShiftRight") { es =>
      ArrayShiftExpr(es(0), es(1), es.drop(2).headOption, shiftLeft = false)
    }
    // consecutive n-windows: [a,b,c,d] / 2 → [[a,b],[b,c],[c,d]]
    f("arrayShingles") { es =>
      val arr = es(0); val n = Cast(es(1), IntegerType)
      val i = lamVar("__sh_i")
      val empty = Slice(CreateArray(Seq(arr)), Literal(1), Literal(0))
      If(LessThan(Size(arr), n), empty,
        ArrayTransform(
          new Sequence(Literal(1), Subtract(Size(arr), Subtract(n, Literal(1)))),
          LambdaFunction(Slice(arr, i, n), Seq(i))))
    }
    // exact ROC AUC over per-row (scores, labels) arrays — ties get the
    // average-rank half credit
    f("arrayAUC") { es => ArrayAucExpr(es(0), es(1)) }
    // arrayFirst/arrayLast(lambda, arr): one fold carrying a ≤1-element
    // buffer (the lambda-bearing registration must RESOLVE to a
    // HigherOrderFunction at top level, so the pick lives in the fold and
    // the finish reads it back null-safely)
    def pickOf(lf: LambdaFunction, arr: Expression, first: Boolean): Expression = {
      val tag = if (first) "f" else "l"
      val acc = lamVar(s"__pk_acc$tag"); val fin = lamVar(s"__pk_fin$tag")
      val x = lf.arguments.head
      val hit = CreateArray(Seq(x))
      val body =
        if (first) If(And(lf.function, EqualTo(Size(acc), Literal(0))), hit, acc)
        else If(lf.function, hit, acc)
      ArrayAggregate(arr, Slice(arr, Literal(1), Literal(0)),
        LambdaFunction(body, acc +: lf.arguments),
        LambdaFunction(GetArrayItem(fin, Literal(0), failOnError = false), Seq(fin)))
    }
    f("arrayFirst") { es =>
      pickOf(es.head.asInstanceOf[LambdaFunction], es(1), first = true)
    }
    f("arrayLast") { es =>
      pickOf(es.head.asInstanceOf[LambdaFunction], es(1), first = false)
    }
    // index twins: fold the 1-based position instead of the value
    def pickIdxOf(lf: LambdaFunction, arr: Expression, first: Boolean): Expression = {
      val tag = if (first) "fi" else "li"
      val acc = lamVar(s"__pi_acc$tag"); val fin = lamVar(s"__pi_fin$tag")
      val x = lf.arguments.head
      // acc = [lastIndexSeen, foundIndex]; position tracking rides the fold
      val seen = GetArrayItem(acc, Literal(0), failOnError = false)
      val found = GetArrayItem(acc, Literal(1), failOnError = false)
      val pos = Add(seen, Literal(1))
      val newFound =
        if (first) If(And(lf.function, EqualTo(found, Literal(0))), pos, found)
        else If(lf.function, pos, found)
      ArrayAggregate(arr,
        Literal.create(Seq(0, 0), ArrayType(IntegerType)),
        LambdaFunction(CreateArray(Seq(pos, newFound)), acc +: lf.arguments),
        LambdaFunction(Coalesce(Seq(
          GetArrayItem(fin, Literal(1), failOnError = false), Literal(0))), Seq(fin)))
    }
    f("arrayFirstIndex") { es =>
      pickIdxOf(es.head.asInstanceOf[LambdaFunction], es(1), first = true)
    }
    f("arrayLastIndex") { es =>
      pickIdxOf(es.head.asInstanceOf[LambdaFunction], es(1), first = false)
    }
    // arrayResize(arr, n[, pad]): truncate or grow; without an explicit
    // pad the new slots are NULL (CH pads the type default — divergence
    // documented; pass the pad to match CH exactly)
    f("arrayResize") { es =>
      val arr = es(0); val n = Cast(es(1), IntegerType)
      val pad: Expression =
        if (es.length >= 3) es(2)
        else GetArrayItem(Slice(arr, Literal(1), Literal(0)), Literal(0),
          failOnError = false) // typed NULL of the element type
      If(LessThanOrEqual(n, Size(arr)),
        Slice(arr, Literal(1), Greatest(Seq(n, Literal(0)))),
        Concat(Seq(arr, ArrayRepeat(pad, Subtract(n, Size(arr))))))
    }
    f("arrayWithConstant") { es => ArrayRepeat(es(1), es(0)) }
    // CH's partial sort: the first `limit` positions sorted — the full
    // sort is the deterministic superset of that contract
    f("arrayPartialSort") { es => new SortArray(es(1)) }
    f("concatWithSeparator") { es => ConcatWs(es) }
    f("substringIndex") { es => SubstringIndex(es(0), es(1), es(2)) }
    f("arrayDotProduct") { es =>
      val (x, y) = (lamVar("__adp_x"), lamVar("__adp_y"))
      val acc = lamVar("__adp_acc")
      ArrayAggregate(
        ZipWith(es(0), es(1), LambdaFunction(
          Multiply(Cast(x, DoubleType), Cast(y, DoubleType)), Seq(x, y))),
        Literal(0.0),
        LambdaFunction(Add(acc, lamVar("__adp_v")), Seq(acc, lamVar("__adp_v"))),
        LambdaFunction.identity)
    }
    // CH arrayReduce('agg', arr): apply an aggregate-function NAME to one
    // row's array. The name is a string literal (CH agrees — it is parsed,
    // not computed), so this is plan-time dispatch onto the same expression
    // shapes the arrayX twins use — no new execution machinery, still
    // per-row/codegen-friendly. Empty arrays give NULL for any/anyLast
    // (CH renders type defaults — the NULL-vs-default divergence every
    // super-aggregate shim here documents).
    f("arrayReduce") { es =>
      val name = es.head match {
        case lit if lit.foldable => String.valueOf(lit.eval()).toLowerCase
        case _ => throw new IllegalArgumentException(
          "arrayReduce: aggregate name must be a string literal")
      }
      val arr = es(1)
      name match {
        case "sum" => arraySumOf(arr)
        case "min" => ArrayMin(arr)
        case "max" => ArrayMax(arr)
        case "avg" => arrayAvgOf(arr)
        case "count" => Cast(Size(arr), LongType)
        case "uniq" | "uniqexact" => Cast(Size(ArrayDistinct(arr)), LongType)
        case "any" =>
          If(EqualTo(Size(arr), Literal(0)), Literal(null),
            ElementAt(arr, Literal(1)))
        case "anylast" =>
          If(EqualTo(Size(arr), Literal(0)), Literal(null),
            ElementAt(arr, Size(arr)))
        case other => throw new IllegalArgumentException(
          s"arrayReduce: unsupported aggregate '$other' (supported: sum, min, " +
            "max, avg, count, uniq, uniqExact, any, anyLast)")
      }
    }
    f("arrayMin") { es => ArrayMin(es.head) }
    f("arrayMax") { es => ArrayMax(es.head) }
    f("arrayReverseSort") { es => new SortArray(es.head, Literal(false)) }
    f("arrayZip") { es => ArraysZip(es) }
    f("arrayPushBack") { es => ArrayAppend(es(0), es(1)) }
    f("arrayPushFront") { es => ArrayPrepend(es(0), es(1)) }
    f("arrayPopBack") { es =>
      If(LessThanOrEqual(Size(es.head), Literal(0)), es.head,
        Slice(es.head, Literal(1), Subtract(Size(es.head), Literal(1))))
    }
    f("arrayPopFront") { es =>
      If(LessThanOrEqual(Size(es.head), Literal(0)), es.head,
        Slice(es.head, Literal(2), Subtract(Size(es.head), Literal(1))))
    }
    // CH toUInt32 truncates fractions toward zero (as Cast does) and wraps
    // negatives/overflow mod 2^32 (Cast alone would pass negatives through)
    f("toUInt32") { es => BitwiseAnd(Cast(es.head, LongType), Literal(0xFFFFFFFFL)) }
    f("toUInt64") { es => Cast(es.head, LongType) }
    // signed to* casts truncate toward zero AND wrap two's-complement on
    // overflow (CH's contract; Spark 4's ANSI Cast would throw instead,
    // so the wrap is explicit: sign-extending shift pairs keep the value
    // in range before the final in-range cast). Unsigned sub-64 forms
    // wrap via bit masks (toUInt8(300) = 44, toUInt16(-1) = 65535).
    def wrapSigned(e: Expression, bits: Int, t: DataType): Expression =
      Cast(ShiftRight(ShiftLeft(Cast(e, LongType), Literal(64 - bits)),
        Literal(64 - bits)), t)
    f("toInt8") { es => wrapSigned(es.head, 8, ByteType) }
    f("toInt16") { es => wrapSigned(es.head, 16, ShortType) }
    f("toInt32") { es => wrapSigned(es.head, 32, IntegerType) }
    f("toInt64") { es => Cast(es.head, LongType) }
    f("toUInt8") { es => BitwiseAnd(Cast(es.head, LongType), Literal(0xFFL)) }
    f("toUInt16") { es => BitwiseAnd(Cast(es.head, LongType), Literal(0xFFFFL)) }
    f("toFloat32") { es => Cast(es.head, FloatType) }
    f("toFloat64") { es => Cast(es.head, DoubleType) }
    // toDecimalN(x, s): CH's N names the coefficient width (32/64/128 bit
    // → 9/18/38 decimal digits); s must be a literal scale
    def decScale(e: Expression): Int = e match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"toDecimal scale must be an integer literal, got $other")
    }
    f("toDecimal32") { es => Cast(es.head, DecimalType(9, decScale(es(1)))) }
    f("toDecimal64") { es => Cast(es.head, DecimalType(18, decScale(es(1)))) }
    f("toDecimal128") { es => Cast(es.head, DecimalType(38, decScale(es(1)))) }
    f("toString") { es => Cast(es.head, StringType) }
    f("now") { _ => Now() }
    f("today") { _ => CurrentDate() }
    // TTL arithmetic: day + toIntervalDay(92) + toIntervalHour(5)
    // (ods.action_001_dis.sql:21, dwm.mainpage_stat_mv_dis.sql:18)
    f("toIntervalDay") { es => new MakeDTInterval(es.head, Literal(0), Literal(0)) }
    f("toIntervalHour") { es => new MakeDTInterval(Literal(0), es.head, Literal(0)) }
    // parseDateTimeBestEffortOrZero (ref data_rebalance.py:137,149): parse
    // failure yields epoch zero rather than NULL
    f("parseDateTimeBestEffortOrZero") { es =>
      Coalesce(Seq(
        Cast(Cast(es.head, StringType), TimestampType, None, EvalMode.TRY),
        Cast(Literal(0L), TimestampType)))
    }
    // introspection scalars (doc:507-607 byteSize sizing experiments;
    // hostName is the doc's which-shard probe — in Spark, which executor;
    // toTypeName reports Spark type names, not CH's — doc:897's debug aid)
    f("hostName") { _ => HostNameExpr() }
    f("byteSize") { es => ByteSizeExpr(es.head) }
    f("toTypeName") { es => ToTypeNameExpr(es.head) }
    // float classification (CH isFinite/isInfinite/ifNotFinite; isNaN is
    // Spark's case-insensitive isnan already)
    def finite(x: Expression): Expression = {
      val d = Cast(x, DoubleType)
      Not(Or(IsNaN(d), Or(EqualTo(d, Literal(Double.PositiveInfinity)),
        EqualTo(d, Literal(Double.NegativeInfinity)))))
    }
    f("isFinite") { es => finite(es.head) }
    f("isInfinite") { es =>
      val d = Cast(es.head, DoubleType)
      Or(EqualTo(d, Literal(Double.PositiveInfinity)),
        EqualTo(d, Literal(Double.NegativeInfinity)))
    }
    f("ifNotFinite") { es => If(finite(es(0)), es(0), es(1)) }
    // CH transform(x, from, to[, default]): literal value remapping.
    // The 2-arg lambda form stays Spark's higher-order transform — the
    // arity + argument shape disambiguates, so registering the name does
    // not break standard Spark SQL in the same session.
    f("transform") { es =>
      if (es.length == 2) ArrayTransform(es(0), es(1))
      else {
        require(es.length == 3 || es.length == 4,
          s"transform(x, from, to[, default]): got ${es.length} args")
        val (from, to) = (es(1), es(2))
        require(from.foldable && to.foldable,
          "transform: from/to must be literal arrays")
        def items(e: Expression): Seq[Expression] = {
          val et = e.dataType.asInstanceOf[ArrayType].elementType
          val a = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          (0 until a.numElements()).map(i => Literal(a.get(i, et), et))
        }
        val (ks, vs) = (items(from), items(to))
        require(ks.length == vs.length, "transform: from/to lengths differ")
        val default = if (es.length == 4) es(3) else es(0)
        CaseKeyWhen(es(0), ks.zip(vs).flatMap(p => Seq(p._1, p._2)) :+ default)
      }
    }
    // CH multiSearch family over a needle array (multiSearchAny is
    // registered with the string-search battery above)
    f("multiSearchAllPositions") { es =>
      val n = UnresolvedNamedLambdaVariable(Seq("__ms_n"))
      ArrayTransform(es(1),
        LambdaFunction(new StringLocate(n, es(0)), Seq(n)))
    }
    // first (smallest positive) position of any needle; 0 if none
    f("multiSearchFirstPosition") { es =>
      val n = UnresolvedNamedLambdaVariable(Seq("__mfp_n"))
      val hits = ArrayFilter(
        ArrayTransform(es(1), LambdaFunction(new StringLocate(n, es(0)), Seq(n))),
        LambdaFunction(GreaterThan(UnresolvedNamedLambdaVariable(Seq("__mfp_p")),
          Literal(0)), Seq(UnresolvedNamedLambdaVariable(Seq("__mfp_p")))))
      Coalesce(Seq(ArrayMin(hits), Literal(0)))
    }
    // 1-based index of the FIRST needle that occurs anywhere; 0 if none
    f("multiSearchFirstIndex") { es =>
      val (p, i) = (UnresolvedNamedLambdaVariable(Seq("__mfi_p")),
        UnresolvedNamedLambdaVariable(Seq("__mfi_i")))
      val n = UnresolvedNamedLambdaVariable(Seq("__mfi_n"))
      val idxHits = ArrayFilter(
        ArrayTransform(es(1), LambdaFunction(
          If(Contains(es(0), n), Add(i, Literal(1)), Literal(0)), Seq(n, i))),
        LambdaFunction(GreaterThan(p, Literal(0)), Seq(p)))
      Coalesce(Seq(ArrayMin(idxHits), Literal(0)))
    }
    f("ngramDistanceCaseInsensitive") { es =>
      StringDistExpr(Lower(es(0)), Lower(es(1)), "ngramDistance")
    }
    f("ngramSearchCaseInsensitive") { es =>
      StringDistExpr(Lower(es(0)), Lower(es(1)), "ngramSearch")
    }
    // ---- encoding / bit functions (CH spellings; hex/unhex are native) -
    f("base64Encode") { es => Base64(Cast(es.head, BinaryType)) }
    f("base64Decode") { es => Cast(new UnBase64(es.head), StringType) }
    f("tryBase64Decode") { es => Cast(new UnBase64(es.head), StringType) }
    f("bitAnd") { es => BitwiseAnd(es(0), es(1)) }
    f("bitOr") { es => BitwiseOr(es(0), es(1)) }
    f("bitXor") { es => BitwiseXor(es(0), es(1)) }
    f("bitNot") { es => BitwiseNot(es.head) }
    f("bitShiftLeft") { es => ShiftLeft(es(0), es(1)) }
    f("bitShiftRight") { es => ShiftRight(es(0), es(1)) }
    f("bitCount") { es => BitwiseCount(es.head) }
    f("bitTest") { es =>
      Cast(BitwiseAnd(ShiftRight(es(0), Cast(es(1), IntegerType)), Literal(1L)),
        IntegerType)
    }
    f("exp2") { es => Pow(Literal(2.0), es.head) }
    f("exp10") { es => Pow(Literal(10.0), es.head) }
    f("intExp2") { es => ShiftLeft(Literal(1L), Cast(es.head, IntegerType)) }
    f("intExp10") { es => Cast(Pow(Literal(10.0), es.head), LongType) }
    // largest power of two ≤ x (anything below one returns 0, CH's
    // documented convention — a negative shift would wrap mod 64)
    f("roundToExp2") { es =>
      val x = Cast(es.head, DoubleType)
      If(LessThan(x, Literal(1.0)), Literal(0L),
        ShiftLeft(Literal(1L), Cast(new Floor(Log2(x)), IntegerType)))
    }
    // largest array element ≤ x, else the first element
    f("roundDown") { es =>
      val v = UnresolvedNamedLambdaVariable(Seq("__rd_v"))
      Coalesce(Seq(
        ArrayMax(ArrayFilter(es(1), LambdaFunction(
          LessThanOrEqual(v, es(0)), Seq(v)))),
        ElementAt(es(1), Literal(1))))
    }
    f("roundBankers") { es =>
      BRound(es(0), if (es.length >= 2) es(1) else Literal(0))
    }
    // ---- IPv4 helpers --------------------------------------------------
    def ipOctets(n: Expression): Seq[Expression] =
      Seq(24, 16, 8, 0).map(sh => Cast(BitwiseAnd(
        ShiftRight(Cast(n, LongType), Literal(sh)), Literal(255L)), StringType))
    def ipToNum(s: Expression): Expression = {
      val parts = StringSplit(s, Literal("\\."), Literal(-1))
      Seq(1, 2, 3, 4).map[Expression](i =>
        Multiply(Cast(ElementAt(parts, Literal(i)), LongType),
          Literal(1L << (8 * (4 - i))))).reduceLeft(Add(_, _))
    }
    f("IPv4NumToString") { es => ConcatWs(Literal(".") +: ipOctets(es.head)) }
    f("IPv4StringToNum") { es => ipToNum(es.head) }
    f("isIPv4String") { es =>
      RLike(es.head,
        Literal("^((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])$"))
    }
    // (lower, upper) bounds of a CIDR block as dotted strings
    f("IPv4CIDRToRange") { es =>
      val n = ipToNum(es(0))
      val bits = Cast(es(1), IntegerType)
      val mask = BitwiseAnd(
        ShiftLeft(Literal(0xFFFFFFFFL), Subtract(Literal(32), bits)),
        Literal(0xFFFFFFFFL))
      val lower = BitwiseAnd(n, mask)
      val upper = BitwiseOr(lower, BitwiseAnd(BitwiseNot(mask), Literal(0xFFFFFFFFL)))
      CreateNamedStruct(Seq(
        Literal("lower"), ConcatWs(Literal(".") +: ipOctets(lower)),
        Literal("upper"), ConcatWs(Literal(".") +: ipOctets(upper))))
    }
    f("generateUUIDv4") { _ => new Uuid() }
    // CH rand() is UInt32-valued; registered under CH's rand32/rand64
    // spellings so Spark's own [0,1) rand() keeps its meaning
    f("rand32") { _ =>
      Cast(new Floor(Multiply(new Rand(), Literal(4294967296.0))), LongType)
    }
    f("rand64") { _ =>
      Cast(new Floor(Multiply(new Rand(), Literal(9.223372036854776e18))), LongType)
    }
    f("randCanonical") { _ => new Rand() }
    f("randUniform") { es =>
      Add(Multiply(new Rand(), Subtract(es(1), es(0))), es(0))
    }
    f("randNormal") { es =>
      Add(Multiply(new Randn(), es(1)), es(0))
    }
    // ---- vector math over arrays (CH tuple/array spellings) ------------
    def zipMul(a: Expression, b: Expression): Expression = {
      val (x, y) = (UnresolvedNamedLambdaVariable(Seq("__vm_x")),
        UnresolvedNamedLambdaVariable(Seq("__vm_y")))
      ZipWith(a, b, LambdaFunction(
        Multiply(Cast(x, DoubleType), Cast(y, DoubleType)), Seq(x, y)))
    }
    def arrSumD(arr: Expression): Expression = {
      val acc = UnresolvedNamedLambdaVariable(Seq("__vs_acc"))
      val x = UnresolvedNamedLambdaVariable(Seq("__vs_x"))
      ArrayAggregate(arr, Literal(0.0),
        LambdaFunction(Add(acc, Cast(x, DoubleType)), Seq(acc, x)),
        LambdaFunction.identity)
    }
    def absArr(a: Expression): Expression = {
      val x = UnresolvedNamedLambdaVariable(Seq("__va_x"))
      ArrayTransform(a, LambdaFunction(Abs(Cast(x, DoubleType)), Seq(x)))
    }
    def diffArr(a: Expression, b: Expression): Expression = {
      val (x, y) = (UnresolvedNamedLambdaVariable(Seq("__vd_x")),
        UnresolvedNamedLambdaVariable(Seq("__vd_y")))
      ZipWith(a, b, LambdaFunction(
        Subtract(Cast(x, DoubleType), Cast(y, DoubleType)), Seq(x, y)))
    }
    f("dotProduct") { es => arrSumD(zipMul(es(0), es(1))) }
    f("scalarProduct") { es => arrSumD(zipMul(es(0), es(1))) }
    f("L1Norm") { es => arrSumD(absArr(es.head)) }
    f("L2Norm") { es => Sqrt(arrSumD(zipMul(es.head, es.head))) }
    f("LinfNorm") { es => ArrayMax(absArr(es.head)) }
    f("L1Distance") { es => arrSumD(absArr(diffArr(es(0), es(1)))) }
    f("L2Distance") { es =>
      val d = diffArr(es(0), es(1))
      Sqrt(arrSumD(zipMul(d, d)))
    }
    f("cosineDistance") { es =>
      Subtract(Literal(1.0), CosineSimilarity(es(0), es(1)))
    }
    f("normalizeL2") { es => L2Normalize(es.head) }
    // ---- misc introspection / control ---------------------------------
    f("throwIf") { es =>
      val msg = if (es.length >= 2) es(1)
        else Literal("throwIf: condition was true")
      If(es.head, Cast(RaiseError(msg), IntegerType), Literal(0))
    }
    f("ignore") { es => Literal(0) }
    f("identity") { es => es.head }
    f("materialize") { es => es.head }
    f("currentDatabase") { _ => CurrentDatabase() }
    f("currentUser") { _ => CurrentUser() }
    f("version") { _ => SparkVersion() }
    // ---- tuple / remaining alias mop-up --------------------------------
    // tupleElement(t, n) — 1-based index into the dialect's tuple()
    // (CreateStruct names fields col1..colN); a string argument addresses
    // a named field directly
    f("tupleElement") { es =>
      val field = es(1) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) => s.toString
        case lit if lit.foldable => "col" + String.valueOf(lit.eval())
        case other => throw new IllegalArgumentException(
          s"tupleElement: index/name must be a literal, got $other")
      }
      org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(es(0), Literal(field))
    }
    // HLL spellings: all ride the same Datasketches estimator as
    // uniqCombined (64-bit hashing — uniqCombined64's contract; CH's
    // uniqHLL12 error profile is strictly worse, ours is a superset)
    f("uniqHLL12") { es => HllSketchEstimate(hllState(es.head)) }
    f("uniqCombined64") { es => HllSketchEstimate(hllState(es.head)) }
    // bfloat16 quantiles map to exact (superset accuracy, same shape)
    f("quantileBFloat16") { es => new Percentile(es(0), es(1)) }
    f("medianBFloat16") { es => new Percentile(es(0), Literal(0.5d)) }
    // millisecond unix timestamps (DateTime64(3) analog)
    f("toUnixTimestamp64Milli") { es =>
      UnixMillis(Cast(es.head, TimestampType))
    }
    f("toUnixTimestamp64Micro") { es =>
      UnixMicros(Cast(es.head, TimestampType))
    }
    f("fromUnixTimestamp64Milli") { es =>
      // exact integer millis (a double divide would truncate a microsecond
      // off most inputs on the d2l path)
      Cast(MillisToTimestamp(Cast(es.head, LongType)), TimestampNTZType)
    }
    f("fromUnixTimestamp64Micro") { es =>
      Cast(MicrosToTimestamp(Cast(es.head, LongType)), TimestampNTZType)
    }
    f("toDateTime64") { es => Cast(es.head, TimestampNTZType) }
    f("now64") { _ => Cast(Now(), TimestampNTZType) }
    f("yesterday") { _ => DateAdd(CurrentDate(), Literal(-1)) }
    f("addDate") { es => TimestampAdd("DAY", es(1), es(0)) }
    f("subDate") { es => TimestampAdd("DAY", UnaryMinus(es(1)), es(0)) }
    // CH mapFilter((k, v) -> cond, map) — Spark's MapFilter, lambda-first
    // argument order swapped (mapApply's tuple-returning lambda has no
    // Spark equivalent and stays unmapped)
    f("mapFilter") { es => MapFilter(es(1), es.head) }
    // ---- CH Map-type functions (Spark MapType carries them natively) --
    f("mapFromArrays") { es => MapFromArrays(es(0), es(1)) }
    f("mapKeys") { es => MapKeys(es.head) }
    f("mapValues") { es => MapValues(es.head) }
    f("mapContains") { es => ArrayContains(MapKeys(es(0)), es(1)) }
    f("mapAdd") { es => es.reduceLeft(MapArithExpr(_, _, add = true)) }
    f("mapSubtract") { es => es.reduceLeft(MapArithExpr(_, _, add = false)) }
    f("mapPopulateSeries") { es =>
      MapPopulateExpr(es.head, if (es.length >= 2) Some(es(1)) else None)
    }
    // ---- date completions ---------------------------------------------
    // CH toTime: keep the time of day, pin the date to 1970-01-02
    f("toTime") { es =>
      Cast(SecondsToTimestamp(Add(
        Pmod(Cast(Cast(es.head, TimestampType), LongType), Literal(86400L)),
        Literal(86400L))), TimestampNTZType)
    }
    f("toISOWeek") { es => WeekOfYear(es.head) }
    // ISO year = calendar year of the ISO week's Thursday
    f("toISOYear") { es =>
      val d = Cast(es.head, DateType)
      Year(DateAdd(d, Subtract(Literal(4), Add(WeekDay(d), Literal(1)))))
    }
    f("toLastDayOfMonth") { es => LastDay(es.head) }
    // toStartOfInterval(t, INTERVAL n unit): day-time intervals truncate
    // on the epoch-micros grid; year-month intervals on the month grid
    f("toStartOfInterval") { es =>
      // interval literals carry micros (day-time) / months (year-month)
      // internally — read the foldable value, not a unit-dependent cast
      require(es(1).foldable, "toStartOfInterval: INTERVAL literal required")
      (es(1).dataType, es(1).eval()) match {
        case (_: DayTimeIntervalType, us: java.lang.Long) =>
          val ivSec = math.max(1L, us.longValue() / 1000000L)
          val sec = Cast(Cast(es.head, TimestampType), LongType)
          Cast(SecondsToTimestamp(Multiply(
            IntegralDivide(sec, Literal(ivSec)), Literal(ivSec))), TimestampNTZType)
        case (_: YearMonthIntervalType, months: java.lang.Integer) =>
          val n = math.max(1, months.intValue())
          val m0 = Add(Multiply(Year(es.head), Literal(12L)),
            Subtract(Cast(Month(es.head), LongType), Literal(1L)))
          val mt = Multiply(IntegralDivide(m0, Literal(n.toLong)), Literal(n.toLong))
          Cast(MakeDate(Cast(IntegralDivide(mt, Literal(12L)), IntegerType),
            Cast(Add(Pmod(mt, Literal(12L)), Literal(1L)), IntegerType),
            Literal(1)), TimestampNTZType)
        case (other, _) => throw new IllegalArgumentException(
          s"toStartOfInterval: INTERVAL literal required, got ${other.simpleString}")
      }
    }
    // CH window-view time buckets: tumble/hop produce Spark's window
    // struct (start, end) — the analyzer's TimeWindowing rule expands
    // them in GROUP BY exactly like window()
    def ivMicros(e: Expression, what: String): Long = {
      require(e.foldable, s"$what: INTERVAL literal required")
      (e.dataType, e.eval()) match {
        case (_: DayTimeIntervalType, us: java.lang.Long) => us.longValue()
        case (t, _) => throw new IllegalArgumentException(
          s"$what: day-time INTERVAL required, got ${t.simpleString}")
      }
    }
    f("tumble") { es =>
      val iv = ivMicros(es(1), "tumble")
      TimeWindow(es(0), iv, iv, 0L)
    }
    f("hop") { es =>
      // CH hop(ts, hop_interval, window_interval)
      TimeWindow(es(0), ivMicros(es(2), "hop"), ivMicros(es(1), "hop"), 0L)
    }
    f("tumbleStart") { es =>
      if (es.length == 1) org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(es.head, Literal("start"))
      else {
        val iv = ivMicros(es(1), "tumbleStart")
        org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(TimeWindow(es(0), iv, iv, 0L), Literal("start"))
      }
    }
    f("tumbleEnd") { es =>
      if (es.length == 1) org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(es.head, Literal("end"))
      else {
        val iv = ivMicros(es(1), "tumbleEnd")
        org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(TimeWindow(es(0), iv, iv, 0L), Literal("end"))
      }
    }
    // parseDateTime with the CH/MySQL specifiers formatDateTime uses
    f("parseDateTime") { es =>
      val fmt = es(1) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"parseDateTime: format must be a string literal, got $other")
      }
      Cast(SecondsToTimestamp(UnixTimestamp(es.head,
        Literal(ChCompat.chFormatToJava(fmt)))), TimestampNTZType)
    }
    // best-effort parse: ISO (native cast), slashed/dotted forms, bare
    // unix seconds — first non-null wins, null if nothing fits
    f("parseDateTimeBestEffort") { es =>
      val s = es.head
      def tryFmt(p: String): Expression =
        SecondsToTimestamp(UnixTimestamp(s, Literal(p), None, failOnError = false))
      Cast(Coalesce(Seq(
        Cast(s, TimestampType, None, EvalMode.TRY),
        tryFmt("yyyy/MM/dd HH:mm:ss"),
        tryFmt("yyyy/MM/dd"),
        tryFmt("dd.MM.yyyy HH:mm:ss"),
        tryFmt("dd.MM.yyyy"),
        If(RLike(s, Literal("^\\d{9,10}$")),
          SecondsToTimestamp(Cast(s, LongType)), Literal(null, TimestampType))
      )), TimestampNTZType)
    }
    f("fromUnixTimestamp") { es =>
      if (es.length == 1) Cast(SecondsToTimestamp(es.head), TimestampNTZType)
      else {
        val fmt = es(1) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"fromUnixTimestamp: format must be a string literal, got $other")
        }
        DateFormatClass(SecondsToTimestamp(es.head),
          Literal(ChCompat.chFormatToJava(fmt)))
      }
    }
    // CH dateTrunc spelling of date_trunc (unit first, like Spark)
    f("dateTrunc") { es => TruncTimestamp(es(0), es(1)) }
    // ---- misc aggregates / aliases ------------------------------------
    // exactly one distinct value → that value, else NULL
    f("singleValueOrNull") { es =>
      If(EqualTo(Count(Seq(es.head)).toAggregateExpression(isDistinct = true),
        Literal(1L)), Min(es.head).toAggregateExpression(), Literal(null, NullType))
    }
    // CH groupConcat / arrayStringConcat-over-groupArray shorthand
    // (arrival order, like CH without ORDER BY)
    f("groupConcat") { es =>
      val sep = if (es.length >= 2) es(1) else Literal("")
      ArrayJoin(CollectList(es.head).toAggregateExpression(), sep, None)
    }
    // CH window-frame spellings of lag/lead
    f("lagInFrame") { es =>
      new Lag(es(0), if (es.length >= 2) es(1) else Literal(1),
        if (es.length >= 3) es(2) else Literal(null), false)
    }
    f("leadInFrame") { es =>
      new Lead(es(0), if (es.length >= 2) es(1) else Literal(1),
        if (es.length >= 3) es(2) else Literal(null), false)
    }
    // typed empty-array constructors
    for ((n, t) <- Seq(
        "emptyArrayUInt8" -> LongType, "emptyArrayUInt16" -> LongType,
        "emptyArrayUInt32" -> LongType, "emptyArrayUInt64" -> LongType,
        "emptyArrayInt8" -> LongType, "emptyArrayInt16" -> LongType,
        "emptyArrayInt32" -> LongType, "emptyArrayInt64" -> LongType,
        "emptyArrayFloat32" -> DoubleType, "emptyArrayFloat64" -> DoubleType,
        "emptyArrayString" -> StringType, "emptyArrayDate" -> DateType,
        "emptyArrayDateTime" -> TimestampNTZType))
      f(n) { _ => Literal.create(Array.empty[Any], ArrayType(t)) }
    // CH defaultValueOfArgumentType(expr): the argument TYPE's default
    // value (0 / '' / zero-date ...). Also the omitted-default leg of the
    // ChSql `neighbor` → leadInFrame rewrite.
    f("defaultValueOfArgumentType") { es =>
      require(es.length == 1,
        s"defaultValueOfArgumentType expects 1 argument, got ${es.length}")
      DefaultValueOfArgumentType(es.head)
    }
    // multiIf(c1,v1, c2,v2, ..., else) — CH's flat CASE form
    f("multiIf") { es =>
      require(es.length >= 3 && es.length % 2 == 1,
        s"multiIf needs cond/value pairs plus an else, got ${es.length} args")
      CaseWhen(es.dropRight(1).grouped(2).map(p => (p(0), p(1))).toSeq, Some(es.last))
    }

    // ---- common CH aggregate names beyond the reference's own queries ----
    f("argMax") { es => MaxBy(es(0), es(1)).toAggregateExpression() }
    f("argMin") { es => MinBy(es(0), es(1)).toAggregateExpression() }
    // silent extra arguments are the same wrong-statistic trap the
    // -Stable aliases guard against — enforce arity on this family too
    def arity(name: String, es: Seq[Expression], n: Int): Unit =
      require(es.length == n,
        s"$name expects exactly $n argument(s), got ${es.length}")
    // the -If combinator on argMin/argMax: a false condition nulls BOTH
    // lanes, and min_by/max_by skip null-ordering rows
    f("argMaxIf") { es =>
      arity("argMaxIf", es, 3)
      MaxBy(onlyIf(es(2), es(0)), onlyIf(es(2), es(1))).toAggregateExpression()
    }
    f("argMinIf") { es =>
      arity("argMinIf", es, 3)
      MinBy(onlyIf(es(2), es(0)), onlyIf(es(2), es(1))).toAggregateExpression()
    }
    // CH groupBitAnd/Or/Xor: bitwise integer folds — Spark's native bit
    // aggregates under the CH spellings
    f("groupBitAnd") { es =>
      arity("groupBitAnd", es, 1); BitAndAgg(es.head).toAggregateExpression()
    }
    f("groupBitOr") { es =>
      arity("groupBitOr", es, 1); BitOrAgg(es.head).toAggregateExpression()
    }
    f("groupBitXor") { es =>
      arity("groupBitXor", es, 1); BitXorAgg(es.head).toAggregateExpression()
    }
    // CH groupArrayLast(x, N) (flat spelling of groupArrayLast(N)(x)):
    // the LAST N values in arrival order — same block-order caveat as
    // groupArray/groupArrayMovingSum (pin the order upstream)
    f("groupArrayLast") { es =>
      arity("groupArrayLast", es, 2)
      val arr = CollectList(es(0)).toAggregateExpression()
      val n = Cast(es(1), IntegerType)
      Slice(arr, new Greatest(Seq(
        Add(Subtract(Size(arr), n), Literal(1)), Literal(1))), n)
    }
    f("groupArray") { es => CollectList(es.head).toAggregateExpression() }
    f("groupUniqArray") { es => CollectSet(es.head).toAggregateExpression() }
    // CH anyLast ≙ ignore-null last. CH `any` is deliberately NOT
    // registered: Spark's built-in `any` is the boolean OR aggregate and
    // replacing it would silently change standard Spark SQL in the same
    // session — use Spark's `any_value` (same semantics as CH any).
    f("anyLast") { es => new Last(es.head, true).toAggregateExpression() }
    // the -RespectNulls spellings: a NULL row is a real candidate (First/
    // Last with ignoreNulls=false); same arbitrary-pick contract as CH
    f("anyRespectNulls") { es => new First(es.head, false).toAggregateExpression() }
    f("firstValueRespectNulls") { es => new First(es.head, false).toAggregateExpression() }
    f("lastValueRespectNulls") { es => new Last(es.head, false).toAggregateExpression() }
    f("anyLastRespectNulls") { es => new Last(es.head, false).toAggregateExpression() }
    // CH sumWithOverflow: sum IN the argument's own type, wrapping on
    // overflow — LEGACY-mode SUM (the session's ANSI default would throw
    // on the wrap), truncated back to the input type for sub-Long
    // integrals by SumInInputType (a post-resolution wrapper: the input
    // type isn't inspectable in this pre-analysis builder). Truncation
    // after the Long-wrapping sum IS mod-2^32/2^16 arithmetic (2^32
    // divides 2^64), so the wrap semantics are exact, not approximated.
    f("sumWithOverflow") { es =>
      SumInInputType(Sum(es.head, NumericEvalContext(EvalMode.LEGACY)).toAggregateExpression())
    }
    // the -Stable statistic spellings: CH guarantees a numerically stable
    // (and merge-order-robust) algorithm for these — alias them onto the
    // centered co-moment matrix machinery (StatMatrix), which is exactly
    // that; scalars extract the [0][1] (pair) or [0][0] (single) entry
    def mx(name: String, mode: String, es: Seq[Expression], arity: Int): Expression = {
      // silent take() would turn corrStable(x) into the constant 1.0 —
      // a typo must be an error, not a wrong statistic
      require(es.length == arity,
        s"$name expects exactly $arity argument(s), got ${es.length}")
      GetArrayItem(GetArrayItem(
        CoMomentMatrixAgg(es, mode).toAggregateExpression(), Literal(0)),
        Literal(if (arity > 1) 1 else 0))
    }
    f("corrStable") { es => mx("corrStable", "corr", es, 2) }
    f("covarPopStable") { es => mx("covarPopStable", "covarPop", es, 2) }
    f("covarSampStable") { es => mx("covarSampStable", "covarSamp", es, 2) }
    f("varPopStable") { es => mx("varPopStable", "covarPop", es, 1) }
    f("varSampStable") { es => mx("varSampStable", "covarSamp", es, 1) }
    f("stddevPopStable") { es => Sqrt(mx("stddevPopStable", "covarPop", es, 1)) }
    f("stddevSampStable") { es => Sqrt(mx("stddevSampStable", "covarSamp", es, 1)) }
    // CH groupArraySorted(N)(x) in the flat spelling (x, N): the smallest
    // N values in ascending order — collect + sort + slice; bounded
    // output, but the collect buffer is group-sized (like medianExact;
    // use topK/topk_by_score when the group can be huge)
    f("groupArraySorted") { es =>
      Slice(new SortArray(CollectList(es(0)).toAggregateExpression()),
        Literal(1), es(1))
    }
    f("quantileExact") { es => new Percentile(es(0), es(1)) }
    // CH's no-interpolation exact variants: the element at the lower /
    // upper bracketing index of level·(n−1) in the sorted values
    def exactBracket(es: Seq[Expression], high: Boolean): Expression = {
      val arr = new SortArray(CollectList(es(0)).toAggregateExpression())
      val pos = Multiply(Cast(es(1), DoubleType),
        Cast(Subtract(Size(arr), Literal(1)), DoubleType))
      val idx = if (high) Cast(new Ceil(pos), IntegerType)
        else Cast(new Floor(pos), IntegerType)
      ElementAt(arr, Add(idx, Literal(1)))
    }
    f("quantileExactLow") { es => exactBracket(es, high = false) }
    f("quantileExactHigh") { es => exactBracket(es, high = true) }
    f("medianExactLow") { es => exactBracket(Seq(es.head, Literal(0.5d)), high = false) }
    f("medianExactHigh") { es => exactBracket(Seq(es.head, Literal(0.5d)), high = true) }
    // the Excel-convention exact variants: Inclusive = PERCENTILE.INC =
    // R-7, which is exactly Spark's Percentile interpolation (and DuckDB's
    // quantile_cont — q166 gates the three implementations against each
    // other); Exclusive = PERCENTILE.EXC = R-6, h = level·(n+1) over the
    // sorted values with the rank clamped to [1, n]
    f("quantileExactInclusive") { es => new Percentile(es(0), es(1)) }
    f("medianExactInclusive") { es => new Percentile(es(0), Literal(0.5d)) }
    def exactExclusive(es: Seq[Expression]): Expression = {
      // PERCENTILE.EXC is undefined at the boundaries — CH throws for
      // level <= 0 or >= 1, and silently clamping a typo like level=0 to
      // the minimum would mask it. Validate the (foldable) level at
      // registration, like the arity guards on the newer registrations.
      es(1) match {
        case lv if lv.foldable =>
          val v: Option[Double] = lv.eval(InternalRow.empty) match {
            case null => None
            case d: Decimal => Some(d.toDouble)
            case n: Number => Some(n.doubleValue())
            case _ => None
          }
          require(v.exists(d => d > 0.0d && d < 1.0d),
            s"quantileExactExclusive: level must be in (0, 1) exclusive " +
              s"(PERCENTILE.EXC is undefined at the boundaries), got ${v.orNull}")
        case _ => // non-literal level: range-checked by data, as in CH
      }
      val arr = new SortArray(CollectList(es(0)).toAggregateExpression())
      val n = Cast(Size(arr), DoubleType)
      val h = Multiply(Cast(es(1), DoubleType),
        Add(n, Literal(1.0d)))
      val hc = new Greatest(Seq(Literal(1.0d), new Least(Seq(h, n))))
      val lo = Cast(new Floor(hc), IntegerType)
      val hi = new Least(Seq(Add(lo, Literal(1)), Cast(Size(arr), IntegerType)))
      val xlo = Cast(ElementAt(arr, lo), DoubleType)
      val xhi = Cast(ElementAt(arr, hi), DoubleType)
      // an empty/all-NULL group collapses the sorted array to []: lo=1 but
      // hi=LEAST(2,0)=0, and ElementAt(arr, 0)/out-of-bounds would THROW
      // under the session's ANSI default — return NULL like Percentile
      If(EqualTo(Size(arr), Literal(0)), Literal(null, DoubleType),
        Add(xlo, Multiply(Subtract(hc, Cast(lo, DoubleType)), Subtract(xhi, xlo))))
    }
    f("quantileExactExclusive") { es => exactExclusive(es) }
    f("medianExactExclusive") { es => exactExclusive(Seq(es.head, Literal(0.5d))) }
    // CH quantileTiming/quantileDeterministic are approximation schemes
    // (timing-bucket histogram / sampling with a determinism key); both
    // map to the EXACT percentile here — a strict-superset guarantee
    // (deterministic, and exact where CH documents ~1% error). The
    // determinism-key argument of quantileDeterministic is accepted and
    // ignored (exactness needs no tie-break key).
    f("quantileTiming") { es => new Percentile(es(0), es(1)) }
    f("medianTiming") { es => new Percentile(es(0), Literal(0.5d)) }
    f("quantileDeterministic") { es => new Percentile(es(0), es(2)) }
    f("medianDeterministic") { es => new Percentile(es(0), Literal(0.5d)) }
    f("quantileTDigest") { es => new ApproximatePercentile(es(0), es(1)) }
    // CH plural quantiles(p1,...,pn)(x) in the flat spelling
    // (x, p1, ..., pn): one aggregation pass, array out — explode for a
    // row-per-quantile result
    f("quantilesExact") { es =>
      require(es.length >= 2, s"quantilesExact needs (x, p1, ...), got ${es.length} args")
      new Percentile(es(0), CreateArray(es.drop(1)))
    }
    f("quantilesTDigest") { es =>
      require(es.length >= 2, s"quantilesTDigest needs (x, p1, ...), got ${es.length} args")
      new ApproximatePercentile(es(0), CreateArray(es.drop(1)))
    }
    // CH topK(k)(x) -> topK(x[, k]): SpaceSaving heavy hitters, values only
    // (the est/err form is the library's freq_topk)
    f("topK") { es => FreqTopK.buildAgg(es, valuesOnly = true) }
    f("topKWeighted") { es => FreqTopK.buildWeighted(es, valuesOnly = true) }
    // retention(c1..cn): array of 0/1 flags — r[0] = 1 iff c1 held on any
    // row of the group, r[i] = 1 iff BOTH c1 and ci held on (possibly
    // different) rows — CH's cohort-retention aggregate, composed from
    // plain boolean Max aggregates (no custom state)
    f("retention") { es =>
      require(es.nonEmpty, "retention needs at least one condition")
      def met(c: Expression): Expression =
        Coalesce(Seq(new Max(c).toAggregateExpression(), Literal(false)))
      val base = met(es.head)
      CreateArray(es.zipWithIndex.map { case (c, i) =>
        Cast(if (i == 0) base else And(base, met(c)), IntegerType)
      })
    }

    // ---- uniq family (doc:304-505) -----------------------------------
    // one-shot = finalize(state): the same Datasketches HLL as the -State
    // path, so uniqCombined(x) == uniqCombinedMerge(uniqCombinedState(x))
    // exactly — CH's consistency guarantee between the two forms
    f("uniqCombined") { es => HllSketchEstimate(hllState(es.head)) }
    // distinct Count, not Size(CollectSet): no per-group value buffer
    f("uniqExact") { es => Count(Seq(es.head)).toAggregateExpression(isDistinct = true) }
    f("uniqExactIf") { es =>
      Count(Seq(onlyIf(es(1), es(0)))).toAggregateExpression(isDistinct = true)
    }
    f("uniqCombinedState") { es => hllState(es.head) }
    f("uniqCombinedStateIf") { es => hllState(onlyIf(es(1), es(0))) }
    f("uniqCombinedMergeState") { es => hllMerge(es.head) }
    f("uniqCombinedMerge") { es => HllSketchEstimate(hllMerge(es.head)) }
    f("uniqCombinedIf") { es => HllSketchEstimate(hllState(onlyIf(es(1), es(0)))) }

    // ---- -Distinct / -OrNull / -OrDefault combinators ----------------
    f("sumDistinct") { es => new Sum(es.head).toAggregateExpression(isDistinct = true) }
    f("avgDistinct") { es => new Average(es.head).toAggregateExpression(isDistinct = true) }
    f("countDistinct") { es => Count(es).toAggregateExpression(isDistinct = true) }
    f("groupArrayDistinct") { es => CollectSet(es.head).toAggregateExpression() }
    // -OrNull: NULL instead of the type default on an empty set. min/max/
    // any are already NULL-on-empty in Spark; sum/count need the guard.
    f("sumOrNull") { es =>
      If(EqualTo(Count(es).toAggregateExpression(), Literal(0L)),
        Literal(null, NullType), new Sum(es.head).toAggregateExpression())
    }
    f("countOrNull") { es =>
      val c = Count(es).toAggregateExpression()
      If(EqualTo(c, Literal(0L)), Literal(null, NullType), c)
    }
    f("avgOrNull") { es => new Average(es.head).toAggregateExpression() }
    f("minOrNull") { es => Min(es.head).toAggregateExpression() }
    f("maxOrNull") { es => Max(es.head).toAggregateExpression() }
    // -OrDefault: the explicit default when the set is empty
    f("sumOrDefault") { es =>
      Coalesce(Seq(new Sum(es.head).toAggregateExpression(),
        if (es.length >= 2) es(1) else Literal(0L)))
    }
    f("minOrDefault") { es =>
      Coalesce(Seq(Min(es.head).toAggregateExpression(),
        if (es.length >= 2) es(1) else Literal(0L)))
    }
    f("maxOrDefault") { es =>
      Coalesce(Seq(Max(es.head).toAggregateExpression(),
        if (es.length >= 2) es(1) else Literal(0L)))
    }
    f("avgOrDefault") { es =>
      Coalesce(Seq(new Average(es.head).toAggregateExpression(),
        if (es.length >= 2) es(1) else Literal(0.0)))
    }
    // ---- -Resample combinator ----------------------------------------
    // CH agg-Resample(start, end, step)(x, key): one aggregate per
    // [start+i·step, start+(i+1)·step) bucket, returned as an array.
    // The bounds are literals, so the buckets EXPAND at registration into
    // plain -If aggregates — each codegen'd and map-side combined; the
    // array assembles after aggregation.
    def resample(es: Seq[Expression], mk: Expression => Expression): Expression = {
      require(es.length == 5, "usage: aggResample(x, key, start, end, step)")
      def litLong(e: Expression, what: String): Long = e match {
        case l if l.foldable => l.eval() match {
          case n: Number => n.longValue()
          case other => throw new IllegalArgumentException(s"$what: int literal, got $other")
        }
        case other => throw new IllegalArgumentException(s"$what: int literal, got $other")
      }
      val start = litLong(es(2), "start")
      val end = litLong(es(3), "end")
      val step = litLong(es(4), "step")
      require(step > 0 && end > start, "resample: need end > start, step > 0")
      val buckets = ((end - start) + step - 1) / step
      require(buckets <= 1024, s"resample: $buckets buckets (cap 1024)")
      CreateArray((0L until buckets).map { i =>
        val lo = start + i * step
        val hi = math.min(lo + step, end)
        mk(onlyIf(And(GreaterThanOrEqual(es(1), Literal(lo)),
          LessThan(es(1), Literal(hi))), es(0)))
      })
    }
    // empty buckets yield the aggregate's CH default (0), not NULL —
    // a NULL would silently vanish from concat_ws renderings and CH's
    // -Resample emits the default there
    def orZero(e: Expression, zero: Expression): Expression = Coalesce(Seq(e, zero))
    f("sumResample") { es =>
      resample(es, x => orZero(new Sum(x).toAggregateExpression(), Literal(0L)))
    }
    f("countResample") { es =>
      resample(es, x => Count(Seq(x)).toAggregateExpression())
    }
    f("avgResample") { es =>
      resample(es, x => orZero(new Average(x).toAggregateExpression(), Literal(0.0)))
    }
    f("minResample") { es =>
      resample(es, x => orZero(Min(x).toAggregateExpression(), Literal(0L)))
    }
    f("maxResample") { es =>
      resample(es, x => orZero(Max(x).toAggregateExpression(), Literal(0L)))
    }
    f("uniqExactResample") { es =>
      resample(es, x => Count(Seq(x)).toAggregateExpression(isDistinct = true))
    }
    // plural weighted quantiles — genuinely one map, one scan, N reads
    f("quantilesExactWeighted") { es =>
      require(es.length >= 3, "quantilesExactWeighted(x, w, p1, ...)")
      QuantilesExactWeightedAgg(es(0), es(1), es.drop(2)).toAggregateExpression()
    }
    // capped distinct collect: CH's groupUniqArray(max_size)(x) keeps an
    // arbitrary max_size subset — refined here to the SORTED first
    // max_size, with per-group state BOUNDED at max_size elements (an
    // unbounded collect-then-slice would defeat the cap's purpose)
    f("groupUniqArrayCapped") { es =>
      BoundedDistinctAgg(es(0), es(1)).toAggregateExpression()
    }
    // ---- sum/count combinators ---------------------------------------
    // SimpleAggregateFunction(sum): the partial IS the value, so -State,
    // -SimpleState and -Merge are all plain re-sum (doc:510-605)
    f("sumState") { es => new Sum(es.head).toAggregateExpression() }
    f("sumSimpleState") { es => new Sum(es.head).toAggregateExpression() }
    f("sumMerge") { es => new Sum(es.head).toAggregateExpression() }
    f("sumIf") { es => new Sum(onlyIf(es(1), es(0))).toAggregateExpression() }
    f("countIf") { es => Count(Seq(onlyIf(es.head, Literal(1)))).toAggregateExpression() }
    f("minIf") { es => Min(onlyIf(es(1), es(0))).toAggregateExpression() }
    f("maxIf") { es => Max(onlyIf(es(1), es(0))).toAggregateExpression() }
    f("avgIf") { es => new Average(onlyIf(es(1), es(0))).toAggregateExpression() }
    // CH avgWeighted(x, w) = Σ(x·w)/Σ(w) — two aggregates under one ratio
    // (double division, like CH's Float64 result)
    f("avgWeighted") { es =>
      Divide(
        Cast(new Sum(Multiply(es(0), es(1))).toAggregateExpression(), DoubleType),
        Cast(new Sum(es(1)).toAggregateExpression(), DoubleType))
    }
    // CH sumCount(x) = (sum, count) tuple in one pass — two built-in
    // aggregates under one struct (both codegen'd, map-side combined)
    f("sumCount") { es =>
      CreateNamedStruct(Seq(
        Literal("sum"), new Sum(es.head).toAggregateExpression(),
        Literal("count"), Count(Seq(es.head)).toAggregateExpression()))
    }
    // CH boundingRatio(x, y): slope between the leftmost and rightmost
    // points — (y@max(x) − y@min(x)) / (max(x) − min(x))
    f("boundingRatio") { es =>
      Divide(
        Cast(Subtract(MaxBy(es(1), es(0)).toAggregateExpression(),
          MinBy(es(1), es(0)).toAggregateExpression()), DoubleType),
        Cast(Subtract(Max(es(0)).toAggregateExpression(),
          Min(es(0)).toAggregateExpression()), DoubleType))
    }
    // CH simpleLinearRegression(x, y) = (k, b) fitting y = k·x + b —
    // Spark's numerically-stable REGR_* aggregates under one struct
    f("simpleLinearRegression") { es =>
      val y = Cast(es(1), DoubleType)
      val x = Cast(es(0), DoubleType)
      CreateNamedStruct(Seq(
        Literal("k"), RegrSlope(y, x).toAggregateExpression(),
        Literal("b"), RegrIntercept(y, x).toAggregateExpression()))
    }

    // ---- JSON family (CH JSONExtract* / visitParam* / simpleJSON*) ----
    // CH's key arguments are NAMES, not paths — build the '$.name' path
    // inline (non-literal keys parse per row, same as CH). The visitParam/
    // simpleJSON spellings are CH's no-nesting fast path; on well-formed
    // JSON they agree with the full parser, so both map to GetJsonObject.
    // Divergence note: JSONExtractString on a JSON `null` returns SQL NULL
    // here (CH returns '').
    def jsonPath(key: Expression): Expression =
      Concat(Seq(Literal("$."), key))
    def jsonGet(es: Seq[Expression]): Expression =
      GetJsonObject(es(0), jsonPath(es(1)))
    for (n <- Seq("JSONExtractString", "visitParamExtractString",
        "simpleJSONExtractString", "JSONExtractRaw"))
      f(n) { es => jsonGet(es) }
    for ((n, t) <- Seq("JSONExtractInt" -> LongType,
        "visitParamExtractInt" -> LongType, "simpleJSONExtractInt" -> LongType,
        "JSONExtractUInt" -> LongType,
        "JSONExtractFloat" -> DoubleType, "visitParamExtractFloat" -> DoubleType,
        "simpleJSONExtractFloat" -> DoubleType,
        "JSONExtractBool" -> BooleanType, "visitParamExtractBool" -> BooleanType))
      f(n) { es => Cast(jsonGet(es), t) }
    for (n <- Seq("JSONHas", "visitParamHas", "simpleJSONHas"))
      f(n) { es => IsNotNull(jsonGet(es)) }
    f("JSONExtractKeys") { es =>
      if (es.length == 1) JsonObjectKeys(es.head)
      else JsonObjectKeys(jsonGet(es))
    }
    // array length for arrays, key count for objects (CH's length contract)
    f("JSONLength") { es =>
      val j = if (es.length == 1) es.head else jsonGet(es)
      Coalesce(Seq(LengthOfJsonArray(j), Size(JsonObjectKeys(j))))
    }

    // ---- second/higher-moment statistics (CH stat aggregates) ---------
    // covarPop/varPop/stddevPop + Samp twins map onto Spark's co-moment
    // aggregates (same population/sample formulas as CH's Float64 forms).
    // skewPop = m3/m2^1.5 — Spark's skewness IS the population formula;
    // kurtPop = m4/m2^2, Spark's kurtosis is the EXCESS form, so +3.
    // For hash-gate-exact statistics use graft.functions.Moments instead
    // (integer moments, order-insensitive); these carry CH's own
    // float-accumulation contract for dialect queries.
    f("covarPop") { es => CovPopulation(es(0), es(1)).toAggregateExpression() }
    f("covarSamp") { es => CovSample(es(0), es(1)).toAggregateExpression() }
    f("varPop") { es => VariancePop(es.head).toAggregateExpression() }
    f("varSamp") { es => VarianceSamp(es.head).toAggregateExpression() }
    f("stddevPop") { es => StddevPop(es.head).toAggregateExpression() }
    f("stddevSamp") { es => StddevSamp(es.head).toAggregateExpression() }
    f("skewPop") { es => Skewness(es.head).toAggregateExpression() }
    f("kurtPop") { es =>
      Add(Kurtosis(es.head).toAggregateExpression(), Literal(3.0d))
    }
    // CH's sample moments rescale the population central moments onto the
    // SAMPLE variance: skewSamp = m3/varSamp^1.5 = g1·((n−1)/n)^1.5 and
    // kurtSamp = m4/varSamp² = kurtPop·((n−1)/n)² (non-excess convention)
    f("skewSamp") { es =>
      val n = Cast(Count(Seq(es.head)).toAggregateExpression(), DoubleType)
      Multiply(Skewness(es.head).toAggregateExpression(),
        Pow(Divide(Subtract(n, Literal(1.0)), n), Literal(1.5)))
    }
    f("kurtSamp") { es =>
      val n = Cast(Count(Seq(es.head)).toAggregateExpression(), DoubleType)
      val ratio = Divide(Subtract(n, Literal(1.0)), n)
      Multiply(Add(Kurtosis(es.head).toAggregateExpression(), Literal(3.0d)),
        Multiply(ratio, ratio))
    }
    // bare CH quantile/median are the approximate family — mapped to the
    // exact percentile (deterministic superset, same flat-spelling
    // convention as quantileExact); quantiles is the plural
    f("quantile") { es =>
      new Percentile(es(0), if (es.length >= 2) es(1) else Literal(0.5d))
    }
    f("median") { es => new Percentile(es(0), Literal(0.5d)) }
    f("quantiles") { es =>
      require(es.length >= 2, s"quantiles needs (x, p1, ...), got ${es.length} args")
      new Percentile(es(0), CreateArray(es.drop(1)))
    }

    // ---- bitmap family (dwm:134-139, 184-185, 280-290) ---------------
    f("groupBitmap") { es =>
      // cardinality of the aggregated bitmap — scalar-on-aggregate needs the
      // aggregate wrapped explicitly when composed inside another expression
      BitmapCardinalityExpr(BitmapAggregate(es.head).toAggregateExpression())
    }
    f("groupBitmapState") { es => BitmapAggregate(es.head).toAggregateExpression() }
    f("groupBitmapStateIf") { es =>
      BitmapAggregate(onlyIf(es(1), es(0))).toAggregateExpression()
    }
    f("groupBitmapMergeState") { es => BitmapMergeAggregate(es.head).toAggregateExpression() }
    f("groupBitmapMerge") { es =>
      BitmapCardinalityExpr(BitmapMergeAggregate(es.head).toAggregateExpression())
    }
    // CH's aggregate-form folds over a bitmap-STATE column: plain
    // spelling = folded cardinality, -State = the folded bitmap
    // (groupBitmapOrState ≡ groupBitmapMergeState; registered for the
    // spelling's sake)
    for (op <- Seq("and", "or", "xor")) {
      f(s"groupBitmap${op.capitalize}") { es =>
        BitmapCardinalityExpr(
          BitmapFoldAggregate(es.head, op).toAggregateExpression())
      }
      f(s"groupBitmap${op.capitalize}State") { es =>
        BitmapFoldAggregate(es.head, op).toAggregateExpression()
      }
    }
    f("bitmapCardinality") { es => BitmapCardinalityExpr(es.head) }
    f("bitmapAnd") { es => BitmapBinaryExpr(es(0), es(1), "and") }
    f("bitmapOr") { es => BitmapBinaryExpr(es(0), es(1), "or") }
    f("bitmapAndCardinality") { es => BitmapBinaryExpr(es(0), es(1), "and_card") }
    f("bitmapOrCardinality") { es => BitmapBinaryExpr(es(0), es(1), "or_card") }
    // the rest of CH's bitmap algebra (doc:1207-1238 uses and/or; the
    // full family completes the surface): xor/andnot + cardinalities,
    // membership predicates, array round-trips, extrema, subset slicing
    f("bitmapXor") { es => BitmapBinaryExpr(es(0), es(1), "xor") }
    f("bitmapAndnot") { es => BitmapBinaryExpr(es(0), es(1), "andnot") }
    f("bitmapXorCardinality") { es => BitmapBinaryExpr(es(0), es(1), "xor_card") }
    f("bitmapAndnotCardinality") { es => BitmapBinaryExpr(es(0), es(1), "andnot_card") }
    f("bitmapHasAll") { es => BitmapBinaryExpr(es(0), es(1), "has_all") }
    f("bitmapHasAny") { es => BitmapBinaryExpr(es(0), es(1), "has_any") }
    f("bitmapContains") { es => BitmapContainsExpr(es(0), es(1)) }
    f("bitmapToArray") { es => BitmapUnaryExpr(es.head, "to_array") }
    f("bitmapMin") { es => BitmapUnaryExpr(es.head, "min") }
    f("bitmapMax") { es => BitmapUnaryExpr(es.head, "max") }
    f("bitmapBuild") { es => BitmapBuildExpr(es.head) }
    f("bitmapSubsetInRange") { es => BitmapSubsetExpr(es(0), es(1), es(2), "range") }
    f("bitmapSubsetLimit") { es => BitmapSubsetExpr(es(0), es(1), es(2), "limit") }
    f("subBitmap") { es => BitmapSubsetExpr(es(0), es(1), es(2), "sub") }

    // ---- medianExact family (dwm:83,100,114) -------------------------
    f("medianExact") { es => new Percentile(es.head, Literal(0.5)) }
    f("medianExactState") { es =>
      SortArray(CollectList(es.head).toAggregateExpression(), Literal(true))
    }
    f("medianExactMergeState") { es => medianMerged(es.head) }
    f("medianExactMerge") { es => medianFinalize(medianMerged(es.head)) }

    // ---- quantileTDigest -State family: the BOUNDED quantile state
    // (GK summaries under the hood — see graft.functions.QuantileSketch
    // for the documented algorithm divergence; same state contract) ----
    f("quantileTDigestState") { es =>
      QuantileSketchAggregate(es.head, 0.01).toAggregateExpression()
    }
    f("quantileTDigestMergeState") { es =>
      QuantileSketchMergeAggregate(es.head).toAggregateExpression()
    }
    f("quantileTDigestMerge") { es =>
      // quantileTDigestMerge(0.5)(state) is CH's parameterized spelling;
      // the flat 2-arg form (state, q) is accepted here, 1-arg = median
      val q = (if (es.length > 1) es(1) else Literal(0.5)).eval() match {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: Number => n.doubleValue()
        case other => sys.error(s"quantileTDigestMerge: bad quantile literal $other")
      }
      QuantileSketchValueExpr(
        QuantileSketchMergeAggregate(es.head).toAggregateExpression(), q)
    }

    // ---- table functions ---------------------------------------------
    // numbers(N) / numbers(offset, N) — CH's generated source (doc:565-597
    // sizing experiments; SURVEY §2.1 S8); output column is `number` like
    // CH, not range()'s id
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "numbers", { es: Seq[Expression] =>
        def intLit(e: Expression, what: String): Long = e match {
          case Literal(v: Number, ByteType | ShortType | IntegerType | LongType) =>
            v.longValue()
          case other => throw new IllegalArgumentException(
            s"numbers: $what must be an integer literal, got: ${other.sql}")
        }
        val (start, count) = es match {
          case Seq(n) => (0L, intLit(n, "N"))
          case Seq(off, n) => (intLit(off, "offset"), intLit(n, "N"))
          case _ => throw new IllegalArgumentException(
            s"numbers takes 1 or 2 arguments, got ${es.length}")
        }
        val range = org.apache.spark.sql.catalyst.plans.logical.Range(
          start, start + count, 1L, None)
        org.apache.spark.sql.catalyst.plans.logical.Project(
          Seq(Alias(range.output.head, "number")()), range)
      }, "built-in")

    // merge('db', 'tables_regexp') — CH's union table function: every
    // table of `db` whose name matches the (unanchored) regex, unioned BY
    // NAME, with the `_table` virtual column naming each row's source.
    // Missing columns resolve as NULL (documented divergence: CH fills
    // type defaults). Tables enumerate at plan construction — the regex
    // is against the catalog, resolution stays with the analyzer.
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "merge", { es: Seq[Expression] =>
        require(es.length == 2, s"merge takes (db, tables_regexp), got ${es.length} args")
        val db = stringLit(es(0), "merge database")
        val re = stringLit(es(1), "merge tables_regexp").r
        // listTables(db) returns session temp views for ANY db argument;
        // CH merge() is database-scoped, so temp views only participate
        // when the caller targets the session's current database
        val tempOk = db.equalsIgnoreCase(spark.catalog.currentDatabase)
        val matches = spark.catalog.listTables(db).collect()
          .filter(t => !t.isTemporary || tempOk)
          .filter(t => re.findFirstIn(t.name).isDefined)
          .sortBy(_.name)
        require(matches.nonEmpty, s"merge: no tables in '$db' match '${re.pattern}'")
        import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedStar}
        import org.apache.spark.sql.catalyst.plans.logical.{Project, Union}
        val scans = matches.toSeq.map { t =>
          // temp views live outside the database namespace — single-part name
          val rel = UnresolvedRelation(
            if (t.isTemporary) Seq(t.name) else Seq(db, t.name))
          Project(Seq(UnresolvedStar(None),
            Alias(Literal(t.name), "_table")()), rel)
        }
        if (scans.length == 1) scans.head
        else Union(scans, byName = true, allowMissingCol = true)
      }, "built-in")

    // ---- dictionary lookup (dim.dict_user_dim.sql:24-27) -------------
    // key is cast to long (dictionary PRIMARY KEY is UInt64); TRY mode
    // makes uncastable keys act as missing rather than fail the job.
    // COMPLEX_KEY_HASHED dictionaries take the key tuple instead:
    // dictGet(d, a, tuple(k1, k2)) or the flat dictGet(d, a, k1, k2).
    f("dictGet") { es =>
      val dictName = stringLit(es(0), "dictGet dictionary name")
      val attr = stringLit(es(1), "dictGet attribute name")
      es.drop(2) match {
        case Seq(t: CreateNamedStruct) =>
          DictGetComplexExpr(dictName, attr, t.valExprs)
        case Seq(single) =>
          DictGetExpr(dictName, attr, Cast(single, LongType, None, EvalMode.TRY))
        case multi =>
          DictGetComplexExpr(dictName, attr, multi)
      }
    }
    // CH tuple(...) — here only meaningful as the dictGet key carrier, but
    // it resolves anywhere a struct does
    f("tuple")(es => CreateStruct(es))
  }

  /** The `-If` combinator: feed the value only where cond holds; Spark
    * aggregates skip nulls, exactly CH's conditional-aggregate semantics.
    * (Builders run on unresolved children, so the null literal is NullType
    * and the analyzer's If coercion widens it to the value's type.)
    */
  private def onlyIf(cond: Expression, value: Expression): Expression =
    If(cond, value, Literal(null))

  /** CH/MySQL formatDateTime specifiers → Java DateTimeFormatter pattern.
    * Note %i is minute (the MySQL convention CH follows); unsupported
    * specifiers fail loudly rather than formatting garbage. Literal
    * letters are single-quoted for Java; quotes themselves are doubled.
    */
  private[functions] def chFormatToJava(fmt: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' => out.append("yyyy")
          case 'y' => out.append("yy")
          case 'm' => out.append("MM")
          case 'd' => out.append("dd")
          case 'H' => out.append("HH")
          case 'i' => out.append("mm")
          case 'S' => out.append("ss")
          case 'F' => out.append("yyyy-MM-dd")
          case 'T' => out.append("HH:mm:ss")
          case '%' => out.append('%')
          case other => throw new IllegalArgumentException(
            s"formatDateTime: unsupported specifier %$other in '$fmt'")
        }
        i += 2
      } else {
        if (c == '\'') out.append("''")
        else if (c.isLetter) out.append('\'').append(c).append('\'')
        else out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** uniqCombinedState: Datasketches HLL partial, lgK=12 everywhere so
    * states written by any query merge with any other (doc:304-505).
    */
  private def hllState(child: Expression): AggregateExpression =
    HllSketchAgg(child, Literal(12)).toAggregateExpression()

  private def hllMerge(child: Expression): AggregateExpression =
    HllUnionAgg(child, Literal(true)).toAggregateExpression()

  /** Merge sorted-array median states: concat + re-sort. Built once and
    * shared by reference inside medianFinalize so the aggregate runs once.
    */
  private def medianMerged(child: Expression): Expression =
    SortArray(Flatten(CollectList(child).toAggregateExpression()), Literal(true))

  /** Exact median of a sorted-array state — the expression twin of
    * [[Medians.median_finalize]] (linear interpolation on even n).
    * `sorted` is referenced multiple times as the SAME instance, so the
    * planner computes the underlying aggregate exactly once.
    */
  private def medianFinalize(sorted: Expression): Expression = {
    val n = Size(sorted)
    def at(i: Expression) = Cast(ElementAt(sorted, Cast(i, IntegerType)), DoubleType)
    val lo = at(IntegralDivide(Add(n, Literal(1)), Literal(2)))
    val hi = at(Add(IntegralDivide(n, Literal(2)), Literal(1)))
    If(EqualTo(n, Literal(0)), Literal.create(null, DoubleType),
      If(EqualTo(Pmod(n, Literal(2)), Literal(1)), lo,
        Divide(Add(lo, hi), Literal(2.0d))))
  }

  private def stringLit(e: Expression, what: String): String = e match {
    case Literal(s, StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got: ${other.sql}")
  }

  /** CH's `LIMIT n BY group` clause (first n rows per group in the given
    * order) as a DataFrame transform — Spark's parser has no LIMIT BY, so
    * this is the API-level equivalent: row_number over (by, order), keep
    * rn <= n. Same distributed shape as CH's implementation: one shuffle
    * on the BY key, each group reduced in its own task — the operator is
    * only scale-safe when the BY key is high-cardinality (per-customer,
    * per-document…), exactly as in CH. Callers must include a total
    * tie-break in `order` for deterministic output.
    */
  def limitBy(df: org.apache.spark.sql.DataFrame, n: Int,
      by: Seq[org.apache.spark.sql.Column],
      order: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    df.withColumn("__rn", row_number().over(Window.partitionBy(by: _*).orderBy(order: _*)))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}

/** hostName() — the executing host, evaluated executor-side per partition
  * (CH uses it to see which shard answered; here, which executor).
  */
case class HostNameExpr()
  extends LeafExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = false
  // resolved once per executor JVM, not per row
  @transient private lazy val host: org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.net.InetAddress.getLocalHost.getHostName)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = host
  override def prettyName: String = "hostName"
}

/** byteSize(x) — approximate in-memory size of a value, the quantity the
  * reference doc compares across AggregateFunction vs SimpleAggregateFunction
  * states (doc:507-607). Exact for binary/string payloads (the state-sizing
  * use case); fixed-width types report their width.
  */
case class ByteSizeExpr(child: Expression)
  extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = java.lang.Long.valueOf(v match {
    case b: Array[Byte] => b.length.toLong
    case s: org.apache.spark.unsafe.types.UTF8String => s.numBytes.toLong
    case a: org.apache.spark.sql.catalyst.util.ArrayData =>
      child.dataType match {
        case ArrayType(et, _) if et.defaultSize > 0 => a.numElements().toLong * et.defaultSize
        case _ => a.numElements().toLong
      }
    case _ => child.dataType.defaultSize.toLong
  })
  override protected def withNewChildInternal(c: Expression): ByteSizeExpr = copy(child = c)
  override def prettyName: String = "byteSize"
}

/** toTypeName(x) — the resolved Spark SQL type of the argument (CH's
  * debug aid, doc:897; reports Spark names, e.g. BIGINT not UInt64).
  */
case class ToTypeNameExpr(child: Expression)
  extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(child.dataType.sql)
  override protected def withNewChildInternal(c: Expression): ToTypeNameExpr = copy(child = c)
  override def prettyName: String = "toTypeName"
}

/** bitmapCardinality as a Catalyst expression (scalar over binary state). */
case class BitmapCardinalityExpr(child: Expression)
  extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(Bitmaps.fromBytes(v.asInstanceOf[Array[Byte]]).getLongCardinality)
  override protected def withNewChildInternal(c: Expression): BitmapCardinalityExpr = copy(child = c)
  override def prettyName: String = "bitmapCardinality"
}

/** bitmapAnd / bitmapOr / bitmapXor / bitmapAndnot (+ their cardinality
  * and predicate forms) as Catalyst expressions over serialized states.
  */
case class BitmapBinaryExpr(left: Expression, right: Expression, op: String)
  extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.roaringbitmap.RoaringBitmap
  override def dataType: DataType = op match {
    case "and" | "or" | "xor" | "andnot" => BinaryType
    case "has_all" | "has_any" => BooleanType
    case _ => LongType
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = Bitmaps.fromBytes(l.asInstanceOf[Array[Byte]])
    val b = Bitmaps.fromBytes(r.asInstanceOf[Array[Byte]])
    op match {
      case "and" => Bitmaps.toBytes(RoaringBitmap.and(a, b))
      case "or" => Bitmaps.toBytes(RoaringBitmap.or(a, b))
      case "xor" => Bitmaps.toBytes(RoaringBitmap.xor(a, b))
      case "andnot" => Bitmaps.toBytes(RoaringBitmap.andNot(a, b))
      case "and_card" => java.lang.Long.valueOf(
        RoaringBitmap.andCardinality(a, b).toLong)
      case "or_card" => java.lang.Long.valueOf(
        RoaringBitmap.orCardinality(a, b).toLong)
      case "xor_card" => java.lang.Long.valueOf(
        RoaringBitmap.orCardinality(a, b).toLong -
          RoaringBitmap.andCardinality(a, b).toLong)
      case "andnot_card" => java.lang.Long.valueOf(
        a.getLongCardinality - RoaringBitmap.andCardinality(a, b).toLong)
      // hasAll(a, b): does a contain EVERY element of b (empty b → true)
      case "has_all" => java.lang.Boolean.valueOf(
        RoaringBitmap.andCardinality(a, b).toLong == b.getLongCardinality)
      case "has_any" => java.lang.Boolean.valueOf(RoaringBitmap.intersects(a, b))
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapBinaryExpr =
    copy(left = l, right = r)
  override def prettyName: String = s"bitmap_$op"
}

/** bitmapContains(bitmap, x) — membership of one uint32. */
case class BitmapContainsExpr(left: Expression, right: Expression)
  extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val bm = Bitmaps.fromBytes(l.asInstanceOf[Array[Byte]])
    val x = r match {
      case i: java.lang.Integer => i.longValue()
      case j: java.lang.Long => j.longValue()
    }
    java.lang.Boolean.valueOf(x >= 0L && x <= 0xFFFFFFFFL &&
      bm.contains(Bitmaps.toUint32(x)))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapContainsExpr =
    copy(left = l, right = r)
  override def prettyName: String = "bitmapContains"
}

/** bitmapToArray / bitmapMin / bitmapMax / bitmapBuild and the subset
  * family — unary-ish scalar forms over serialized states. `op`:
  *  - to_array: ascending BIGINT array of the members
  *  - min / max: smallest/largest member, 0 when empty (CH's convention)
  */
case class BitmapUnaryExpr(child: Expression, op: String)
  extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = op match {
    case "to_array" => ArrayType(LongType, containsNull = false)
    case _ => LongType
  }
  override def nullSafeEval(v: Any): Any = {
    val bm = Bitmaps.fromBytes(v.asInstanceOf[Array[Byte]])
    op match {
      case "to_array" =>
        val out = new Array[Any](bm.getCardinality)
        val it = bm.iterator()
        var i = 0
        while (it.hasNext) { out(i) = it.next().toLong & 0xFFFFFFFFL; i += 1 }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      case "min" => java.lang.Long.valueOf(
        if (bm.isEmpty) 0L else bm.first().toLong & 0xFFFFFFFFL)
      case "max" => java.lang.Long.valueOf(
        if (bm.isEmpty) 0L else bm.last().toLong & 0xFFFFFFFFL)
    }
  }
  override protected def withNewChildInternal(c: Expression): BitmapUnaryExpr = copy(child = c)
  override def prettyName: String = s"bitmap_$op"
}

/** bitmapBuild(array) — serialize an integral array into a bitmap state
  * (the literal-set entry point of the doc's funnel recipes).
  */
case class BitmapBuildExpr(child: Expression)
  extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val bm = new org.roaringbitmap.RoaringBitmap()
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    var i = 0
    while (i < arr.numElements()) {
      val x = et match {
        case LongType => arr.getLong(i)
        case IntegerType => arr.getInt(i).toLong
        case ShortType => arr.getShort(i).toLong
        case _ => throw new IllegalArgumentException(
          s"bitmapBuild: integral array required, got ${child.dataType.simpleString}")
      }
      bm.add(Bitmaps.toUint32(x))
      i += 1
    }
    Bitmaps.toBytes(bm)
  }
  override protected def withNewChildInternal(c: Expression): BitmapBuildExpr = copy(child = c)
  override def prettyName: String = "bitmapBuild"
}

/** CH defaultValueOfArgumentType(expr): the default value of the
  * argument's TYPE (0 for numbers, '' for strings, epoch for
  * timestamps), never the argument's value. Foldable — ConstantFolding
  * collapses it to a literal before codegen, so the CodegenFallback
  * path never runs in a plan.
  */
case class DefaultValueOfArgumentType(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def eval(input: InternalRow): Any = Literal.default(child.dataType).value
  override protected def withNewChildInternal(c: Expression): DefaultValueOfArgumentType =
    copy(child = c)
  override def prettyName: String = "defaultValueOfArgumentType"
}

/** bitmapSubsetInRange(bm, start, end) — members in [start, end);
  * bitmapSubsetLimit(bm, start, n) — the n smallest members ≥ start;
  * subBitmap(bm, offset, n) — n members starting at rank `offset`
  * (0-based) in ascending order. All return serialized bitmaps.
  */
case class BitmapSubsetExpr(first: Expression, second: Expression,
    third: Expression, op: String)
  extends TernaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BinaryType
  private def asLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.longValue()
    case j: java.lang.Long => j.longValue()
  }
  override def nullSafeEval(b: Any, p1: Any, p2: Any): Any = {
    val bm = Bitmaps.fromBytes(b.asInstanceOf[Array[Byte]])
    val a = asLong(p1)
    val c = asLong(p2)
    val out = new org.roaringbitmap.RoaringBitmap()
    op match {
      case "range" =>
        val it = bm.iterator()
        while (it.hasNext) {
          val x = it.next().toLong & 0xFFFFFFFFL
          if (x >= a && x < c) out.add(x.toInt)
        }
      case "limit" =>
        val it = bm.iterator()
        var taken = 0L
        while (it.hasNext && taken < c) {
          val x = it.next().toLong & 0xFFFFFFFFL
          if (x >= a) { out.add(x.toInt); taken += 1 }
        }
      case "sub" =>
        val it = bm.iterator()
        var rank = 0L
        var taken = 0L
        while (it.hasNext && taken < c) {
          val x = it.next()
          if (rank >= a) { out.add(x); taken += 1 }
          rank += 1
        }
    }
    Bitmaps.toBytes(out)
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BitmapSubsetExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = s"bitmapSubset_$op"
}

/** CH `arrayAUC(scores, labels)`: exact ROC AUC from one row's parallel
  * arrays — rank-sum form with average ranks on score ties (the same
  * half-credit CH assigns). NULL when either class is absent. */
/** Truncates a (LEGACY, wrapping) SUM back to its input's own integral
  * type — CH's sumWithOverflow contract. The input type is read from the
  * RESOLVED aggregate child (a pre-analysis registration builder cannot
  * inspect it); Long/float/decimal inputs pass through unchanged, and
  * Long→Int/Short/Byte truncation is exact mod-2ᵏ arithmetic. */
case class SumInInputType(child: Expression)
  extends UnaryExpression with CodegenFallback {

  private def inputType: DataType = child match {
    case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression =>
      ae.aggregateFunction.children.head.dataType
    case other => other.dataType
  }
  override def dataType: DataType = inputType match {
    case t @ (IntegerType | ShortType | ByteType) => t
    case _ => child.dataType
  }
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(v: Any): Any = (v, dataType) match {
    case (l: Long, IntegerType) => l.toInt
    case (l: Long, ShortType) => l.toShort
    case (l: Long, ByteType) => l.toByte
    case (other, _) => other
  }
  override protected def withNewChildInternal(c: Expression): SumInInputType =
    copy(child = c)
  override def prettyName: String = "sumWithOverflow"
}

/** CH `arrayShiftLeft/Right(arr, n[, default])`: length-preserving shift,
  * vacated slots filled with `default` (2-arg form: the element type's
  * default — 0 / '' / false / [], per CH). Negative n shifts the other
  * way. `default` is an ordinary expression evaluated per row and coerced
  * to the element type.
  */
case class ArrayShiftExpr(
    arr: Expression,
    n: Expression,
    dflt: Option[Expression],
    shiftLeft: Boolean)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(arr, n) ++ dflt
  // a nullable explicit default means NULL can land in the vacated slots —
  // the array type must admit it, or the unsafe writer silently reads the
  // null back as the numeric zero
  override def dataType: DataType = arr.dataType match {
    case ArrayType(et, cn) => ArrayType(et, cn || dflt.exists(_.nullable))
    case other => other
  }
  override def nullable: Boolean = arr.nullable

  /** element types whose CH default value this expression knows how to
    * materialize for the 2-arg form; anything else needs an explicit
    * default (enforced at analysis, not as a runtime null leak) */
  private def hasTypeDefault(et: DataType): Boolean = et match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         FloatType | BooleanType | StringType | DateType | TimestampType |
         TimestampNTZType | _: DecimalType | ArrayType(_, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (arr.dataType, n.dataType) match {
      case (ArrayType(et, _), LongType | IntegerType | ShortType | ByteType) =>
        if (dflt.isEmpty && !hasTypeDefault(et))
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName: no built-in default for ${et.simpleString} elements — " +
              "pass an explicit default value (3-arg form)")
        else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName(arr, n[, default]): array + integral n, got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def eval(input: InternalRow): Any = {
    val a = arr.eval(input)
    val nv = n.eval(input)
    if (a == null || nv == null) return null
    val ad = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val et = arr.dataType.asInstanceOf[ArrayType].elementType
    val sz = ad.numElements()
    var shift = nv.asInstanceOf[Number].longValue()
    if (!shiftLeft) shift = -shift
    val fill = fillValue(input, et)
    val out = new Array[Any](sz)
    var i = 0
    while (i < sz) {
      val src = i + shift
      out(i) =
        if (src >= 0 && src < sz) {
          val s = src.toInt
          if (ad.isNullAt(s)) null else ad.get(s, et)
        } else fill
      i += 1
    }
    new GenericArrayData(out)
  }

  private def fillValue(input: InternalRow, et: DataType): Any = dflt match {
    case Some(e) => coerce(e.eval(input), et)
    case None => et match {
      case LongType => 0L
      case IntegerType => 0
      case ShortType => 0.toShort
      case ByteType => 0.toByte
      case DoubleType => 0d
      case FloatType => 0f
      case BooleanType => false
      case StringType => org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
      case DateType => 0 // CH default Date = epoch (1970-01-01)
      case TimestampType | TimestampNTZType => 0L
      case d: DecimalType => Decimal(java.math.BigDecimal.ZERO, d.precision, d.scale)
      case ArrayType(_, _) => new GenericArrayData(Array.empty[Any])
      // unreachable: checkInputDataTypes rejects the 2-arg form for
      // element types without a known default
      case other => throw new IllegalStateException(
        s"$prettyName: no default for ${other.simpleString}")
    }
  }

  private def coerce(v: Any, et: DataType): Any = (v, et) match {
    case (null, _) => null
    case (x: java.lang.Number, LongType) => x.longValue()
    case (x: java.lang.Number, IntegerType) => x.intValue()
    case (x: java.lang.Number, ShortType) => x.shortValue()
    case (x: java.lang.Number, ByteType) => x.byteValue()
    case (x: java.lang.Number, DoubleType) => x.doubleValue()
    case (x: java.lang.Number, FloatType) => x.floatValue()
    case (d: Decimal, DoubleType) => d.toDouble
    case (d: Decimal, LongType) => d.toLong
    case (d: Decimal, t: DecimalType) =>
      Decimal(d.toJavaBigDecimal, t.precision, t.scale)
    case (x: java.lang.Number, d: DecimalType) =>
      Decimal(new java.math.BigDecimal(x.toString), d.precision, d.scale)
    case _ => v
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): ArrayShiftExpr =
    copy(arr = cs(0), n = cs(1), dflt = dflt.map(_ => cs(2)))
  override def prettyName: String = if (shiftLeft) "arrayShiftLeft" else "arrayShiftRight"
}

case class ArrayAucExpr(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression] with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) return null
    val scoresArr = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val labelsArr = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = scoresArr.numElements()
    if (n == 0 || labelsArr.numElements() != n) return null
    def numAt(a: org.apache.spark.sql.catalyst.util.ArrayData,
        t: DataType, i: Int): Double = t match {
      case DoubleType => a.getDouble(i)
      case FloatType => a.getFloat(i).toDouble
      case LongType => a.getLong(i).toDouble
      case IntegerType => a.getInt(i).toDouble
      case ShortType => a.getShort(i).toDouble
      case BooleanType => if (a.getBoolean(i)) 1d else 0d
      case other => throw new IllegalArgumentException(
        s"arrayAUC: numeric/boolean arrays required, got ${other.simpleString}")
    }
    val st = left.dataType.asInstanceOf[ArrayType].elementType
    val lt = right.dataType.asInstanceOf[ArrayType].elementType
    val pairs = Array.tabulate(n) { i =>
      (numAt(scoresArr, st, i), numAt(labelsArr, lt, i) > 0)
    }.sortBy(_._1)
    var pos = 0L
    var rankSumPos = 0d
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && pairs(j + 1)._1 == pairs(i)._1) j += 1
      val avgRank = (i + j + 2) / 2.0 // 1-based average rank of the tie run
      var k = i
      while (k <= j) {
        if (pairs(k)._2) { pos += 1; rankSumPos += avgRank }
        k += 1
      }
      i = j + 1
    }
    val neg = n - pos
    if (pos == 0 || neg == 0) null
    else (rankSumPos - pos * (pos + 1) / 2.0) / (pos.toDouble * neg)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayAucExpr =
    copy(left = l, right = r)
  override def prettyName: String = "arrayAUC"
}

/** CH `mapAdd` / `mapSubtract` over Spark maps: per-key numeric
  * combination, sorted-key output (bit-deterministic). */
case class MapArithExpr(left: Expression, right: Expression, add: Boolean)
  extends Expression with BinaryLike[Expression] with CodegenFallback {

  private def mt: MapType = left.dataType.asInstanceOf[MapType]
  override def dataType: DataType = left.dataType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (MapType(k1, v1, _), MapType(k2, v2, _))
        if k1 == k2 && v1 == v2 && (v1 match {
          case LongType | IntegerType | ShortType | DoubleType | FloatType => true
          case _ => false
        }) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName: same-typed numeric maps required, got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) return null
    val kt = mt.keyType
    val vt = mt.valueType
    val acc = scala.collection.mutable.LinkedHashMap.empty[Any, Double]
    def ingest(m: Any, sign: Double): Unit = {
      val md = m.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val ks = md.keyArray(); val vs = md.valueArray()
      var i = 0
      while (i < md.numElements()) {
        val k = ks.get(i, kt) match {
          case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
          case other => other
        }
        val v = vs.get(i, vt) match {
          case d: java.lang.Double => d.doubleValue()
          case f: java.lang.Float => f.toDouble
          case l: java.lang.Long => l.toDouble
          case n: java.lang.Integer => n.toDouble
          case s: java.lang.Short => s.toDouble
        }
        acc.update(k, acc.getOrElse(k, 0d) + sign * v)
        i += 1
      }
    }
    ingest(l, 1d)
    ingest(r, if (add) 1d else -1d)
    val sorted = kt match {
      case StringType => acc.toSeq.sortBy(_._1.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
      case LongType => acc.toSeq.sortBy(_._1.asInstanceOf[Long])
      case IntegerType => acc.toSeq.sortBy(_._1.asInstanceOf[Int])
      case _ => acc.toSeq
    }
    def back(v: Double): Any = vt match {
      case DoubleType => v
      case FloatType => v.toFloat
      case LongType => v.toLong
      case IntegerType => v.toInt
      case ShortType => v.toShort
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sorted.map(_._1).toArray),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sorted.map(p => back(p._2)).toArray))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MapArithExpr =
    copy(left = l, right = r)
  override def prettyName: String = if (add) "mapAdd" else "mapSubtract"
}

/** CH `mapPopulateSeries(m[, max])`: integer-keyed map densified from
  * its min key (or 1) through max (default: the max key), gaps at 0. */
case class MapPopulateExpr(child: Expression, maxChild: Option[Expression])
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = child +: maxChild.toSeq
  private def mt: MapType = child.dataType.asInstanceOf[MapType]
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case MapType(LongType | IntegerType, _, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mapPopulateSeries: integer-keyed map required, got ${t.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val m = child.eval(input)
    if (m == null) return null
    val md = m.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
    val kt = mt.keyType
    val vt = mt.valueType
    val pairs = scala.collection.mutable.HashMap.empty[Long, Any]
    val ks = md.keyArray(); val vs = md.valueArray()
    var i = 0
    while (i < md.numElements()) {
      val k = ks.get(i, kt) match {
        case l: java.lang.Long => l.longValue()
        case n: java.lang.Integer => n.longValue()
      }
      pairs.update(k, vs.get(i, vt))
      i += 1
    }
    if (pairs.isEmpty) return m
    val lo = pairs.keys.min
    val hi = maxChild.map(_.eval(input)) match {
      case Some(l: java.lang.Long) => l.longValue()
      case Some(n: java.lang.Integer) => n.longValue()
      case _ => pairs.keys.max
    }
    val zero: Any = vt match {
      case DoubleType => 0d
      case FloatType => 0f
      case LongType => 0L
      case IntegerType => 0
      case ShortType => 0.toShort
      case _ => null
    }
    val keysOut = (lo to hi).toArray
    def keyBack(k: Long): Any = kt match {
      case LongType => k
      case IntegerType => k.toInt
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        keysOut.map(keyBack).toArray[Any]),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        keysOut.map(k => pairs.getOrElse(k, zero)).toArray[Any]))
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MapPopulateExpr =
    copy(child = cs(0), maxChild = if (cs.length >= 2) Some(cs(1)) else None)
  override def prettyName: String = "mapPopulateSeries"
}
