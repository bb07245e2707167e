package graft.text

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. Everything
  * here is composed from built-in Catalyst expressions (split / higher-order
  * functions / xxhash64) so it stays inside whole-stage codegen — no Scala
  * UDF in the per-row hot path, which is what makes a 100 TB document sweep
  * CPU-bound instead of serialization-bound.
  */
object TextFunctions {

  /** Registers [[TokenSetCount]] as `token_set_count(arr, array('a',...),
    * lowercase)` — the stopword-hit counter behind [[qualityFeatures]] and
    * [[langId]]. Query packs and ChCompat call this; ad-hoc users of those
    * two functions must too.
    */
  def register(spark: SparkSession): Unit = graft.functions.Registration.once(spark, "TextFunctions") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_set_count", es => {
        require(es.length == 3, "usage: token_set_count(arr, array('w',...), lowercase)")
        val words = es(1) match {
          case CreateArray(items, _) => items.map {
            case Literal(s: UTF8String, StringType) => s.toString
            case other => throw new IllegalArgumentException(
              s"token_set_count: word list must be string literals, got $other")
          }
          case other => throw new IllegalArgumentException(
            s"token_set_count: second arg must be an array literal, got $other")
        }
        val lc = es(2) match {
          case Literal(b: Boolean, BooleanType) => b
          case other => throw new IllegalArgumentException(
            s"token_set_count: lowercase flag must be a boolean literal, got $other")
        }
        TokenSetCount(es.head, words, lc)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_set_count", es => {
        require(es.length == 2, "usage: char_set_count(text, array('字',...))")
        val chars = es(1) match {
          case CreateArray(items, _) => items.map {
            case Literal(s: UTF8String, StringType) => s.toString
            case other => throw new IllegalArgumentException(
              s"char_set_count: char list must be string literals, got $other")
          }
          case other => throw new IllegalArgumentException(
            s"char_set_count: second arg must be an array literal, got $other")
        }
        CharSetCount(es.head, chars)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles_n", es => {
        val n = es(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"shingles_n: n must be an integer literal, got $other")
        }
        require(n >= 1, s"shingles_n: n must be positive, got $n")
        ShinglesExpr(es.head, n)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "compression_ratio", es => CompressionRatioExpr(es.head), "built-in")
  }

  /** Deflate-based compression ratio (compressed/raw bytes) — the classic
    * boilerplate/repetition quality signal (CCNet-family pipelines drop
    * pages that compress too well). Empty text → 1.0. */
  def compressionRatio(text: Column): Column =
    call_function("compression_ratio", text)

  private[text] def tokenSetCount(arr: Column, words: Seq[String], lowercase: Boolean): Column =
    call_function("token_set_count", arr, array(words.map(lit): _*), lit(lowercase))

  private[text] def charSetCount(text: Column, chars: Seq[String]): Column =
    call_function("char_set_count", text, array(chars.map(lit): _*))

  /** Whitespace tokens, empties dropped — byte-identical to
    * `filter(split(text, "\\s+"), t => t =!= "")` (the declared-oracle
    * semantics: maximal runs of non-`[ \t\n\x0B\f\r]` bytes), via the
    * one-pass primitive [[WsTokensExpr]]. The HOF form ran interpreted —
    * a regex split (String/array churn) plus a per-element lambda
    * dispatch per row — and was the dominant allocation source of every
    * text query's hot projection (q31/q32/q34/q37/q39); the primitive
    * does one byte scan and wraps token slices of a single buffer.
    */
  def tokens(text: Column): Column = wsTokens(text, lowercase = false)

  /** Lowercased whitespace tokens — byte-identical to
    * `transform(tokens(text), t => lower(t))` (per-token
    * UTF8String.toLowerCase, exactly what the interpreted transform+Lower
    * chain computed), in the same single pass. The langid pipelines'
    * `ltoks` column.
    */
  def lowerTokens(text: Column): Column = wsTokens(text, lowercase = true)

  private def wsTokens(text: Column, lowercase: Boolean): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      WsTokensExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), lowercase))

  /** BPE-ish subword-ish tokens: letter runs, digit runs, single punctuation
    * marks — the usual pre-tokenizer regex shape.
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Token count without materializing the array — one byte scan, zero
    * allocation (equals `size(tokens(text))` by construction). Cheap
    * enough to run BELOW a spread exchange as a pre-filter, so rows that
    * fail a length gate never shuffle (guide §2.3).
    */
  def tokenCount(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      WsTokenCountExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** n-token shingles joined by single spaces (for MinHash / Jaccard),
    * via the one-pass [[ShinglesExpr]] (the HOF transform-of-slice form
    * evaluated interpreted with a per-shingle array allocation). Returns
    * an empty array for documents shorter than n tokens (mirroring the
    * DuckDB oracles' empty generate_series). Requires
    * [[TextFunctions.register]] on the session.
    */
  def shingles(toks: Column, n: Int): Column =
    call_function("shingles_n", toks, lit(n))

  /** 64-bit doc fingerprint from a materialized token-array column: min over
    * shingle hashes (a 1-perm MinHash — stable under small edits, unlike a
    * whole-text hash).
    */
  def fingerprint64FromTokens(toks: Column, shingleSize: Int = 3): Column =
    array_min(transform(shingles(toks, shingleSize), sh => xxhash64(sh)))

  /** Convenience one-shot form — fine for ad-hoc use; pipelines should
    * materialize tokens first (see [[shingles]]).
    */
  def fingerprint64(text: Column, shingleSize: Int = 3): Column =
    fingerprint64FromTokens(tokens(text), shingleSize)

  /** Dedup-grade canonical text form: lowercase, punctuation/symbols to
    * spaces (Unicode letter/digit classes, so accents and non-Latin
    * scripts survive), whitespace collapsed, trimmed. Case and spacing
    * differences are not content differences in a training corpus — hash
    * THIS form for exact dedup, shingle it for near-dup. Pure Catalyst
    * (lower + regexp_replace), codegen'd, no UDF.
    */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{Nd}\\s]+", " "), "\\s+", " "))

  /** PII-style redaction for pre-training scrubbing: emails, URLs, then
    * long digit runs (7+, phone/account-shaped) replaced with typed
    * sentinels. Email before URL (addresses embed dots, not schemes),
    * URL before digits (URLs may embed long numbers). Pure Catalyst.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "https?://[^\\s]+", "<URL>"),
      "[0-9]{7,}", "<NUM>")

  // ---- quality scoring ----------------------------------------------------

  /** Java regex `\p{Punct}` (POSIX punct, ASCII-only without
    * UNICODE_CHARACTER_CLASS): `!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~` — spelled
    * out so [[qualityFeaturesFromTokens]]' CharSetCount counts exactly what
    * the regex class matched.
    */
  private val PunctChars: Seq[String] =
    """!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""".map(_.toString)

  private val defaultStopwords = Seq(
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that")

  /** Per-document quality features as a struct column. All counts are exact
    * integers; ratios are single double divisions (deterministic).
    */
  def qualityFeatures(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    qualityFeaturesFromTokens(tokens(text), text, stopwords)

  /** As [[qualityFeatures]], from a MATERIALIZED token-array column —
    * prefer this in pipelines that project several features: the lambda
    * subtrees are interpreted (no CSE), so an inline `tokens(text)` would
    * re-split once per projected expression (see [[shingles]]' note).
    *
    * Null-text note (r14 ADVICE): punct_cnt/digit_cnt come from
    * [[CharSetCount]], which returns NULL on null text, while the r13
    * `size(regexp_extract_all(...))` form returned -1 under legacy
    * sizeOfNull — a difference only visible on rows with NULL text, which
    * the declared corpus (and every gated query) does not contain; the
    * downstream quality gates drop null-text rows under either convention.
    */
  def qualityFeaturesFromTokens(
      toks: Column, text: Column,
      stopwords: Seq[String] = defaultStopwords): Column = {
    val nTok = size(toks)
    val nChar = length(text)
    // hash-set expression, not a filter lambda: higher-order functions
    // evaluate interpreted with a per-element linear array_contains scan;
    // TokenSetCount is one primitive loop + O(1) set probes per token
    val stopCnt = tokenSetCount(toks, stopwords, lowercase = true)
    // one-pass char-set counters, not size(regexp_extract_all(...)): the
    // regex form materializes an array of one-char strings per row just to
    // count it, in the hottest projection of the text family (q32/q39/
    // q62/q104). [\p{Punct}] is Java's FIXED ASCII punct class and [0-9]
    // ten digits — both exactly a CharSetCount over single BMP chars, so
    // counts (and the hash gate) are unchanged.
    val punctCnt = charSetCount(text, PunctChars)
    val digitCnt = charSetCount(text, "0123456789".map(_.toString))
    val uniqTok = size(array_distinct(toks))
    struct(
      nChar.as("n_chars"),
      nTok.as("n_tokens"),
      uniqTok.as("n_uniq_tokens"),
      stopCnt.as("stopword_cnt"),
      punctCnt.as("punct_cnt"),
      digitCnt.as("digit_cnt"),
      (stopCnt.cast(DoubleType) / nTok).as("stopword_ratio"),
      (uniqTok.cast(DoubleType) / nTok).as("uniq_ratio"),
      (nChar.cast(DoubleType) / nTok).as("avg_token_len"))
  }

  /** Composite quality score in [0,1] — the usual heuristic gate for
    * pretraining corpora: enough tokens, sane word length, some stopwords,
    * not too repetitive. Weights are arbitrary but fixed; deterministic.
    */
  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(tokens(text), text)

  /** As [[qualityScore]], from a materialized token-array column. */
  def qualityScoreFromTokens(toks: Column, text: Column): Column = {
    val f = qualityFeaturesFromTokens(toks, text)
    val lenOk = when(f("n_tokens").between(5, 10000), 1.0).otherwise(0.0)
    val stopOk = when(f("stopword_ratio") > 0.01, 1.0).otherwise(0.0)
    val repeatOk = when(f("uniq_ratio") > 0.2, 1.0).otherwise(0.0)
    val wordOk = when(f("avg_token_len").between(2.0, 12.0), 1.0).otherwise(0.0)
    (lenOk * 0.4 + stopOk * 0.2 + repeatOk * 0.2 + wordOk * 0.2)
  }

  // ---- language ID --------------------------------------------------------

  /** Tiny per-language stopword lists for the n-gram/stopword-vote heuristic.
    * Real pipelines use fastText-style models; the *Spark shape* (score per
    * language from token hits, argmax) is what matters here.
    */
  private val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "en", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "un", "une", "dans", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "这", "他"))

  /** Stopword-vote language ID: counts hits per language, returns the argmax
    * (ties broken by list order, 'und' = undetermined when no hits). CJK text
    * rarely whitespace-tokenizes, so zh also scores on character hits.
    */
  def langId(text: Column): Column =
    langIdFromTokens(lowerTokens(text), text)

  /** As [[langId]], from a *materialized* lowercased token-array column —
    * prefer this in pipelines: the four non-CJK language scores each run a
    * filter lambda over the token array, and higher-order functions are
    * interpreted, so an inline `transform(tokens(text), lower)` argument
    * would re-split and re-lower the text once per language list (the same
    * re-evaluation trap as minhashSignature's shingles).
    */
  def langIdFromTokens(ltoks: Column, text: Column): Column =
    langIdFromBest(langBestFromTokens(ltoks, text))

  /** The argmax struct `(hits, lang)` behind [[langIdFromTokens]] — the
    * expensive half (4 token-set passes + 1 char-set pass + the struct
    * greatest). Pipelines that can should MATERIALIZE this as its own
    * projected column and derive the verdict with [[langIdFromBest]]:
    * the verdict references the struct twice (condition + branch), and
    * conditional-branch subtrees are not common-subexpression-eliminated,
    * so an inline composition evaluates this whole tree up to twice per
    * row (CollapseProject keeps a multi-referenced non-cheap projection
    * un-inlined — the same trap and the same remedy as `toks`/`ltoks`).
    */
  def langBestFromTokens(ltoks: Column, text: Column): Column = {
    val scores = langStopwords.map { case (lang, words) =>
      val hits =
        if (lang == "zh")
          // ONE pass over the string counting CJK marker chars — the
          // replace-shrinkage chain this replaces re-scanned (and
          // re-allocated) the text once per marker char; occurrence
          // totals are identical because the markers are distinct
          // single BMP characters
          charSetCount(text, words)
        else tokenSetCount(ltoks, words, lowercase = false)
      struct(hits.as("hits"), lit(lang).as("lang"))
    }
    greatest(scores: _*) // struct compare: hits first, then lang
  }

  /** Verdict over a (preferably materialized) [[langBestFromTokens]]
    * column: the argmax language, 'und' when nothing hit.
    */
  def langIdFromBest(best: Column): Column =
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
}

/** Count of array elements present in a fixed word set — the hot inner
  * loop of stopword-based quality scoring and language ID, as a primitive
  * Catalyst expression: one `java.util.HashSet` probe per token instead of
  * an interpreted lambda + linear `array_contains` scan. Exactly mirrors
  * `size(filter(arr, t => array_contains(words, [lower](t))))` on non-null
  * input (null elements skipped, null array → null), so the DuckDB oracles
  * for q32/q37/q39 hold unchanged.
  */
case class TokenSetCount(child: Expression, words: Seq[String], lowercase: Boolean)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(if (lowercase) w.toLowerCase else w)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_set_count requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    var cnt = 0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (!a.isNullAt(i)) {
        val t = a.getUTF8String(i)
        if (set.contains(if (lowercase) t.toLowerCase else t)) cnt += 1
      }
      i += 1
    }
    cnt
  }

  override protected def withNewChildInternal(c: Expression): TokenSetCount =
    copy(child = c)
  override def prettyName: String = "token_set_count"
}

/** Total occurrences of a fixed set of single BMP characters in a string,
  * in ONE pass — the zh marker-char counter of [[TextFunctions.langId]].
  * Replaces the replace-shrinkage chain (`length(text) -
  * length(replace(text, c, ''))` summed per marker), which re-scanned and
  * re-allocated the whole text once per marker char; totals are identical
  * because the markers are distinct single characters, so q37's oracle
  * holds unchanged.
  */
case class CharSetCount(child: Expression, chars: Seq[String])
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  require(chars.nonEmpty && chars.forall(_.length == 1),
    s"char_set_count: need single BMP characters, got $chars")

  @transient private lazy val set: java.util.HashSet[Character] = {
    val s = new java.util.HashSet[Character](chars.length * 2)
    chars.foreach(c => s.add(c.charAt(0)))
    s
  }

  /** ASCII sets (the punct/digit counters — the hot quality projection)
    * count on the raw UTF-8 bytes: an ASCII char is a single byte, and
    * multi-byte sequences use only bytes ≥ 0x80, so a byte compare below
    * 128 is exact — no per-row String allocation. Non-ASCII sets (the zh
    * marker chars) keep the decoded-char path.
    */
  @transient private lazy val asciiSet: Array[Boolean] =
    if (chars.forall(_.charAt(0) < 128)) {
      val a = new Array[Boolean](128)
      chars.foreach(c => a(c.charAt(0)) = true)
      a
    } else null

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_set_count requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val u = v.asInstanceOf[UTF8String]
    var cnt = 0
    if (asciiSet != null) {
      val n = u.numBytes()
      var i = 0
      while (i < n) {
        val b = u.getByte(i)
        if (b >= 0 && asciiSet(b)) cnt += 1
        i += 1
      }
    } else {
      val s = u.toString
      var i = 0
      while (i < s.length) {
        if (set.contains(s.charAt(i))) cnt += 1
        i += 1
      }
    }
    cnt
  }

  override protected def withNewChildInternal(c: Expression): CharSetCount =
    copy(child = c)
  override def prettyName: String = "char_set_count"
}

/** All n-token shingles of a string array, space-joined, in one pass —
  * byte-identical to `transform(sequence(0, len-n), i => concat_ws(" ",
  * slice(toks, i+1, n)))` for len ≥ n (UTF8String.concatWs skips nulls
  * exactly like concat_ws), and an empty array for shorter inputs where
  * the HOF form's descending `sequence` was never well-defined.
  */
case class ShinglesExpr(child: Expression, n: Int)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles_n requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val len = a.numElements()
    if (len < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) {
        window(j) = if (a.isNullAt(i + j)) null else a.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(space, window: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): ShinglesExpr =
    copy(child = c)
  override def prettyName: String = "shingles_n"
}

/** One-pass whitespace tokenizer — the primitive form of
  * `filter(split(text, "\\s+"), t => t =!= "")` (and, with `lowercase`,
  * of `transform(filter(split(text, "\\s+"), t => t =!= ""), lower)`).
  *
  * Byte-identical by construction: Java's `\s` is exactly
  * `[ \t\n\x0B\f\r]` — six ASCII bytes, and UTF-8 continuation/lead bytes
  * are ≥ 0x80, so maximal runs of non-whitespace BYTES are maximal runs
  * of non-whitespace CHARACTERS; `split(_, -1)` can only produce empty
  * strings at the boundaries, which the `=!= ""` filter drops, so the
  * non-empty results are exactly those runs. The lowercase variant applies
  * UTF8String.toLowerCase PER TOKEN, exactly like the transform+Lower
  * chain (full-string lowercasing could differ on context-sensitive
  * mappings such as final sigma).
  *
  * Why it exists: the HOF chain evaluates interpreted — a regex split
  * (Pattern machinery, a String[] and per-element UTF8String round trips)
  * plus one lambda dispatch per element — and was the dominant
  * per-row allocation source of the text family (q31/q32/q34/q37/q39's
  * shared front). This is one scan over the string's bytes and one
  * UTF8String wrapper per token over a single shared buffer.
  *
  * Lowercasing delegates to the SAME entry point as the `Lower`
  * expression (CollationSupport.Lower.exec with the input type's
  * collation and the session ICU flag) — NOT UTF8String.toLowerCase,
  * whose per-codepoint mapping misses context-sensitive cases (Greek
  * final sigma: Σ word-finally must lower to ς, not σ; caught by
  * TextSpec's fuzz equivalence test).
  */
case class WsTokensExpr(child: Expression, lowercase: Boolean)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  @transient private lazy val collationId: Int = child.dataType match {
    case st: StringType => st.collationId
    case _ => 0
  }
  @transient private lazy val useICU: Boolean =
    org.apache.spark.sql.internal.SQLConf.get.getConf(
      org.apache.spark.sql.internal.SQLConf.ICU_CASE_MAPPINGS_ENABLED)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val s = v.asInstanceOf[UTF8String]
    val bytes = s.getBytes // zero-copy when the string owns its buffer
    val n = bytes.length
    // pass 1: count tokens (exact-size output array, no buffer growth)
    var cnt = 0
    var i = 0
    var inTok = false
    while (i < n) {
      val ws = isWs(bytes(i))
      if (!ws && !inTok) cnt += 1
      inTok = !ws
      i += 1
    }
    if (cnt == 0) return WsTokensExpr.emptyArray
    // pass 2: fill
    val out = new Array[Any](cnt)
    var k = 0
    i = 0
    while (i < n) {
      if (!isWs(bytes(i))) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        val t = UTF8String.fromBytes(bytes, start, i - start)
        out(k) =
          if (lowercase)
            org.apache.spark.sql.catalyst.util.CollationSupport.Lower
              .exec(t, collationId, useICU)
          else t
        k += 1
      } else i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WsTokensExpr =
    copy(child = c)
  override def prettyName: String = if (lowercase) "ws_tokens_lower" else "ws_tokens"
}

object WsTokensExpr {
  private val emptyArray =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
}

/** Whitespace-token count without materializing the array — one byte scan,
  * zero allocation; equals `size(`[[WsTokensExpr]]`)` on non-null input
  * (null → null). Cheap enough to gate rows below a spread exchange.
  */
case class WsTokenCountExpr(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ws_token_count requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var cnt = 0
    var i = 0
    var inTok = false
    while (i < bytes.length) {
      val ws = isWs(bytes(i))
      if (!ws && !inTok) cnt += 1
      inTok = !ws
      i += 1
    }
    cnt
  }

  override protected def withNewChildInternal(c: Expression): WsTokenCountExpr =
    copy(child = c)
  override def prettyName: String = "ws_token_count"
}

/** compressed-bytes / raw-bytes under java.util.zip Deflater level 6 —
  * deterministic for a given input (the JDK's zlib), per-row scalar.
  * Highly repetitive text compresses far below typical prose (~0.4),
  * which makes low ratios a strong boilerplate signal. */
case class CompressionRatioExpr(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val raw = v.asInstanceOf[UTF8String].getBytes
    if (raw.isEmpty) return 1.0
    // reuse one native Deflater per thread (reset between rows) — a
    // fresh init/end per row is measurable JNI churn on a corpus sweep
    val d = CompressionRatioExpr.deflaters.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](math.min(raw.length + 64, 1 << 16))
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / raw.length
  }

  override protected def withNewChildInternal(c: Expression): CompressionRatioExpr =
    copy(child = c)
  override def prettyName: String = "compression_ratio"
}

object CompressionRatioExpr {
  private[text] val deflaters: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Deflater(6))
}
