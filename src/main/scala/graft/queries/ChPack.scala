package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.Tables
import graft.functions.{ChCompat, Dictionaries}

/** Declared queries exercising the ClickHouse-dialect SQL surface itself —
  * the `-State`/`-Merge`/`-If` combinators and SQL `dictGet` running
  * through `spark.sql`, gated against DuckDB oracles. Exact variants only
  * (bitmap UV, count distinct): the approximate HLL forms are covered by
  * tolerance assertions in ChCompatSpec instead.
  */
object ChPack {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Two-phase MV dance written in the CH dialect verbatim
    // (ref dwm.mainpage_stat_mv_dis.sql:28-70, exact-bitmap variant :184-200):
    // inner -State at (day,hour,event_type), outer -Merge to (day,event_type).
    "q23_ch_dialect_mv" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).eventsWithDefaults.createOrReplaceTempView("graft_ch_events")
      s.sql(
        """SELECT day, event_type,
          |       groupBitmapMerge(bm) AS uv,
          |       CAST(sumMerge(val_dec) AS DOUBLE) AS total_value,
          |       sumMerge(cnt) AS cnt
          |FROM (
          |  SELECT day, hour, event_type,
          |         groupBitmapState(user_id) AS bm,
          |         sumState(CAST(value AS DECIMAL(18,2))) AS val_dec,
          |         countIf(true) AS cnt
          |  FROM graft_ch_events
          |  GROUP BY day, hour, event_type)
          |GROUP BY day, event_type
          |ORDER BY day, event_type""".stripMargin)
    },

    // db.table catalog layer (ref ods.action_001_dis.sql:2,31): the
    // reference's layered names queried directly; the oracle mirrors the
    // view's deterministic column derivations over raw events.
    "q25_catalog_query" -> { (s, dir) =>
      graft.engine.Catalog.register(s, dir)
      s.sql(
        """SELECT day, platform,
          |       uniqExact(uid) AS uv,
          |       sum(show_cnt) AS show_cnt,
          |       sum(click_cnt) AS click_cnt,
          |       sum(show_time) AS show_time_sum
          |FROM dws.action_001_dis
          |GROUP BY day, platform
          |ORDER BY day, platform""".stripMargin)
    },

    // The item-dim side of the catalog (ref dim.dict_item_dim.sql:24-27
    // usage comment: dictGet('dim.dict_item_dim','type_id',toUInt64(item_id)))
    // — per-item-type engagement with a price-weighted click revenue, both
    // attributes resolved through the broadcast dictionary in SQL.
    "q112_item_dict_sql" -> { (s, dir) =>
      graft.engine.Catalog.register(s, dir)
      s.sql(
        """SELECT dictGet('dim.dict_item_dim', 'type_id', toUInt64(item_id)) AS type_id,
          |       sum(show_cnt) AS shows,
          |       sum(click_cnt) AS clicks,
          |       sum(click_cnt * dictGet('dim.dict_item_dim', 'price', toUInt64(item_id))) AS click_rev
          |FROM dws.action_001_dis
          |GROUP BY type_id
          |ORDER BY type_id""".stripMargin)
    },

    // The CH date-arithmetic battery: dateDiff in all eight units
    // (boundary-crossing semantics — NOT complete intervals), the
    // add*/subtract* family, toUnixTimestamp, Sunday/Monday week starts,
    // toDayOfWeek/Year, toStartOfYear — plus avgIf/avgWeighted per day.
    "q118_ch_date_math" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_dm_events")
      s.sql(graft.engine.ChSql(
        """SELECT event_id,
          |  dateDiff('second', ts, toDateTime('2024-01-15 12:00:00')) AS d_sec,
          |  dateDiff('minute', ts, toDateTime('2024-01-15 12:00:00')) AS d_min,
          |  dateDiff('hour',   ts, toDateTime('2024-01-15 12:00:00')) AS d_hour,
          |  dateDiff('day',    ts, toDateTime('2024-01-15 12:00:00')) AS d_day,
          |  dateDiff('week',   ts, toDateTime('2024-01-15 12:00:00')) AS d_week,
          |  dateDiff('month',  ts, toDateTime('2024-02-20 00:00:00')) AS d_month,
          |  dateDiff('quarter', ts, toDateTime('2024-07-01 00:00:00')) AS d_quarter,
          |  dateDiff('year',   ts, toDateTime('2026-01-01 00:00:00')) AS d_year,
          |  toUnixTimestamp(ts) AS ux,
          |  toUnixTimestamp(addDays(ts, 3)) AS ux_add_d,
          |  toUnixTimestamp(subtractHours(ts, 7)) AS ux_sub_h,
          |  toUnixTimestamp(addMonths(ts, 1)) AS ux_add_mo,
          |  toUnixTimestamp(addSeconds(ts, 90)) AS ux_add_s,
          |  toStartOfWeek(ts) AS week_sun,
          |  toStartOfWeek(ts, 1) AS week_mon,
          |  toDayOfWeek(ts) AS dow,
          |  toDayOfYear(ts) AS doy,
          |  toStartOfYear(ts) AS y0
          |FROM graft_dm_events
          |WHERE event_id % 17 = 0
          |ORDER BY event_id""".stripMargin))
    },

    // avgIf / avgWeighted per day over events — the missing -If/-Weighted
    // average aggregates next to sumIf/countIf/minIf/maxIf.
    "q119_avg_family" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_avg_events")
      s.sql(
        """SELECT toDate(ts) AS day,
          |  round(avgIf(user_id, event_type = 'purchase'), 6) AS avg_uid_purchase,
          |  round(avgWeighted(user_id, user_id % 7 + 1), 6) AS avg_uid_weighted,
          |  count(*) AS cnt
          |FROM graft_avg_events
          |GROUP BY day
          |ORDER BY day""".stripMargin)
    },

    // CH hash family, DuckDB-mirrorable slice: halfMD5 is first-8-MD5-
    // bytes big-endian, so `lpad(hex(halfMD5(x)),16,'0')` must equal
    // DuckDB's `upper(substr(md5(x),1,16))` value-for-value — gating the
    // expression + codegen + the byte-level MD5/endianness convention.
    "q121_half_md5" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).documents.createOrReplaceTempView("graft_hm_docs")
      s.sql(
        """SELECT doc_id,
          |       lpad(hex(halfMD5(text)), 16, '0')   AS h_text,
          |       lpad(hex(halfMD5(source)), 16, '0') AS h_source,
          |       pmod(halfMD5(concat(source, '/', CAST(doc_id AS STRING))), 64) AS shard
          |FROM graft_hm_docs
          |WHERE doc_id % 3 = 0
          |ORDER BY doc_id""".stripMargin)
    },

    // The sharding/sampling primitives CH puts under SAMPLE BY /
    // Distributed keys: sipHash64 / xxHash64 / intHash64 bucket counts
    // over events uids, in CH spelling through the ChSql dialect layer
    // (which owns the xxHash64 → chXxHash64 rewrite — the bare name would
    // shadow Spark's seed-42 built-in). No DuckDB mirror exists for these
    // algorithms (rows-only in the gate); the bit-exactness evidence is
    // HashesSpec's published reference vectors, and this query pins the
    // end-to-end sharding shape (every bucket hit, totals preserved).
    "q122_hash_shard" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_hs_events")
      s.sql(graft.engine.ChSql(
        """SELECT pmod(sipHash64(user_id), 16)  AS sip_bucket,
          |       count(*)                       AS cnt,
          |       count(DISTINCT user_id)        AS uids,
          |       min(pmod(xxHash64(user_id), 16))  AS xx_min,
          |       max(pmod(intHash64(user_id), 16)) AS int_max
          |FROM graft_hs_events
          |GROUP BY sip_bucket
          |ORDER BY sip_bucket""".stripMargin))
    },

    // CH topK (SpaceSaving heavy hitters) in its exact regime: per-day
    // top-3 event types. Distinct event types ≪ the sketch's 64-counter
    // capacity, so no eviction happens anywhere — estimates are exact
    // counts with err 0, and the DuckDB count/row_number mirror hash-gates
    // the whole partial/merge/eval path of the aggregate.
    "q47_freq_topk" -> { (s, dir) =>
      import org.apache.spark.sql.types.IntegerType
      graft.functions.FreqTopK.register(s)
      Tables(s, dir).eventsWithDefaults
        .groupBy("day")
        .agg(graft.functions.FreqTopK.freq_topk(col("event_type"), 3).as("t"))
        .select(col("day"), org.apache.spark.sql.functions.posexplode(col("t")))
        .select(col("day"),
          (col("pos") + org.apache.spark.sql.functions.lit(1)).cast(IntegerType).as("rank"),
          col("col.value").as("etype"), col("col.est").as("cnt"), col("col.err").as("err"))
        .orderBy("day", "rank")
    },

    // CH retention(): per-(day, user) view→click / view→purchase cohort
    // flags, rolled up to per-day funnel counts — the relational twin of
    // the bitmap funnel (q21), via the composed boolean-Max aggregate.
    // (Array indexing is Spark's 0-based form.)
    "q48_retention" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).eventsWithDefaults.createOrReplaceTempView("graft_ret_events")
      s.sql(
        """SELECT day,
          |       SUM(r[0]) AS u_view,
          |       SUM(r[1]) AS u_view_click,
          |       SUM(r[2]) AS u_view_purchase,
          |       COUNT(*) AS users
          |FROM (
          |  SELECT day, user_id,
          |         retention(event_type = 'view', event_type = 'click',
          |                   event_type = 'purchase') AS r
          |  FROM graft_ret_events
          |  GROUP BY day, user_id)
          |GROUP BY day
          |ORDER BY day""".stripMargin)
    },

    // CH `LIMIT n BY group` (top-2 orders per customer by price): the
    // dialect clause Spark's parser lacks, via ChCompat.limitBy. BY key is
    // o_custkey (high-cardinality) — the scale-safe shape; deterministic
    // tie-break on o_orderkey.
    "q26_limit_by" -> { (s, dir) =>
      val o = Tables(s, dir).orders
      ChCompat.limitBy(
          o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
          n = 2,
          by = Seq(col("o_custkey")),
          order = Seq(col("o_totalprice").desc, col("o_orderkey")))
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    },

    // CH sequenceMatch / sequenceCount (the funnel-family member next to
    // windowFunnel and retention): per-(day, user) event-chain checks rolled
    // up per day — existence of view→click→purchase, a time-guarded
    // view→click within the hour, and the greedy non-overlapping
    // view→purchase chain count. Events carry no (user, ts) ties in the
    // testdata, so the oracle's ts-order mirrors the aggregate's
    // (ts, mask)-order exactly.
    "q66_sequence_match" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).eventsWithDefaults.createOrReplaceTempView("graft_seq_events")
      s.sql(
        """SELECT day,
          |       countIf(m_chain) AS u_chain,
          |       countIf(m_quick) AS u_quick,
          |       CAST(SUM(n_vp) AS BIGINT) AS vp_chains,
          |       COUNT(*) AS users
          |FROM (
          |  SELECT day, user_id,
          |         sequenceMatch('(?1).*(?2).*(?3)', ts,
          |           event_type = 'view', event_type = 'click',
          |           event_type = 'purchase') AS m_chain,
          |         sequenceMatch('(?1).*(?t<=3600)(?2)', ts,
          |           event_type = 'view', event_type = 'click') AS m_quick,
          |         sequenceCount('(?1).*(?2)', ts,
          |           event_type = 'view', event_type = 'purchase') AS n_vp
          |  FROM graft_seq_events
          |  GROUP BY day, user_id)
          |GROUP BY day
          |ORDER BY day""".stripMargin)
    },

    // CH uniqUpTo(N)(x): exact distinct count saturating at N+1, with a
    // HARD O(N) per-group state bound (the point vs count distinct's
    // expand plan: "does this group exceed N distinct" never buffers more
    // than N+1 values, and saturated partials merge as one byte).
    // Covers saturated (N=10 over users), unsaturated (N=5000), and
    // string-typed (N=3 over event types) paths in one query.
    "q68_uniq_up_to" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).eventsWithDefaults.createOrReplaceTempView("graft_upto_events")
      s.sql(
        """SELECT day,
          |       uniqUpTo(10, user_id) AS uv_up10,
          |       uniqUpTo(5000, user_id) AS uv_up5000,
          |       uniqUpTo(3, event_type) AS types_up3,
          |       uniqExact(user_id) AS uv_exact
          |FROM graft_upto_events
          |GROUP BY day
          |ORDER BY day""".stripMargin)
    },

    // CH topKWeighted in its exact regime (5 event types ≪ 64-counter
    // capacity — no eviction, est = exact weight sum, err = 0): per-day
    // top-3 event types by summed integer-scaled value.
    "q69_topk_weighted" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{IntegerType, LongType}
      graft.functions.FreqTopK.register(s)
      Tables(s, dir).eventsWithDefaults
        .withColumn("w", floor(col("value") * 1000).cast(LongType))
        .groupBy("day")
        .agg(graft.functions.FreqTopK.freq_topk_weighted(col("event_type"), col("w"), 3).as("t"))
        .select(col("day"), posexplode(col("t")))
        .select(col("day"), (col("pos") + lit(1)).cast(IntegerType).as("rank"),
          col("col.value").as("etype"), col("col.est").as("wsum"), col("col.err").as("err"))
        .orderBy("day", "rank")
    },

    // CH sumMap: per-day map of event_type → summed scaled value carried
    // as ONE state per group (distinct keys, not rows), exploded back to
    // rows for the gate. minMap/maxMap share the aggregate (spec-covered).
    "q70_sum_map" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.LongType
      graft.functions.MapAggregates.register(s)
      Tables(s, dir).eventsWithDefaults
        .withColumn("w", floor(col("value") * 1000).cast(LongType))
        .groupBy("day")
        .agg(graft.functions.MapAggregates.sum_map(
          array(col("event_type")), array(col("w"))).as("m"))
        .select(col("day"), col("m.values").as("vals"), posexplode(col("m.keys")))
        .select(col("day"), col("col").as("etype"),
          element_at(col("vals"), col("pos") + lit(1)).as("vsum"))
        .orderBy("day", "etype")
    },

    // CH scalar-dialect battery: the date-partitioning staples
    // (toYYYYMM/toStartOfMonth/toMonday), formatDateTime (MySQL-style
    // specifiers, %i = minute), splitByChar/arrayStringConcat,
    // empty/notEmpty, intDiv — all per-row expressions, gated row-exact.
    // CH ARRAY JOIN clause under the gate: per-token frequencies via the
    // row-expanding FROM modifier (bare form — the array column is
    // replaced by its elements).
    "q95_array_join_clause" -> { (s, dir) =>
      graft.text.TextFunctions.register(s)
      Tables(s, dir).documents.filter(col("doc_id") < 50)
        .select(col("doc_id"),
          graft.text.TextFunctions.tokens(col("text")).as("tok"))
        .createOrReplaceTempView("graft_ajc_docs")
      graft.engine.ChArrayJoin.sql(s,
        """SELECT tok, count(*) AS cnt
          |FROM graft_ajc_docs ARRAY JOIN tok
          |GROUP BY tok ORDER BY tok""".stripMargin)
    },

    // CH scalar WITH aliases under the gate: expression-first constants
    // inlined through filter and select — the oracle writes them inline.
    "q94_scalar_with" -> { (s, dir) =>
      Tables(s, dir).lineitem.createOrReplaceTempView("graft_sw_lineitem")
      s.sql(graft.engine.ChSql(
        """WITH 25 AS qty_cut, 0.05 AS disc_cut
          |SELECT l_returnflag, count(*) AS cnt,
          |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
          |FROM graft_sw_lineitem
          |WHERE l_quantity > qty_cut AND l_discount >= disc_cut
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
    },

    // CH merge() table function: three shard views unioned by name with
    // the _table virtual column attributing each row — counts and exact
    // id ranges per shard under the gate.
    "q92_merge_tables" -> { (s, dir) =>
      ChCompat.register(s)
      val e = Tables(s, dir).events
      e.filter(col("event_id") % 3 === 0).createOrReplaceTempView("graft_evt_shard_a")
      e.filter(col("event_id") % 3 === 1).createOrReplaceTempView("graft_evt_shard_b")
      e.filter(col("event_id") % 3 === 2).createOrReplaceTempView("graft_evt_shard_c")
      s.sql(
        """SELECT _table, count(*) AS cnt,
          |       min(event_id) AS min_id, max(event_id) AS max_id
          |FROM merge('default', '^graft_evt_shard')
          |GROUP BY _table ORDER BY _table""".stripMargin)
    },

    // CH SAMPLE clause: a fixed quarter of documents offset past the
    // midpoint of the hash space, keyed by doc_id. The md5-range predicate
    // is a pure key function, so the exact slice — membership, counts,
    // sums — sits under the hash gate.
    "q91_sample_clause" -> { (s, dir) =>
      Tables(s, dir).documents.createOrReplaceTempView("graft_sample_docs")
      val q =
        """SELECT lang, count(*) AS docs, sum(n_chars) AS chars
          |FROM graft_sample_docs SAMPLE 0.25 OFFSET 0.5
          |GROUP BY lang ORDER BY lang""".stripMargin
      s.sql(graft.engine.ChSample.rewrite(q, _ => Some("doc_id")))
    },

    // CH plural quantiles (one pass, array out, exploded per quantile)
    // plus the GLOBAL keyword shim: the dialect text uses GLOBAL ANY JOIN
    // — GLOBAL strips (Catalyst owns distribution), ANY resolves through
    // ChAnyJoin, quantilesExact aggregates the flat spelling.
    "q90_quantiles_multi" -> { (s, dir) =>
      ChCompat.register(s)
      val t = Tables(s, dir)
      t.lineitem.select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        .createOrReplaceTempView("graft_qm_lines")
      t.orders.select(col("o_orderkey"), col("o_orderpriority"))
        .createOrReplaceTempView("graft_qm_orders")
      val sql =
        """SELECT o.o_orderpriority AS pri,
          |       quantilesExact(l.l_quantity, 0.25, 0.5, 0.75, 0.9) AS qs,
          |       count(*) AS cnt
          |FROM graft_qm_lines l GLOBAL ANY INNER JOIN graft_qm_orders o
          |  ON l.l_orderkey = o.o_orderkey
          |GROUP BY o.o_orderpriority""".stripMargin
      val stripped = graft.engine.ChSql(sql)
      graft.engine.ChAnyJoin.sql(s, stripped)
        .select(org.apache.spark.sql.functions.posexplode(col("qs")),
          col("pri"), col("cnt"))
        .select(col("pri"), col("pos").as("qi"), col("col").as("q"), col("cnt"))
        .orderBy("pri", "qi")
    },

    "q71_ch_scalars" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_scalar_events")
      s.sql(
        """SELECT event_id,
          |       toYYYYMM(ts) AS yyyymm,
          |       toYYYYMMDD(ts) AS yyyymmdd,
          |       toStartOfMonth(ts) AS month_start,
          |       toMonday(ts) AS week_monday,
          |       toYear(ts) AS y, toHour(ts) AS h,
          |       formatDateTime(ts, '%Y-%m-%d %H:%i:%S') AS formatted,
          |       arrayStringConcat(splitByChar(':', props), '|') AS props_split,
          |       notEmpty(event_type) AS has_type,
          |       intDiv(event_id, 7) AS id_div7
          |FROM graft_scalar_events
          |ORDER BY event_id""".stripMargin)
    },

    // CH array-function battery over tokenized documents: lambda-first
    // arrayMap/arrayFilter/arrayCount, has/indexOf (CH's 0-when-absent),
    // arrayDistinct/arraySort/arraySlice composition — all HOF/array
    // expressions, gated row-exact.
    "q72_ch_arrays" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).documents
        .select(col("doc_id"), graft.text.TextFunctions.tokens(col("text")).as("toks"))
        .createOrReplaceTempView("graft_arr_docs")
      s.sql(
        """SELECT doc_id,
          |       arrayCount(t -> length(t) > 4, toks) AS long_toks,
          |       arrayUniq(toks) AS uniq_toks,
          |       has(toks, 'the') AS has_the,
          |       indexOf(toks, 'the') AS the_pos,
          |       arrayStringConcat(arraySlice(arraySort(arrayDistinct(toks)), 1, 3), ',') AS first3,
          |       arrayExists(t -> t = 'data', toks) AS mentions_data
          |FROM graft_arr_docs
          |ORDER BY doc_id""".stripMargin)
    },

    // The doc's hand-built-rows state-merge lesson run FILE-VERBATIM
    // (doc:412-495): `FROM system.one ARRAY JOIN [(tuple), ...] AS a`
    // with positional tuple access a.1/a.2/a.3, four UNION ALL "batches"
    // of uniqCombinedState, merged with uniqCombinedMerge — the golden
    // uv=7 case. Exercises the whole shim chain: bracket array literals →
    // array(), tuple literals → tuple(), a.N → a.colN, the
    // expression-operand ARRAY JOIN rewrite, and system.one. The SQL is
    // extracted from the reference doc at runtime (run-the-original
    // posture, like q74's script replay); only the deterministic ORDER BY
    // is appended.
    "q105_doc_handrows" -> { (s, dir) =>
      // locate by listing (the filename is non-ASCII; a literal would tie
      // correctness to the JVM's filename encoding)
      val docsDir = java.nio.file.Paths.get(graft.engine.ChReplay.scriptsDir,
        "..", "..", "docs").normalize()
      val stream = java.nio.file.Files.list(docsDir)
      val docPath = try {
        val it = stream.iterator()
        var found: java.nio.file.Path = null
        while (it.hasNext && found == null) {
          val p = it.next()
          if (p.getFileName.toString.endsWith(".md")) found = p
        }
        require(found != null, s"no .md doc under $docsDir")
        found
      } finally stream.close()
      val txt = new String(java.nio.file.Files.readAllBytes(docPath), "UTF-8")
      val anchor = txt.indexOf("uniqCombinedMerge(xx) AS uv")
      require(anchor >= 0, s"doc anchor not found in $docPath")
      val sql = txt.substring(txt.lastIndexOf("SELECT", anchor),
        txt.indexOf("Query id:", anchor)).trim
      val replay = new graft.engine.ChReplay(s,
        graft.engine.ChReplay.scratchWarehouse("graft-q105"))
      replay.runQuery(sql + "\nORDER BY platform, ver")
    },

    // CH array series math (arrayEnumerate / arrayCumSum / arrayDifference
    // / arrayCompact / arraySum / arrayMin / arrayMax / arrayPop*) over
    // per-doc token-length arrays — the per-row fold/index-lambda family
    // a series analyst leans on; all expression-composed, bigint lanes.
    "q103_ch_array_math" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).documents
        .select(col("doc_id"), graft.text.TextFunctions.tokens(col("text")).as("toks"))
        .createOrReplaceTempView("graft_arrm_docs")
      s.sql(
        """SELECT doc_id,
          |       concat_ws(',', arraySlice(arrayEnumerate(toks), 1, 3)) AS enum3,
          |       concat_ws(',', arrayCumSum(lens)) AS cum_lens,
          |       concat_ws(',', arrayDifference(lens)) AS diffs,
          |       concat_ws(',', arrayCompact(lens)) AS rle_heads,
          |       arraySum(lens) AS sum_len,
          |       arrayMin(lens) AS min_len,
          |       arrayMax(lens) AS max_len,
          |       size(arrayPopFront(lens)) AS popf_n,
          |       size(arrayPopBack(lens)) AS popb_n
          |FROM (
          |  SELECT doc_id, toks, arrayMap(t -> toUInt64(length(t)), toks) AS lens
          |  FROM graft_arrm_docs)
          |ORDER BY doc_id""".stripMargin)
    },

    // CH arrayReduce('agg', arr): the aggregate-by-name face of the
    // per-row array family — plan-time dispatch onto the arrayX
    // lowerings (q103's machinery), here over the same token-length
    // lanes so every supported name is value-gated at once.
    "q107_array_reduce" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).documents
        .select(col("doc_id"), graft.text.TextFunctions.tokens(col("text")).as("toks"))
        .createOrReplaceTempView("graft_arrr_docs")
      s.sql(
        """SELECT doc_id,
          |       arrayReduce('sum', lens) AS r_sum,
          |       arrayReduce('min', lens) AS r_min,
          |       arrayReduce('max', lens) AS r_max,
          |       arrayReduce('avg', lens) AS r_avg,
          |       arrayReduce('count', lens) AS r_cnt,
          |       arrayReduce('uniqExact', lens) AS r_uniq,
          |       arrayReduce('any', lens) AS r_any,
          |       arrayReduce('anyLast', lens) AS r_last
          |FROM (
          |  SELECT doc_id, arrayMap(t -> toUInt64(length(t)), toks) AS lens
          |  FROM graft_arrr_docs)
          |ORDER BY doc_id""".stripMargin)
    },

    // windowFunnel under the hash gate: the two-level case (view →
    // purchase within the hour) is exactly SQL-expressible — a chain
    // exists iff some purchase has a strictly-earlier view within the
    // window, i.e. the latest preceding view's gap clears it (minimal gap
    // ⇒ existence-equivalent; no (user, ts) ties in the testdata). Deeper
    // funnels are brute-force-verified in WindowFunnelSpec.
    "q73_window_funnel" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).eventsWithDefaults.createOrReplaceTempView("graft_wf_events")
      s.sql(
        """SELECT day,
          |       countIf(lvl >= 1) AS u_view,
          |       countIf(lvl = 2) AS u_funnel,
          |       COUNT(*) AS users
          |FROM (
          |  SELECT day, user_id,
          |         windowFunnel(ts, 3600, event_type = 'view',
          |                      event_type = 'purchase') AS lvl
          |  FROM graft_wf_events
          |  GROUP BY day, user_id)
          |GROUP BY day
          |ORDER BY day""".stripMargin)
    },

    // SQL dictGet enrichment (ref dim.dict_user_dim.sql:24-27): broadcast
    // point-lookup, no shuffle of the fact side beyond the aggregation.
    "q24_dictget_sql" -> { (s, dir) =>
      ChCompat.register(s)
      val t = Tables(s, dir)
      Dictionaries.register(s, "dim.dict_nation",
        t.nation.select(col("n_nationkey"), col("n_name")), keyCol = "n_nationkey")
      t.customer.createOrReplaceTempView("graft_ch_customer")
      s.sql(
        """SELECT dictGet('dim.dict_nation', 'n_name', toUInt64(c_nationkey)) AS nation,
          |       uniqExact(c_custkey) AS uv,
          |       CAST(sumIf(CAST(c_acctbal AS DECIMAL(18,2)), c_acctbal > 0) AS DOUBLE) AS pos_bal,
          |       countIf(c_acctbal > 0) AS pos_cnt
          |FROM graft_ch_customer
          |GROUP BY nation
          |ORDER BY nation""".stripMargin)
    },

    // CH PREWHERE + GROUP BY ... WITH TOTALS + trailing FORMAT, all via
    // the string-level ChSql shims: PREWHERE reads as a pushed filter,
    // TOTALS becomes GROUPING SETS ((keys), ()) — the grand-total row's
    // keys are NULL (the Spark/DuckDB convention; CH renders defaults).
    "q85_with_totals" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_totals_events")
      s.sql(graft.engine.ChSql(
        """SELECT event_type, count(*) AS n, uniqExact(user_id) AS uv
          |FROM graft_totals_events PREWHERE user_id % 7 = 0
          |GROUP BY event_type WITH TOTALS
          |ORDER BY event_type
          |FORMAT TabSeparated""".stripMargin))
    },

    // CH GROUP BY ... WITH ROLLUP (ChSql.withRollupCube): hierarchical
    // subtotals — (flag, status), (flag), () — in ONE pass; Spark lowers
    // ROLLUP to a single Expand + hash aggregate, no per-level re-scan,
    // so at 100 TB this costs one scan + one shuffle like the plain
    // GROUP BY. Super-aggregate keys are NULL (Spark/DuckDB convention;
    // CH renders type defaults — same documented divergence as TOTALS).
    "q106_with_rollup" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).lineitem.createOrReplaceTempView("graft_ru_lineitem")
      s.sql(graft.engine.ChSql(
        """SELECT l_returnflag, l_linestatus,
          |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          |       count(*) AS n
          |FROM graft_ru_lineitem
          |GROUP BY l_returnflag, l_linestatus WITH ROLLUP
          |ORDER BY l_returnflag, l_linestatus""".stripMargin))
    },

    // CH URL function battery over deterministically synthesized URLs
    // (the testdata carries no URL column; both sides build the same
    // string from customer keys, then THIS side parses it back with the
    // ParseUrl-composed CH functions while the oracle re-derives each
    // part from the raw pieces — an independent construction/parse
    // cross-check). Expression-only, codegen'd, no UDF.
    "q97_url_funcs" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).customer.createOrReplaceTempView("graft_url_customer")
      s.sql(
        """SELECT url,
          |       protocol(url) AS proto,
          |       domain(url) AS host,
          |       domainWithoutWWW(url) AS host_nw,
          |       topLevelDomain(url) AS tld,
          |       path(url) AS pth,
          |       pathFull(url) AS pth_full,
          |       queryString(url) AS qs,
          |       fragment(url) AS frag,
          |       extractURLParameter(url, 'id') AS p_id,
          |       extractURLParameter(url, 'n') AS p_n,
          |       cutQueryStringAndFragment(url) AS base,
          |       cutWWW(url) AS no_www
          |FROM (
          |  SELECT concat('https://www.seg-', lower(c_mktsegment), '.example.com',
          |                '/cust/', CAST(c_custkey AS STRING),
          |                '?id=', CAST(c_custkey % 97 AS STRING),
          |                '&n=', CAST(c_nationkey AS STRING),
          |                '#s', CAST(c_custkey % 5 AS STRING)) AS url
          |  FROM graft_url_customer)
          |ORDER BY url""".stripMargin)
    },

    // CH string-search battery (position / hasToken / multiSearchAny /
    // countSubstrings / match) over the documents corpus; booleans cast
    // to BIGINT so both engines hash the same ints.
    "q98_string_search" -> { (s, dir) =>
      ChCompat.register(s)
      s.read.parquet(dir + "/documents.parquet").createOrReplaceTempView("graft_ss_docs")
      s.sql(
        """SELECT doc_id,
          |       CAST(position(text, 'merge') AS BIGINT) AS pos_merge,
          |       CAST(positionCaseInsensitive(text, 'MERGE') AS BIGINT) AS pos_ci,
          |       CAST(hasToken(text, 'merge') AS BIGINT) AS has_merge,
          |       CAST(multiSearchAny(text, array('spark', 'flink')) AS BIGINT) AS any_hit,
          |       countSubstrings(text, 'table') AS n_table,
          |       CAST(match(text, 'h..h') AS BIGINT) AS re_hit
          |FROM graft_ss_docs
          |ORDER BY doc_id""".stripMargin)
    },

    // CH LIMIT n BY (engine.ChLimitBy): per-group heads in ORDER BY
    // order — top-2 orders per customer bucket by price, the SQL face of
    // q26's Scala-API limitBy. One window over the BY key, no driver
    // funnel; total ORDER BY (unique o_orderkey) keeps it deterministic.
    "q96_limit_by_sql" -> { (s, dir) =>
      Tables(s, dir).orders.createOrReplaceTempView("graft_lb_orders")
      graft.engine.ChLimitBy.sql(s,
        """SELECT o_custkey % 10 AS bucket, o_orderkey, o_totalprice
          |FROM graft_lb_orders
          |ORDER BY bucket, o_totalprice DESC, o_orderkey
          |LIMIT 2 BY bucket""".stripMargin)
    },

    // CH ORDER BY ... WITH FILL (operators.WithFill): a sparse hourly
    // report densified onto the 0..24 grid — missing hours surface with
    // null counts, original rows untouched; the CH report-densification
    // modifier a time-series user expects.
    "q84_with_fill" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_fill_events")
      graft.operators.WithFill.sql(s,
        """SELECT toHour(ts) AS h, count(*) AS purchases
          |FROM graft_fill_events
          |WHERE event_type = 'purchase' AND user_id % 50 = 0
          |GROUP BY h
          |ORDER BY h WITH FILL FROM 0 TO 24""".stripMargin)
    },

    // WITH FILL + INTERPOLATE (both supported forms: carry-forward and
    // linear per-step accumulation) — CH evaluates the expression against
    // the PREVIOUS row, so `max_uid + 10` climbs by 10 per filled hour.
    "q116_fill_interpolate" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_fill2_events")
      graft.operators.WithFill.sql(s,
        """SELECT toHour(ts) AS h, count(*) AS purchases, max(user_id) AS max_uid
          |FROM graft_fill2_events
          |WHERE event_type = 'purchase' AND user_id % 97 = 0
          |GROUP BY h
          |ORDER BY h WITH FILL FROM 0 TO 24
          |  INTERPOLATE (purchases AS purchases, max_uid AS max_uid + 10)""".stripMargin)
    },

    // The -ForEach combinator family (sum/min/max/avgForEach): element-
    // wise aggregation of per-row arrays — metric lanes per event type.
    // Integer lanes keep BIGINT-exact sums under any merge order; avg is
    // exact-sum / presence-count, one double division per lane.
    "q136_foreach" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_fe_events")
      s.sql(
        """SELECT event_type,
          |       concat_ws(',', sumForEach(lanes)) AS lane_sums,
          |       concat_ws(',', minForEach(lanes)) AS lane_mins,
          |       concat_ws(',', maxForEach(lanes)) AS lane_maxs,
          |       element_at(avgForEach(lanes), 1) AS avg_hi,
          |       element_at(avgForEach(lanes), 2) AS avg_mod10,
          |       element_at(avgForEach(lanes), 3) AS avg_mod7
          |FROM (
          |  SELECT event_type,
          |         array(CASE WHEN value > 2.5 THEN 1L ELSE 0L END,
          |               user_id % 10, event_id % 7) AS lanes
          |  FROM graft_fe_events)
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    },

    // CH one-pass helper aggregates: sumCount's (sum, count) tuple,
    // boundingRatio's endpoint slope, simpleLinearRegression's (k, b) —
    // all composite built-in aggregates (codegen'd, map-side combined),
    // no custom state.
    "q137_stat_pack" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).lineitem.createOrReplaceTempView("graft_stat_li")
      s.sql(
        """SELECT l_returnflag,
          |       sumCount(CAST(l_quantity AS BIGINT)).sum AS qty_sum,
          |       sumCount(CAST(l_quantity AS BIGINT)).count AS qty_cnt,
          |       round(boundingRatio(l_orderkey * 10 + l_linenumber,
          |                           l_extendedprice), 6) AS bratio,
          |       round(simpleLinearRegression(l_quantity, l_extendedprice).k, 6) AS slr_k,
          |       round(simpleLinearRegression(l_quantity, l_extendedprice).b, 6) AS slr_b
          |FROM graft_stat_li
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    },

    // The CH categorical-statistics family: Shannon entropy and the
    // association measures (cramersV / bias-corrected, theilsU,
    // contingency) over event_type × a bounded user cohort — one
    // pair-count map per aggregate, map-side combined, sorted-order
    // float reduction (bit-deterministic under any partitioning).
    "q138_entropy_assoc" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_ent_events")
      s.sql(
        """SELECT round(entropy(event_type), 6) AS h_type,
          |       round(entropy(user_id % 10), 6) AS h_mod,
          |       round(cramersV(event_type, user_id % 3), 6) AS cv,
          |       round(cramersVBiasCorrected(event_type, user_id % 3), 6) AS cvbc,
          |       round(theilsU(event_type, user_id % 3), 6) AS tu,
          |       round(contingency(event_type, user_id % 3), 6) AS cg
          |FROM graft_ent_events""".stripMargin)
    },

    // CH intervalLengthSum: union length of [start, end] segments per
    // group (overlaps once, adjacent merge) — compacted-island state,
    // O(islands) through the exchange; integral in, BIGINT-exact out.
    "q139_interval_sum" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_iv_events")
      s.sql(
        """SELECT event_type,
          |       intervalLengthSum(user_id * 37 % 10000,
          |                         user_id * 37 % 10000 + event_id % 7) AS covered
          |FROM graft_iv_events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    },

    // CH deltaSumTimestamp: positive consecutive deltas in (ts, value)
    // order — the deterministic deltaSum (plain deltaSum keeps CH's own
    // merge-order caveat and stays spec-tested).
    "q140_delta_sum" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_ds_events")
      s.sql(
        """SELECT event_type,
          |       round(deltaSumTimestamp(value, ts), 6) AS dsum
          |FROM graft_ds_events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    },

    // CH quantileExactWeighted / medianExactWeighted: exact weighted
    // quantiles over a value → Σweight map (CH's ascending-scan rule:
    // first value with accumulated ≥ level·total) — integer in/out,
    // hash-exact.
    "q141_weighted_quantile" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).lineitem.createOrReplaceTempView("graft_wq_li")
      s.sql(
        """SELECT l_returnflag,
          |       quantileExactWeighted(CAST(l_quantity AS BIGINT), l_linenumber, 0.5D) AS wmed,
          |       medianExactWeighted(CAST(l_quantity AS BIGINT), l_linenumber) AS wmed2,
          |       quantileExactWeighted(CAST(l_quantity AS BIGINT), l_linenumber, 0.9D) AS wq90
          |FROM graft_wq_li
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    },

    // CH rankCorr: exact Spearman correlation (average ranks on ties,
    // Pearson over rank pairs in sorted order) — group-sized state like
    // medianExact; the rank transform is inherently per-group-global.
    "q142_rank_corr" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).lineitem.createOrReplaceTempView("graft_rc_li")
      s.sql(
        """SELECT l_returnflag,
          |       round(rankCorr(l_quantity, l_extendedprice), 6) AS rc,
          |       round(rankCorr(l_quantity, l_discount), 6) AS rc_disc
          |FROM graft_rc_li
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    },

    // The CH string-distance family (record-linkage / fuzzy-dedup
    // primitives): editDistance, true Damerau-Levenshtein, Jaro /
    // Jaro-Winkler, byte Hamming, character-set Jaccard — every value
    // mirrored by the DuckDB built-in of the same definition.
    // (ngramDistance / ngramSearch have no DuckDB twin — spec-pinned.)
    "q143_string_distance" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).part.createOrReplaceTempView("graft_sd_part")
      s.sql(
        """SELECT p_partkey,
          |       editDistance(p_name, p_type) AS ed,
          |       damerauLevenshteinDistance(substring(p_name, 1, 12),
          |                                  substring(p_type, 1, 12)) AS dl,
          |       round(jaroSimilarity(p_name, p_type), 6) AS js,
          |       round(jaroWinklerSimilarity(p_name, p_type), 6) AS jw,
          |       byteHammingDistance(rpad(p_name, 10, '.'),
          |                           rpad(p_type, 10, '.')) AS bh,
          |       round(stringJaccardIndex(p_name, p_type), 6) AS sj
          |FROM graft_sd_part
          |WHERE p_partkey <= 500
          |ORDER BY p_partkey""".stripMargin)
    },

    // The CH array-completion battery: arrayProduct / rotate / shingles
    // over per-row lineitem triples (DuckDB list-algebra mirrors),
    // scan-shaped ops (cumSumNonNegative, fill/reverseFill,
    // split/reverseSplit) pinned on literals, and exact ROC arrayAUC per
    // event_type against a rank-window mirror.
    "q144_array_battery" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).lineitem.createOrReplaceTempView("graft_ab_li")
      Tables(s, dir).events.createOrReplaceTempView("graft_ab_events")
      s.sql(
        """WITH li AS (
          |  SELECT l_orderkey, l_linenumber,
          |         array(CAST(l_linenumber AS BIGINT),
          |               CAST(l_quantity AS BIGINT),
          |               l_partkey % 7 + 1) AS arr
          |  FROM graft_ab_li WHERE l_orderkey <= 200),
          |auc AS (
          |  SELECT event_type,
          |         round(arrayAUC(collect_list(value),
          |                        collect_list(CAST(user_id % 2 AS INT))), 6) AS auc
          |  FROM graft_ab_events GROUP BY event_type)
          |SELECT l_orderkey, l_linenumber,
          |       arrayProduct(arr) AS prod,
          |       concat_ws(',', arrayRotateLeft(arr, 1)) AS rotl,
          |       concat_ws(',', arrayRotateRight(arr, 1)) AS rotr,
          |       concat_ws(';', transform(arrayShingles(arr, 2),
          |                                a -> concat_ws(',', a))) AS sh,
          |       concat_ws(',', arrayCumSumNonNegative(array(1, 1, -4, 1))) AS ccs,
          |       concat_ws(',', arrayFill(x -> x != 0, array(1, 0, 2, 0, 0, 3))) AS fil,
          |       concat_ws(',', arrayReverseFill(x -> x != 0, array(1, 0, 2, 0, 0, 3))) AS rfil,
          |       concat_ws(';', transform(arraySplit(x -> x = 1, array(0, 0, 1, 0, 1)),
          |                                a -> concat_ws(',', a))) AS spl,
          |       concat_ws(';', transform(arrayReverseSplit(x -> x = 1, array(0, 0, 1, 0, 1)),
          |                                a -> concat_ws(',', a))) AS rspl,
          |       a.auc
          |FROM li CROSS JOIN (SELECT min(auc) AS auc FROM auc) a
          |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    },

    // The CH date-helper battery: timeSlot(s), epoch-relative unit
    // numbers, Modified Julian Day round-trip, month/day names, age()
    // complete-unit arithmetic, plus transform() value remapping and the
    // multiSearch needle-array family — all composites over codegen'd
    // built-ins.
    "q145_date_helpers" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_dh_events")
      s.sql(
        """SELECT event_id,
          |       timeSlot(ts) AS slot,
          |       size(timeSlots(ts, 3600)) AS nslots,
          |       toRelativeHourNum(ts) AS rel_hour,
          |       toRelativeDayNum(ts) AS rel_day,
          |       toRelativeMonthNum(ts) AS rel_month,
          |       toModifiedJulianDay(toDate(ts)) AS mjd,
          |       fromModifiedJulianDay(toModifiedJulianDay(toDate(ts))) AS mjd_rt,
          |       monthName(ts) AS mname,
          |       dateName('weekday', ts) AS wname,
          |       age('hour', timestamp'2024-01-01 00:00:00', ts) AS age_h,
          |       age('day', timestamp'2024-01-01 00:00:00', ts) AS age_d,
          |       transform(event_type, array('view', 'purchase'),
          |                 array('V', 'P'), '?') AS tcode,
          |       concat_ws(',', multiSearchAllPositions(event_type,
          |                                              array('ie', 'ur', 'xx'))) AS mpos,
          |       multiSearchAny(event_type, array('chase', 'zz')) AS many
          |FROM graft_dh_events
          |WHERE event_id <= 500
          |ORDER BY event_id""".stripMargin)
    },

    // The CH geo + display-format battery: haversine great-circle
    // distances over synthetic coordinates (formula-mirrored in DuckDB),
    // geohash round-trips, ray-cast pointInPolygon, and the readable
    // formatters / unicode bar — deterministic pins where no SQL mirror
    // exists.
    "q146_geo_format" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_geo_events")
      s.sql(
        """WITH pts AS (
          |  SELECT event_id,
          |         CAST(user_id % 360 AS DOUBLE) - 180 + 0.5 AS lon,
          |         CAST(user_id % 170 AS DOUBLE) - 85 + 0.25 AS lat
          |  FROM graft_geo_events WHERE event_id <= 500)
          |SELECT event_id,
          |       round(greatCircleDistance(lon, lat, -73.9857D, 40.7484D), 2) AS gcd,
          |       round(geohashDecode(geohashEncode(lon, lat, 9)).longitude, 2) AS gh_lon,
          |       round(geohashDecode(geohashEncode(lon, lat, 9)).latitude, 2) AS gh_lat,
          |       pointInPolygon(tuple(lon, lat),
          |                      array(tuple(-180.0D, -90.0D), tuple(0.0D, -90.0D),
          |                            tuple(0.0D, 90.0D), tuple(-180.0D, 90.0D))) AS west,
          |       geohashEncode(10.40744D, 57.64911D, 11) AS gh_pin,
          |       pointInPolygon(tuple(3.0D, 3.0D),
          |                      array(tuple(6.0D, 0.0D), tuple(8.0D, 4.0D),
          |                            tuple(5.0D, 8.0D), tuple(0.0D, 2.0D))) AS pip_pin,
          |       formatReadableSize(1110) AS fsize,
          |       formatReadableQuantity(1110) AS fqty,
          |       formatReadableTimeDelta(117) AS fdelta,
          |       bar(5, 0, 10, 10) AS bar5,
          |       bar(2.25D, 0, 10, 10) AS bar_frac
          |FROM pts
          |ORDER BY event_id""".stripMargin)
    },

    // The CH two-sample test family: Student / Welch t statistics and the
    // tie-corrected Mann-Whitney U over the even/odd user cohorts —
    // Welford O(1) state for the t-tests, rank collection for U; the
    // statistics mirror in DuckDB aggregate/window SQL (p-values have no
    // DuckDB special functions and are spec-pinned instead).
    "q147_two_sample_tests" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_tt_events")
      s.sql(
        """SELECT round(studentTTest(value, user_id % 2).t_statistic, 6) AS st_t,
          |       round(welchTTest(value, user_id % 2).t_statistic, 6) AS wt_t,
          |       round(mannWhitneyUTest(value, user_id % 2).u_statistic, 1) AS mw_u,
          |       count(*) AS n
          |FROM graft_tt_events""".stripMargin)
    },

    // CH sequence aggregates: time-weighted exponentialMovingAverage
    // (deterministic ts-sorted weighting) and the maxIntersections sweep
    // over half-open intervals — both mirrored by explicit DuckDB
    // aggregate/window SQL. (groupArrayMovingSum/Avg carry CH's
    // arrival-order caveat and stay spec-pinned on one partition.)
    "q148_sequence_aggs" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_sq_events")
      s.sql(
        """SELECT event_type,
          |       round(exponentialMovingAverage(value,
          |               toUnixTimestamp(ts), 3600.0D), 6) AS ema,
          |       maxIntersections(user_id % 1000,
          |                        user_id % 1000 + event_id % 20) AS mx,
          |       maxIntersectionsPosition(user_id % 1000,
          |                                user_id % 1000 + event_id % 20) AS mx_pos
          |FROM graft_sq_events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    },

    // CH sketch/display aggregates under exact regimes: uniqTheta (theta
    // sketch — exact below its 4096 nominal entries; 150/1500 distinct
    // here), anyHeavy (Boyer-Moore — guaranteed at the planted 2/3
    // majority), histogram (adaptive centroids — exact when distinct ≤
    // bins), sparkbar over a full residue domain.
    "q149_sketch_aggs" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_sk_events")
      s.sql(
        """SELECT event_type,
          |       uniqTheta(user_id) AS ut,
          |       anyHeavy(CASE WHEN event_id % 3 < 2 THEN 'M'
          |                     ELSE concat('x', event_id) END) AS heavy,
          |       concat_ws(';', transform(histogram(CAST(user_id % 4 AS DOUBLE), 8),
          |                b -> concat(b.lower, ':', b.upper, ':', b.height))) AS hist,
          |       sparkbar(CAST(user_id % 8 AS DOUBLE), 1.0D, 8) AS bar
          |FROM graft_sk_events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    },

    // CH Map functions (mapAdd/mapPopulateSeries/mapFromArrays over
    // Spark's native MapType, sorted-key rendering) + the remaining date
    // completions (toTime, ISO week/year, last day, toStartOfInterval on
    // both interval kinds, parseDateTime [BestEffort], fromUnixTimestamp,
    // dateTrunc spelling) and singleValueOrNull.
    "q150_maps_dates" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_mp_events")
      s.sql(
        """WITH sv AS (
          |  SELECT singleValueOrNull(CASE WHEN event_type = 'view'
          |                                THEN event_type END) AS only_view,
          |         singleValueOrNull(user_id % 2) AS mixed
          |  FROM graft_mp_events)
          |SELECT event_id,
          |       concat_ws(',', transform(map_entries(
          |         mapAdd(mapFromArrays(array(1L, 2L), array(event_id, user_id)),
          |                mapFromArrays(array(2L, 3L), array(10L, 20L)))),
          |         e -> concat(e.key, ':', e.value))) AS madd,
          |       concat_ws(',', transform(map_entries(
          |         mapPopulateSeries(mapFromArrays(array(1L, 4L),
          |                                         array(event_id % 5, 7L)))),
          |         e -> concat(e.key, ':', e.value))) AS mpop,
          |       mapContains(mapFromArrays(array('a', 'b'), array(1, 2)), 'a') AS mhas,
          |       CAST(toTime(ts) AS STRING) AS tt,
          |       toISOWeek(ts) AS iw,
          |       toISOYear(ts) AS iy,
          |       CAST(toLastDayOfMonth(ts) AS STRING) AS ld,
          |       CAST(toStartOfInterval(ts, INTERVAL 15 MINUTE) AS STRING) AS si15,
          |       CAST(toStartOfInterval(ts, INTERVAL 2 MONTH) AS STRING) AS si2m,
          |       CAST(parseDateTime('2024-03-05 10:20:30',
          |                          '%Y-%m-%d %H:%i:%S') AS STRING) AS pdt,
          |       CAST(parseDateTimeBestEffort('2024/03/05 10:20:30') AS STRING) AS pbe,
          |       fromUnixTimestamp(1700000000, '%Y-%m-%d') AS fut,
          |       CAST(dateTrunc('hour', ts) AS STRING) AS dtr,
          |       sv.only_view, sv.mixed
          |FROM graft_mp_events CROSS JOIN sv
          |WHERE event_id <= 300
          |ORDER BY event_id""".stripMargin)
    },

    // CH sequenceNextNode: the next-event-after-chain funnel aggregate —
    // 'head' (chain anchored at the user's first event) and
    // 'first_match' (chain anchored at the first cond1 hit), both
    // forward. Mirrored by DuckDB ordered-list indexing per user.
    "q151_sequence_next_node" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_snn_events")
      s.sql(
        """SELECT user_id,
          |       sequenceNextNode('forward', 'head', ts, event_type, true,
          |                        event_type = 'view',
          |                        event_type = 'click') AS after_vc,
          |       sequenceNextNode('forward', 'first_match', ts, event_type, true,
          |                        event_type = 'signup') AS after_signup,
          |       sequenceNextNode('backward', 'last_match', ts, event_type, true,
          |                        event_type = 'purchase') AS before_last_purchase
          |FROM graft_snn_events
          |WHERE user_id <= 200
          |GROUP BY user_id
          |ORDER BY user_id""".stripMargin)
    },

    // CH vector math over the embeddings table (dot/norm/distance family,
    // double-lane folds mirroring DuckDB's list functions on DOUBLE[])
    // plus the encoding / bit / IPv4 scalar battery over events.
    "q152_vector_bits" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).embeddings.createOrReplaceTempView("graft_vm_emb")
      Tables(s, dir).events.createOrReplaceTempView("graft_vm_events")
      s.sql(
        """WITH v AS (
          |  SELECT e1.vec_id AS id1, e1.embedding AS a, e2.embedding AS b
          |  FROM graft_vm_emb e1 JOIN graft_vm_emb e2 ON e2.vec_id = e1.vec_id + 1
          |  WHERE e1.vec_id <= 100),
          |vm AS (
          |  SELECT id1,
          |         round(dotProduct(a, b), 4) AS dp,
          |         round(L1Norm(a), 4) AS n1,
          |         round(L2Norm(a), 4) AS n2,
          |         round(LinfNorm(a), 4) AS ninf,
          |         round(L1Distance(a, b), 4) AS d1,
          |         round(L2Distance(a, b), 4) AS d2,
          |         round(cosineDistance(a, b), 6) AS cd,
          |         round(L2Norm(normalizeL2(a)), 6) AS unit
          |  FROM v),
          |eb AS (
          |  SELECT event_id,
          |         hex(user_id) AS hx,
          |         base64Encode(event_type) AS b64,
          |         base64Decode(base64Encode(event_type)) AS b64rt,
          |         bitAnd(user_id, 255L) AS band,
          |         bitXor(user_id, 170L) AS bxor,
          |         bitShiftLeft(user_id % 1024, 2) AS bshl,
          |         bitCount(user_id) AS bcnt,
          |         bitTest(user_id, 3) AS btst,
          |         IPv4NumToString(user_id * 7919 % 4294967296) AS ip,
          |         IPv4StringToNum(IPv4NumToString(user_id * 7919 % 4294967296)) AS ipn,
          |         isIPv4String(IPv4NumToString(user_id)) AS isip,
          |         isIPv4String(event_type) AS notip,
          |         IPv4CIDRToRange('192.168.5.77', 24).lower AS cidr_lo,
          |         IPv4CIDRToRange('192.168.5.77', 24).upper AS cidr_hi,
          |         exp2(user_id % 10) AS e2,
          |         intExp2(user_id % 20) AS ie2,
          |         roundToExp2(user_id + 1) AS rte
          |  FROM graft_vm_events WHERE event_id <= 300)
          |SELECT eb.*, vm.dp, vm.n1, vm.n2, vm.ninf, vm.d1, vm.d2, vm.cd, vm.unit
          |FROM eb JOIN vm ON vm.id1 = eb.event_id % 100 + 1
          |ORDER BY eb.event_id""".stripMargin)
    },

    // CH HTML/text-hygiene functions — extractTextFromHTML (the raw-web
    // half of a training-data pipeline: script/style/comment removal,
    // CDATA kept verbatim, whitespace collapse), regex group capture,
    // Unicode normalization/repair, query fingerprinting, raw JSON
    // array splitting.
    "q153_html_text" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_ht_events")
      s.sql(
        """SELECT event_id,
          |  extractTextFromHTML(concat(
          |    '<html><head><style>b{}</style></head><body>',
          |    '<script>var x=1;</script><h1>', event_type,
          |    '</h1><p>id <b>', CAST(event_id AS STRING),
          |    '</b><!-- hidden --></p></body></html>')) AS text,
          |  extractTextFromHTML('<p>A<![CDATA[<raw>]]>B</p>') AS cdata_pin,
          |  concat_ws('|', transform(
          |    extractAllGroupsVertical(concat(event_type, '=',
          |      CAST(event_id AS STRING)), '(\\w+)=(\\d+)'),
          |    a -> concat_ws(',', a))) AS grp_v,
          |  normalizeUTF8NFC(event_type) AS nfc,
          |  isValidUTF8(event_type) AS valid,
          |  toValidUTF8(event_type) AS repaired,
          |  normalizeQuery(concat('SELECT * FROM t WHERE id = ',
          |    CAST(event_id AS STRING), " AND name = 'x'")) AS nq,
          |  concat_ws(',', JSONExtractArrayRaw(concat('[1, "a", {"k": ',
          |    CAST(event_id AS STRING), '}]'))) AS jraw,
          |  JSONArrayLength(concat('[1,2,3,', CAST(event_id AS STRING), ']')) AS jlen
          |FROM graft_ht_events
          |WHERE event_id <= 300
          |ORDER BY event_id""".stripMargin)
    },

    // CH distribution tests completing the two-sample family:
    // kolmogorovSmirnovTest's exact ECDF max-gap (mirrored by window
    // cumulative counts) and meanZTest with known variances; erf-family
    // special functions pinned on literals (machine-precision
    // commons-math3 — no DuckDB twin).
    "q154_ks_ztest" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_kz_events")
      s.sql(
        """SELECT event_type,
          |       round(kolmogorovSmirnovTest(value, user_id % 2).d_statistic, 6) AS ksd,
          |       round(meanZTest(value, user_id % 2, 2000.0D, 2000.0D,
          |                       0.95D).z_statistic, 6) AS z,
          |       round(erf(0.5D), 6) AS erf_pin,
          |       round(tgamma(5.0D), 1) AS tg_pin
          |FROM graft_kz_events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    },

    // CH window-view tumble buckets through the dialect — GROUP BY
    // tumble(ts, INTERVAL) expands via Spark's TimeWindowing rule; the
    // bucket bounds and counts mirror the epoch-grid arithmetic.
    "q155_tumble_windows" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_tw_events")
      s.sql(
        """SELECT CAST(win.start AS STRING) AS ws,
          |       CAST(win.end AS STRING) AS we,
          |       cnt,
          |       uv
          |FROM (
          |  SELECT tumble(ts, INTERVAL 6 HOUR) AS win,
          |         count(*) AS cnt,
          |         count(DISTINCT user_id) AS uv
          |  FROM graft_tw_events
          |  GROUP BY tumble(ts, INTERVAL 6 HOUR))
          |ORDER BY ws""".stripMargin)
    },

    // CH QUALIFY + DISTINCT ON dialect clauses: the post-window filter
    // and the first-row-per-group shorthand (CH executes DISTINCT ON as
    // LIMIT 1 BY — so does the rewrite).
    "q156_qualify_distinct_on" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).orders.createOrReplaceTempView("graft_qd_orders")
      val top = graft.engine.ChQualify.sql(s,
        """SELECT o_custkey, o_orderkey, o_totalprice,
          |       row_number() OVER (PARTITION BY o_custkey
          |                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |FROM graft_qd_orders
          |QUALIFY rn <= 2
          |ORDER BY o_custkey, rn""".stripMargin)
      top.createOrReplaceTempView("graft_qd_top")
      val first = graft.engine.ChDistinctOn.sql(s,
        """SELECT DISTINCT ON (bucket)
          |       o_custkey % 10 AS bucket, o_orderkey, o_totalprice
          |FROM graft_qd_orders
          |ORDER BY bucket, o_totalprice DESC, o_orderkey""".stripMargin)
      first.createOrReplaceTempView("graft_qd_first")
      s.sql(
        """SELECT t.o_custkey, t.o_orderkey, t.o_totalprice, t.rn,
          |       f.bucket, f.o_orderkey AS b_orderkey
          |FROM graft_qd_top t
          |LEFT JOIN graft_qd_first f ON f.bucket = t.o_custkey % 10 AND t.rn = 1
          |ORDER BY t.o_custkey, t.rn""".stripMargin)
    },

    // The CH -Resample combinator: per-subinterval aggregates as one
    // array — bounds are literals, so the buckets expand into plain -If
    // aggregates at registration (codegen'd, map-side combined); plus
    // plural weighted quantiles and the capped distinct collect.
    "q158_resample" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_rs_events")
      s.sql(
        """SELECT event_type,
          |       concat_ws(',', sumResample(CAST(user_id % 100 AS BIGINT),
          |                                  user_id % 40, 0, 40, 10)) AS sums,
          |       concat_ws(',', countResample(event_id,
          |                                    user_id % 40, 0, 40, 10)) AS cnts,
          |       concat_ws(',', quantilesExactWeighted(
          |         CAST(user_id % 50 AS BIGINT), 1 + event_id % 3,
          |         0.25D, 0.5D, 0.75D)) AS wqs,
          |       concat_ws(',', groupUniqArrayCapped(user_id % 7, 3)) AS cap3
          |FROM graft_rs_events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    },

    // -State/-Merge combinators for the count-map statistics: per-day
    // entropy/weighted-quantile partials merge to the same value the
    // one-shot aggregate computes — CH's MV-incremental contract,
    // mirrored by DuckDB's direct entropy / cumulative-weight scan.
    "q159_stat_state_merge" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).eventsWithDefaults.createOrReplaceTempView("graft_sm_events")
      s.sql(
        """WITH partials AS (
          |  SELECT event_type, day,
          |         entropyState(user_id % 10) AS h_state,
          |         quantileExactWeightedState(CAST(user_id % 50 AS BIGINT),
          |                                    1 + event_id % 3) AS q_state
          |  FROM graft_sm_events
          |  GROUP BY event_type, day)
          |SELECT event_type,
          |       round(entropyMerge(h_state), 6) AS h,
          |       quantileExactWeightedMerge(q_state, 0.5D) AS q50
          |FROM partials
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    },

    // CH exponentialTimeDecayed* window-function family as ts-anchored
    // aggregates: every point weighted exp(−(t_max − t)/λ) — mirrored by
    // the same formula over DuckDB's EXP.
    "q160_time_decayed" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_td_events")
      s.sql(
        """SELECT event_type,
          |       round(exponentialTimeDecayedSum(value,
          |               toUnixTimestamp(ts), 7200.0D), 6) AS dsum,
          |       round(exponentialTimeDecayedCount(value,
          |               toUnixTimestamp(ts), 7200.0D), 6) AS dcnt,
          |       round(exponentialTimeDecayedAvg(value,
          |               toUnixTimestamp(ts), 7200.0D), 6) AS davg
          |FROM graft_td_events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    },

    // The full CH bitmap algebra beyond and/or (xor/andnot +
    // cardinalities, membership predicates, array round-trip, extrema,
    // subset slicing, bitmapBuild) in one verbatim-SQL battery over
    // view/purchase uid bitmaps, each value mirrored by DuckDB list
    // algebra over the same distinct-uid sets.
    "q135_bitmap_algebra" -> { (s, dir) =>
      ChCompat.register(s)
      graft.functions.Bitmaps.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_bm_events")
      s.sql(
        """WITH b AS (
          |  SELECT groupBitmapStateIf(user_id, event_type = 'view') AS bv,
          |         groupBitmapStateIf(user_id, event_type = 'purchase') AS bp
          |  FROM graft_bm_events WHERE user_id < 500)
          |SELECT bitmapCardinality(bv) AS n_view,
          |       bitmapCardinality(bp) AS n_buy,
          |       bitmapXorCardinality(bv, bp) AS n_xor,
          |       bitmapAndnotCardinality(bv, bp) AS n_viewonly,
          |       bitmapHasAll(bv, bitmapSubsetLimit(bv, 0, 10)) AS hasall_self,
          |       bitmapHasAny(bv, bp) AS overlap,
          |       bitmapContains(bv, 42) AS has42,
          |       bitmapMin(bp) AS min_buy,
          |       bitmapMax(bp) AS max_buy,
          |       concat_ws(',', bitmapToArray(bitmapSubsetLimit(bp, 100, 5))) AS first5_ge100,
          |       bitmapCardinality(bitmapSubsetInRange(bv, 100, 200)) AS views_100_200,
          |       bitmapCardinality(subBitmap(bv, 10, 7)) AS sub7,
          |       bitmapCardinality(bitmapAndnot(bv, bitmapBuild(array(1L, 2L, 3L)))) AS minus3
          |FROM b""".stripMargin)
    },

    // The CH numeric cast family (toInt8/16/32/64, toUInt8/16 wrap mod
    // 2^n, toFloat32/64, toDecimalN with the 9/18/38-digit widths) in
    // verbatim SQL; inputs are integral or decimal-exact so every cast
    // value-gates (sum of toDecimal64 goes through the exact decimal
    // accumulator before ONE double cast).
    "q133_ch_casts" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).lineitem.createOrReplaceTempView("graft_cast_li")
      s.sql(
        """SELECT l_returnflag,
          |       sum(toInt32(l_quantity)) AS q_sum,
          |       sum(toInt8(l_linenumber)) AS ln_sum,
          |       sum(toUInt8(l_orderkey)) AS u8_sum,
          |       sum(toUInt16(l_orderkey)) AS u16_sum,
          |       CAST(sum(toDecimal64(l_extendedprice, 2)) AS DOUBLE) AS price_sum,
          |       min(toFloat32(l_discount)) AS disc_min,
          |       max(toInt64(l_partkey)) AS pk_max
          |FROM graft_cast_li
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    },

    // The CH JSON function family (JSONExtract*/JSONHas/JSONLength +
    // visitParam fast-path spellings) through verbatim SQL over the
    // events props column — typed extraction, presence tests, and the
    // array-length/object-size length contract, all value-gated against
    // DuckDB's json extension.
    "q132_ch_json" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).events.createOrReplaceTempView("graft_json_events")
      s.sql(
        """SELECT event_type,
          |       count(CASE WHEN JSONHas(props, 'k') THEN 1 END) AS has_k,
          |       count(CASE WHEN visitParamHas(props, 'missing') THEN 1 END) AS has_missing,
          |       min(JSONExtractInt(props, 'k')) AS min_k,
          |       max(JSONExtractFloat(props, 'k')) AS max_kf,
          |       min(JSONExtractString(props, 'k')) AS min_ks,
          |       sum(JSONLength(props)) AS key_counts
          |FROM graft_json_events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    },

    // groupArraySorted(x, N) (the bounded ordered-collect aggregate) +
    // arrayIntersect through the dialect: lowest-5 doc ids per language
    // and keyword-vocabulary hits per doc, both value-gated. The
    // intersection is arraySort-wrapped — CH and Spark both return
    // first-array order, but the gate compares canonical forms.
    "q131_group_array_sorted" -> { (s, dir) =>
      ChCompat.register(s)
      Tables(s, dir).documents
        .select(col("doc_id"), col("lang"),
          graft.text.TextFunctions.tokens(col("text")).as("toks"))
        .createOrReplaceTempView("graft_gas_docs")
      s.sql(
        """SELECT lang,
          |       concat_ws(',', groupArraySorted(doc_id, 5)) AS low_ids,
          |       sum(n_kw) AS kw_hits
          |FROM (
          |  SELECT lang, doc_id,
          |         size(arrayIntersect(arrayDistinct(toks),
          |              array('table', 'scan', 'row', 'agg'))) AS n_kw
          |  FROM graft_gas_docs)
          |GROUP BY lang
          |ORDER BY lang""".stripMargin)
    }
  )

  val oracle: Map[String, String] = Map(
    // GROUPING SETS mirrors the TOTALS rewrite; NULLS FIRST matches
    // Spark's ascending-null ordering for the totals row.
    "q85_with_totals" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uv
        |FROM events WHERE user_id % 7 = 0
        |GROUP BY GROUPING SETS ((event_type), ())
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    // DuckDB shares Spark's ROLLUP NULL-key convention; NULLS FIRST
    // matches Spark's ascending-null sort for the subtotal rows.
    "q106_with_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    // independent re-derivation: the oracle never parses the URL — it
    // rebuilds every part from the same raw pieces the Spark side
    // concatenated, so a parse bug on the Spark side cannot cancel out.
    "q97_url_funcs" ->
      """WITH u AS (
        |  SELECT c_custkey, c_nationkey,
        |         lower(c_mktsegment) AS seg,
        |         'www.seg-' || lower(c_mktsegment) || '.example.com' AS host,
        |         '/cust/' || CAST(c_custkey AS VARCHAR) AS pth,
        |         'id=' || CAST(c_custkey % 97 AS VARCHAR) ||
        |           '&n=' || CAST(c_nationkey AS VARCHAR) AS qs,
        |         's' || CAST(c_custkey % 5 AS VARCHAR) AS frag
        |  FROM customer)
        |SELECT 'https://' || host || pth || '?' || qs || '#' || frag AS url,
        |       'https' AS proto,
        |       host,
        |       'seg-' || seg || '.example.com' AS host_nw,
        |       'com' AS tld,
        |       pth,
        |       pth || '?' || qs || '#' || frag AS pth_full,
        |       qs,
        |       frag,
        |       CAST(c_custkey % 97 AS VARCHAR) AS p_id,
        |       CAST(c_nationkey AS VARCHAR) AS p_n,
        |       'https://' || host || pth AS base,
        |       'https://seg-' || seg || '.example.com' || pth || '?' || qs || '#' || frag AS no_www
        |FROM u
        |ORDER BY url""".stripMargin,

    // the doc's four batches inlined as VALUES; exact distinct per
    // (platform, ver) = the doc's golden uv=7 on both rows.
    "q105_doc_handrows" ->
      """WITH v(platform, ver, uid) AS (VALUES
        |  ('android','1.1',1001),('android','1.1',1002),('android','1.1',1003),('android','1.1',1004),
        |  ('android','1.2',1009),('android','1.2',1010),('android','1.2',1130),('android','1.2',1131),
        |  ('android','1.1',2001),('android','1.1',3002),('android','1.1',1003),('android','1.1',3004),
        |  ('android','1.2',2009),('android','1.2',1010),('android','1.2',2130),('android','1.2',2131))
        |SELECT platform, ver, CAST(COUNT(DISTINCT uid) AS BIGINT) AS uv
        |FROM v GROUP BY platform, ver
        |ORDER BY platform, ver""".stripMargin,

    // index-driven list mirrors: generate_series(1, len) plays the lambda
    // index, 1-based slicing re-derives each running construct; array
    // lanes serialize to ','-joined strings on BOTH sides (ragged lists
    // hash unevenly across compare stacks; strings are content-exact).
    "q103_ch_array_math" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |l AS (SELECT doc_id, list_transform(toks, tk -> length(tk)) AS lens FROM t)
        |SELECT doc_id,
        |  array_to_string(list_transform(generate_series(1, least(3, len(lens))),
        |                                  i -> CAST(i AS VARCHAR)), ',') AS enum3,
        |  array_to_string(list_transform(generate_series(1, len(lens)),
        |                 i -> CAST(CAST(list_sum(lens[1:i]) AS BIGINT) AS VARCHAR)), ',') AS cum_lens,
        |  array_to_string(list_transform(generate_series(1, len(lens)),
        |                 i -> CAST(CASE WHEN i = 1 THEN 0 ELSE lens[i] - lens[i-1] END AS VARCHAR)), ',') AS diffs,
        |  array_to_string(list_transform(list_filter(generate_series(1, len(lens)),
        |                             i -> i = 1 OR lens[i] IS DISTINCT FROM lens[i-1]),
        |                 i -> CAST(lens[i] AS VARCHAR)), ',') AS rle_heads,
        |  CAST(COALESCE(list_sum(lens), 0) AS BIGINT) AS sum_len,
        |  CAST(list_min(lens) AS BIGINT) AS min_len,
        |  CAST(list_max(lens) AS BIGINT) AS max_len,
        |  CAST(greatest(len(lens) - 1, 0) AS INT) AS popf_n,
        |  CAST(greatest(len(lens) - 1, 0) AS INT) AS popb_n
        |FROM l
        |ORDER BY doc_id""".stripMargin,

    // list_* mirrors of the by-name dispatch; any/anyLast are the first/
    // last element (deterministic on a per-row array, unlike the
    // aggregate forms over unordered groups).
    "q107_array_reduce" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |l AS (SELECT doc_id, list_transform(toks, tk -> length(tk)) AS lens FROM t)
        |SELECT doc_id,
        |  CAST(COALESCE(list_sum(lens), 0) AS BIGINT) AS r_sum,
        |  CAST(list_min(lens) AS BIGINT) AS r_min,
        |  CAST(list_max(lens) AS BIGINT) AS r_max,
        |  CAST(list_avg(lens) AS DOUBLE) AS r_avg,
        |  CAST(len(lens) AS BIGINT) AS r_cnt,
        |  CAST(len(list_distinct(lens)) AS BIGINT) AS r_uniq,
        |  CAST(lens[1] AS BIGINT) AS r_any,
        |  CAST(lens[len(lens)] AS BIGINT) AS r_last
        |FROM l
        |ORDER BY doc_id""".stripMargin,

    // strpos/regexp mirrors of the string-search battery; every count
    // and flag cast to BIGINT on both sides.
    "q98_string_search" ->
      """SELECT doc_id,
        |       CAST(strpos(text, 'merge') AS BIGINT) AS pos_merge,
        |       CAST(strpos(lower(text), 'merge') AS BIGINT) AS pos_ci,
        |       CAST(regexp_matches(text, '(^|[^A-Za-z0-9])merge([^A-Za-z0-9]|$)') AS BIGINT) AS has_merge,
        |       CAST((strpos(text, 'spark') > 0 OR strpos(text, 'flink') > 0) AS BIGINT) AS any_hit,
        |       CAST((length(text) - length(replace(text, 'table', ''))) / 5 AS BIGINT) AS n_table,
        |       CAST(regexp_matches(text, 'h..h') AS BIGINT) AS re_hit
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // row_number mirror of the LIMIT BY rewrite; total ORDER BY keeps
    // row order deterministic on both sides.
    "q96_limit_by_sql" ->
      """SELECT bucket, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey % 10 AS bucket, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey % 10
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2
        |ORDER BY bucket, o_totalprice DESC, o_orderkey""".stripMargin,

    // generate_series LEFT JOIN = the densified grid; TO 24 is exclusive
    // (CH semantics), so the axis is 0..23 inclusive.
    "q84_with_fill" ->
      """WITH hh AS (
        |  SELECT CAST(extract(hour FROM ts) AS INT) AS h, count(*) AS purchases
        |  FROM events WHERE event_type = 'purchase' AND user_id % 50 = 0
        |  GROUP BY 1),
        |axis AS (SELECT CAST(generate_series AS INT) AS h FROM generate_series(0, 23))
        |SELECT axis.h AS h, hh.purchases AS purchases
        |FROM axis LEFT JOIN hh USING (h)
        |ORDER BY h""".stripMargin,

    // the closed-form mirror of CH's sequential INTERPOLATE walk: group
    // filled rows with the last real row before them (prefix count of
    // real rows), carry = that row's value, linear = value + slope*steps.
    "q116_fill_interpolate" ->
      """WITH hh AS (
        |  SELECT CAST(extract(hour FROM ts) AS INT) AS h,
        |         count(*) AS purchases, MAX(user_id) AS max_uid
        |  FROM events WHERE event_type = 'purchase' AND user_id % 97 = 0
        |  GROUP BY 1),
        |axis AS (SELECT CAST(generate_series AS INT) AS h FROM generate_series(0, 23)),
        |grid AS (
        |  SELECT axis.h AS h, hh.purchases, hh.max_uid,
        |         hh.h IS NULL AS filled
        |  FROM axis LEFT JOIN hh ON axis.h = hh.h),
        |runs AS (
        |  SELECT *, SUM(CASE WHEN filled THEN 0 ELSE 1 END)
        |              OVER (ORDER BY h) AS run
        |  FROM grid),
        |pos AS (
        |  SELECT *,
        |    FIRST_VALUE(purchases) OVER (PARTITION BY run ORDER BY h) AS pv,
        |    FIRST_VALUE(max_uid) OVER (PARTITION BY run ORDER BY h) AS fv,
        |    ROW_NUMBER() OVER (PARTITION BY run ORDER BY h) - 1 AS steps
        |  FROM runs)
        |SELECT h,
        |  CASE WHEN filled AND run > 0 THEN pv ELSE purchases END AS purchases,
        |  CAST(CASE WHEN filled AND run > 0 THEN fv + 10 * steps
        |       ELSE max_uid END AS BIGINT) AS max_uid
        |FROM pos ORDER BY h""".stripMargin,

    "q25_catalog_query" ->
      """SELECT CAST(ts AS DATE) AS day,
        | CASE WHEN user_id % 2 = 0 THEN 'android' ELSE 'ios' END AS platform,
        | COUNT(DISTINCT user_id) AS uv,
        | CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS show_cnt,
        | CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_cnt,
        | CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS show_time_sum
        |  -- FLOOR mirrors Spark's truncating double->long cast (values >= 0)
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // date_diff counts the same boundary crossings as CH dateDiff; the
    // interval family and week/epoch math mirror 1:1 (naive timestamps,
    // UTC session; dayofweek is 0=Sunday in DuckDB, isodow is 1=Monday).
    "q118_ch_date_math" ->
      """SELECT event_id,
        |  date_diff('second',  ts, TIMESTAMP '2024-01-15 12:00:00') AS d_sec,
        |  date_diff('minute',  ts, TIMESTAMP '2024-01-15 12:00:00') AS d_min,
        |  date_diff('hour',    ts, TIMESTAMP '2024-01-15 12:00:00') AS d_hour,
        |  date_diff('day',     ts, TIMESTAMP '2024-01-15 12:00:00') AS d_day,
        |  date_diff('week',    ts, TIMESTAMP '2024-01-15 12:00:00') AS d_week,
        |  date_diff('month',   ts, TIMESTAMP '2024-02-20 00:00:00') AS d_month,
        |  date_diff('quarter', ts, TIMESTAMP '2024-07-01 00:00:00') AS d_quarter,
        |  date_diff('year',    ts, TIMESTAMP '2026-01-01 00:00:00') AS d_year,
        |  epoch_us(ts) // 1000000 AS ux,
        |  epoch_us(ts + INTERVAL 3 DAY) // 1000000 AS ux_add_d,
        |  epoch_us(ts - INTERVAL 7 HOUR) // 1000000 AS ux_sub_h,
        |  epoch_us(ts + INTERVAL 1 MONTH) // 1000000 AS ux_add_mo,
        |  epoch_us(ts + INTERVAL 90 SECOND) // 1000000 AS ux_add_s,
        |  CAST(ts AS DATE) - CAST(dayofweek(ts) AS INT) AS week_sun,
        |  CAST(date_trunc('week', ts) AS DATE) AS week_mon,
        |  CAST(isodow(ts) AS INT) AS dow,
        |  CAST(dayofyear(ts) AS INT) AS doy,
        |  CAST(date_trunc('year', ts) AS DATE) AS y0
        |FROM events WHERE event_id % 17 = 0
        |ORDER BY event_id""".stripMargin,

    // AVG(bigint) is an exact integer sum over one double division in both
    // engines — no float-summation-order seam (the reason the battery
    // averages uids, not values).
    "q119_avg_family" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  ROUND(AVG(CASE WHEN event_type = 'purchase' THEN user_id END), 6) AS avg_uid_purchase,
        |  ROUND(CAST(SUM(user_id * (user_id % 7 + 1)) AS DOUBLE)
        |        / SUM(user_id % 7 + 1), 6) AS avg_uid_weighted,
        |  COUNT(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // halfMD5's full-value mirror: first 16 md5 hex digits uppercased ==
    // Spark's lpad(hex(<first-8-bytes-BE-as-int64>),16,'0'); the shard
    // column re-derives pmod through DuckDB's UBIGINT domain.
    "q121_half_md5" ->
      """SELECT doc_id,
        |  upper(substr(md5(text), 1, 16))   AS h_text,
        |  upper(substr(md5(source), 1, 16)) AS h_source,
        |  CAST(CAST(('0x' || substr(md5(source || '/' || CAST(doc_id AS VARCHAR)), 1, 16))
        |            AS UBIGINT) % 64 AS BIGINT) AS shard
        |FROM documents
        |WHERE doc_id % 3 = 0
        |ORDER BY doc_id""".stripMargin,

    // mirrors the item-dim view's derivations: item_id = event_id % 1000,
    // type_id = item_id % 7, price = item_id % 100 * 10.
    "q112_item_dict_sql" ->
      """SELECT (event_id % 1000) % 7 AS type_id,
        | CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS shows,
        | CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
        | CAST(SUM(CASE WHEN event_type = 'click'
        |          THEN (event_id % 1000) % 100 * 10 ELSE 0 END) AS BIGINT) AS click_rev
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q23_ch_dialect_mv" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
        | COUNT(DISTINCT user_id) AS uv,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        | COUNT(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q48_retention" ->
      """WITH per_user AS (
        |  SELECT CAST(ts AS DATE) AS day, user_id,
        |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS m_view,
        |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS m_click,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS m_purchase
        |  FROM events GROUP BY 1, 2)
        |SELECT day,
        |  CAST(SUM(m_view) AS BIGINT) AS u_view,
        |  CAST(SUM(m_view * m_click) AS BIGINT) AS u_view_click,
        |  CAST(SUM(m_view * m_purchase) AS BIGINT) AS u_view_purchase,
        |  COUNT(*) AS users
        |FROM per_user GROUP BY 1 ORDER BY 1""".stripMargin,

    "q47_freq_topk" ->
      """WITH c AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type AS etype,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT day, etype, cnt,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY day ORDER BY cnt DESC, etype) AS INT) AS rank
        |  FROM c)
        |SELECT day, rank, etype, cnt, CAST(0 AS BIGINT) AS err
        |FROM r WHERE rank <= 3 ORDER BY day, rank""".stripMargin,

    "q26_limit_by" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM orders
        |QUALIFY ROW_NUMBER() OVER (
        |  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 2
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    // m_chain mirrors the matcher's earliest-chaining (optimal for
    // wildcard-separated conditions: v1 = first view, c1 = first click
    // after v1, then any purchase after c1); m_quick pairs each click with
    // its latest preceding view (minimal gap ⇒ existence-equivalent);
    // n_vp runs the greedy view→purchase automaton as a list_reduce
    // (acc = 2·count + pending; a view sets pending, a purchase with
    // pending banks a chain — exactly the leftmost non-overlapping scan).
    "q66_sequence_match" ->
      """WITH base AS (
        |  SELECT CAST(ts AS DATE) AS day, user_id, ts, event_type FROM events),
        |v1 AS (
        |  SELECT day, user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS v1
        |  FROM base GROUP BY 1, 2),
        |c1 AS (
        |  SELECT b.day, b.user_id,
        |    MIN(CASE WHEN b.event_type = 'click' AND b.ts > v1.v1 THEN b.ts END) AS c1
        |  FROM base b JOIN v1 ON b.day = v1.day AND b.user_id = v1.user_id
        |  GROUP BY 1, 2),
        |chain AS (
        |  SELECT b.day, b.user_id,
        |    MAX(CASE WHEN b.event_type = 'purchase' AND b.ts > c1.c1
        |             THEN 1 ELSE 0 END) AS m_chain
        |  FROM base b JOIN c1 ON b.day = c1.day AND b.user_id = c1.user_id
        |  GROUP BY 1, 2),
        |quick0 AS (
        |  SELECT day, user_id, ts, event_type,
        |    MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
        |      PARTITION BY day, user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lastv
        |  FROM base),
        |quick AS (
        |  SELECT day, user_id,
        |    MAX(CASE WHEN event_type = 'click' AND lastv IS NOT NULL
        |              AND epoch_us(ts) - epoch_us(lastv) <= CAST(3600 AS BIGINT) * 1000000
        |             THEN 1 ELSE 0 END) AS m_quick
        |  FROM quick0 GROUP BY 1, 2),
        |codes AS (
        |  -- greedy non-overlapping (V..P) count == V->P transitions in the
        |  -- V/P subsequence (a completed match resets the scan, so extra Vs
        |  -- inside a run never match retroactively). Pure LAG windows:
        |  -- DuckDB's list(ORDER BY) inside a grouped aggregate proved
        |  -- UNSTABLE at sf0.1 row counts (same CTE, 3 different sums).
        |  SELECT day, user_id,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 2 END AS code,
        |    LAG(CASE WHEN event_type = 'view' THEN 1 ELSE 2 END)
        |      OVER (PARTITION BY day, user_id ORDER BY ts) AS prev
        |  FROM base WHERE event_type IN ('view', 'purchase')),
        |vp AS (
        |  SELECT day, user_id,
        |    SUM(CASE WHEN code = 2 AND prev = 1 THEN 1 ELSE 0 END) AS n_vp
        |  FROM codes GROUP BY 1, 2)
        |SELECT v1.day,
        |  CAST(SUM(chain.m_chain) AS BIGINT) AS u_chain,
        |  CAST(SUM(quick.m_quick) AS BIGINT) AS u_quick,
        |  CAST(SUM(COALESCE(vp.n_vp, 0)) AS BIGINT) AS vp_chains,
        |  COUNT(*) AS users
        |FROM v1
        |JOIN chain ON chain.day = v1.day AND chain.user_id = v1.user_id
        |JOIN quick ON quick.day = v1.day AND quick.user_id = v1.user_id
        |LEFT JOIN vp ON vp.day = v1.day AND vp.user_id = v1.user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q73_window_funnel" ->
      """WITH base AS (
        |  SELECT CAST(ts AS DATE) AS day, user_id, ts, event_type FROM events),
        |w AS (
        |  SELECT day, user_id, ts, event_type,
        |    MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
        |      PARTITION BY day, user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lastv
        |  FROM base),
        |per_user AS (
        |  SELECT day, user_id,
        |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
        |    MAX(CASE WHEN event_type = 'purchase' AND lastv IS NOT NULL
        |              AND epoch_us(ts) - epoch_us(lastv) <= CAST(3600 AS BIGINT) * 1000000
        |             THEN 1 ELSE 0 END) AS chained
        |  FROM w GROUP BY 1, 2)
        |SELECT day,
        |  CAST(SUM(has_view) AS BIGINT) AS u_view,
        |  CAST(SUM(chained) AS BIGINT) AS u_funnel,
        |  COUNT(*) AS users
        |FROM per_user GROUP BY 1 ORDER BY 1""".stripMargin,

    "q72_ch_arrays" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(toks, t -> length(t) > 4)) AS INT) AS long_toks,
        |  CAST(len(list_distinct(toks)) AS INT) AS uniq_toks,
        |  list_contains(toks, 'the') AS has_the,
        |  CAST(COALESCE(list_position(toks, 'the'), 0) AS BIGINT) AS the_pos,
        |  array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3,
        |  len(list_filter(toks, t -> t = 'data')) > 0 AS mentions_data
        |FROM t ORDER BY doc_id""".stripMargin,

    "q95_array_join_clause" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tok
        |  FROM documents WHERE doc_id < 50)
        |SELECT tok, COUNT(*) AS cnt
        |FROM (SELECT unnest(tok) AS tok FROM d)
        |GROUP BY tok ORDER BY tok""".stripMargin,

    "q94_scalar_with" ->
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |FROM lineitem
        |WHERE l_quantity > 25 AND l_discount >= 0.05
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // The three shards reconstructed as literal-tagged unions.
    "q92_merge_tables" ->
      """WITH u AS (
        |  SELECT 'graft_evt_shard_a' AS _table, event_id FROM events WHERE event_id % 3 = 0
        |  UNION ALL
        |  SELECT 'graft_evt_shard_b' AS _table, event_id FROM events WHERE event_id % 3 = 1
        |  UNION ALL
        |  SELECT 'graft_evt_shard_c' AS _table, event_id FROM events WHERE event_id % 3 = 2)
        |SELECT _table, COUNT(*) AS cnt,
        |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
        |FROM u GROUP BY _table ORDER BY _table""".stripMargin,

    // [0.5, 0.75) of the md5 hash space as 13-hex-digit string bounds
    // (fixed-width hex compares lexicographically == numerically).
    "q91_sample_clause" ->
      """SELECT lang, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) >= '8000000000000'
        |  AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) < 'c000000000000'
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // quantile_cont's list form mirrors the one-pass plural quantiles;
    // the ANY join is trivially the plain join (unique order keys).
    "q90_quantiles_multi" ->
      """WITH j AS (
        |  SELECT o.o_orderpriority AS pri, l.l_quantity
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |q AS (
        |  SELECT pri, quantile_cont(l_quantity, [0.25, 0.5, 0.75, 0.9]) AS qs,
        |    COUNT(*) AS cnt
        |  FROM j GROUP BY pri)
        |SELECT pri, CAST(i - 1 AS INT) AS qi, qs[i] AS q, cnt
        |FROM q, UNNEST(generate_series(1, 4)) t(i)
        |ORDER BY pri, qi""".stripMargin,

    "q71_ch_scalars" ->
      """SELECT event_id,
        |  CAST(year(ts) * 100 + month(ts) AS INT) AS yyyymm,
        |  CAST((year(ts) * 100 + month(ts)) * 100 + day(ts) AS INT) AS yyyymmdd,
        |  CAST(date_trunc('month', ts) AS DATE) AS month_start,
        |  CAST(date_trunc('week', ts) AS DATE) AS week_monday,
        |  CAST(year(ts) AS INT) AS y, CAST(hour(ts) AS INT) AS h,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS formatted,
        |  array_to_string(string_split(props, ':'), '|') AS props_split,
        |  length(event_type) > 0 AS has_type,
        |  event_id // 7 AS id_div7
        |FROM events ORDER BY event_id""".stripMargin,

    "q69_topk_weighted" ->
      """WITH c AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type AS etype,
        |         CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS wsum
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT day, etype, wsum,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY day ORDER BY wsum DESC, etype) AS INT) AS rank
        |  FROM c)
        |SELECT day, rank, etype, wsum, CAST(0 AS BIGINT) AS err
        |FROM r WHERE rank <= 3 ORDER BY day, rank""".stripMargin,

    "q70_sum_map" ->
      """SELECT CAST(ts AS DATE) AS day, event_type AS etype,
        |  CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS vsum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q68_uniq_up_to" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  LEAST(COUNT(DISTINCT user_id), 11) AS uv_up10,
        |  LEAST(COUNT(DISTINCT user_id), 5001) AS uv_up5000,
        |  LEAST(COUNT(DISTINCT event_type), 4) AS types_up3,
        |  COUNT(DISTINCT user_id) AS uv_exact
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q24_dictget_sql" ->
      """SELECT n.n_name AS nation,
        | COUNT(DISTINCT c.c_custkey) AS uv,
        | CAST(SUM(CASE WHEN c.c_acctbal > 0 THEN CAST(c.c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS pos_bal,
        | CAST(COUNT(CASE WHEN c.c_acctbal > 0 THEN 1 END) AS BIGINT) AS pos_cnt
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // per-lane scalar aggregates rebuilt as the same comma-joined string;
    // avg = exact integer sum / count in one double division.
    "q136_foreach" ->
      """WITH t AS (
        |  SELECT event_type,
        |    CASE WHEN value > 2.5 THEN 1 ELSE 0 END AS hi,
        |    user_id % 10 AS m10, event_id % 7 AS m7
        |  FROM events)
        |SELECT event_type,
        |  CAST(SUM(hi) AS BIGINT) || ',' || CAST(SUM(m10) AS BIGINT)
        |    || ',' || CAST(SUM(m7) AS BIGINT) AS lane_sums,
        |  CAST(MIN(hi) AS BIGINT) || ',' || CAST(MIN(m10) AS BIGINT)
        |    || ',' || CAST(MIN(m7) AS BIGINT) AS lane_mins,
        |  CAST(MAX(hi) AS BIGINT) || ',' || CAST(MAX(m10) AS BIGINT)
        |    || ',' || CAST(MAX(m7) AS BIGINT) AS lane_maxs,
        |  CAST(SUM(hi) AS DOUBLE) / COUNT(*) AS avg_hi,
        |  CAST(SUM(m10) AS DOUBLE) / COUNT(*) AS avg_mod10,
        |  CAST(SUM(m7) AS DOUBLE) / COUNT(*) AS avg_mod7
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,

    // sumCount/boundingRatio/simpleLinearRegression rebuilt from DuckDB
    // built-ins (arg_max/arg_min endpoints; regr_slope/regr_intercept)
    "q137_stat_pack" ->
      """WITH t AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) q,
        |         l_orderkey * 10 + l_linenumber x, l_extendedprice y,
        |         l_quantity qd
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  CAST(SUM(q) AS BIGINT) AS qty_sum,
        |  COUNT(q) AS qty_cnt,
        |  ROUND((arg_max(y, x) - arg_min(y, x)) / CAST(MAX(x) - MIN(x) AS DOUBLE), 6) AS bratio,
        |  ROUND(regr_slope(y, qd), 6) AS slr_k,
        |  ROUND(regr_intercept(y, qd), 6) AS slr_b
        |FROM t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Σ v·e^((t−tmax)/λ) etc. over the epoch grid
    "q160_time_decayed" ->
      """WITH e AS (
        |  SELECT event_type, value, CAST(FLOOR(epoch(ts)) AS BIGINT) t
        |  FROM events),
        |m AS (SELECT event_type, MAX(t) tmax FROM e GROUP BY event_type)
        |SELECT e.event_type,
        |       ROUND(SUM(e.value * EXP((e.t - m.tmax) / 7200.0)), 6) AS dsum,
        |       ROUND(SUM(EXP((e.t - m.tmax) / 7200.0)), 6) AS dcnt,
        |       ROUND(SUM(e.value * EXP((e.t - m.tmax) / 7200.0))
        |             / SUM(EXP((e.t - m.tmax) / 7200.0)), 6) AS davg
        |FROM e JOIN m ON e.event_type = m.event_type
        |GROUP BY e.event_type
        |ORDER BY e.event_type""".stripMargin,

    // the merged partials must equal the direct statistics
    "q159_stat_state_merge" ->
      """WITH wagg AS (
        |  SELECT event_type, CAST(user_id % 50 AS BIGINT) v,
        |         SUM(1 + event_id % 3) wt
        |  FROM events GROUP BY 1, 2),
        |wc AS (
        |  SELECT event_type, v,
        |         SUM(wt) OVER (PARTITION BY event_type ORDER BY v) cum,
        |         SUM(wt) OVER (PARTITION BY event_type) tot
        |  FROM wagg),
        |q AS (
        |  SELECT event_type, MIN(CASE WHEN cum >= 0.5 * tot THEN v END) q50
        |  FROM wc GROUP BY event_type),
        |h AS (
        |  SELECT event_type, ROUND(entropy(user_id % 10), 6) h
        |  FROM events GROUP BY event_type)
        |SELECT h.event_type, h.h, q.q50
        |FROM h JOIN q ON h.event_type = q.event_type
        |ORDER BY h.event_type""".stripMargin,

    // CASE-filtered bucket aggregates; cumulative-weight scans per level
    "q158_resample" ->
      """WITH e AS (
        |  SELECT event_type, user_id % 40 k, CAST(user_id % 100 AS BIGINT) x,
        |         event_id, CAST(user_id % 50 AS BIGINT) v, 1 + event_id % 3 w,
        |         user_id % 7 u
        |  FROM events),
        |base AS (
        |  SELECT event_type,
        |    CAST(COALESCE(SUM(CASE WHEN k >= 0 AND k < 10 THEN x END), 0) AS VARCHAR) || ',' ||
        |    CAST(COALESCE(SUM(CASE WHEN k >= 10 AND k < 20 THEN x END), 0) AS VARCHAR) || ',' ||
        |    CAST(COALESCE(SUM(CASE WHEN k >= 20 AND k < 30 THEN x END), 0) AS VARCHAR) || ',' ||
        |    CAST(COALESCE(SUM(CASE WHEN k >= 30 AND k < 40 THEN x END), 0) AS VARCHAR) AS sums,
        |    CAST(COUNT(CASE WHEN k >= 0 AND k < 10 THEN event_id END) AS VARCHAR) || ',' ||
        |    CAST(COUNT(CASE WHEN k >= 10 AND k < 20 THEN event_id END) AS VARCHAR) || ',' ||
        |    CAST(COUNT(CASE WHEN k >= 20 AND k < 30 THEN event_id END) AS VARCHAR) || ',' ||
        |    CAST(COUNT(CASE WHEN k >= 30 AND k < 40 THEN event_id END) AS VARCHAR) AS cnts
        |  FROM e GROUP BY event_type),
        |wagg AS (
        |  SELECT event_type, v, SUM(w) wt FROM e GROUP BY 1, 2),
        |wc AS (
        |  SELECT event_type, v,
        |         SUM(wt) OVER (PARTITION BY event_type ORDER BY v) cum,
        |         SUM(wt) OVER (PARTITION BY event_type) tot
        |  FROM wagg),
        |wq AS (
        |  SELECT event_type,
        |    CAST(MIN(CASE WHEN cum >= 0.25 * tot THEN v END) AS VARCHAR) || ',' ||
        |    CAST(MIN(CASE WHEN cum >= 0.5 * tot THEN v END) AS VARCHAR) || ',' ||
        |    CAST(MIN(CASE WHEN cum >= 0.75 * tot THEN v END) AS VARCHAR) AS wqs
        |  FROM wc GROUP BY event_type),
        |cap AS (
        |  SELECT event_type,
        |         array_to_string(list_sort(list_distinct(list(u)))[1:3], ',') AS cap3
        |  FROM e GROUP BY event_type)
        |SELECT base.event_type, base.sums, base.cnts, wq.wqs, cap.cap3
        |FROM base
        |JOIN wq ON base.event_type = wq.event_type
        |JOIN cap ON base.event_type = cap.event_type
        |ORDER BY base.event_type""".stripMargin,

    // DuckDB's native QUALIFY mirrors both clauses
    "q156_qualify_distinct_on" ->
      """WITH top AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) rn
        |  FROM orders QUALIFY rn <= 2),
        |fst AS (
        |  SELECT o_custkey % 10 bucket, o_orderkey,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey % 10
        |                            ORDER BY o_totalprice DESC, o_orderkey) rn
        |  FROM orders QUALIFY rn = 1)
        |SELECT t.o_custkey, t.o_orderkey, t.o_totalprice, t.rn,
        |       f.bucket, f.o_orderkey AS b_orderkey
        |FROM top t
        |LEFT JOIN fst f ON f.bucket = t.o_custkey % 10 AND t.rn = 1
        |ORDER BY t.o_custkey, t.rn""".stripMargin,

    // 6-hour epoch-grid buckets
    "q155_tumble_windows" ->
      """WITH b AS (
        |  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 21600 * 21600 g,
        |         user_id
        |  FROM events)
        |SELECT CAST(make_timestamp(g * 1000000) AS VARCHAR) AS ws,
        |       CAST(make_timestamp((g + 21600) * 1000000) AS VARCHAR) AS we,
        |       COUNT(*) AS cnt,
        |       COUNT(DISTINCT user_id) AS uv
        |FROM b GROUP BY g ORDER BY ws""".stripMargin,

    // ECDF via RANGE-frame cumulative counts (ties consumed as peers),
    // z from FILTER aggregates
    "q154_ks_ztest" ->
      """WITH s AS (SELECT event_type, value v, user_id % 2 g FROM events),
        |tot AS (
        |  SELECT event_type,
        |         CAST(COUNT(*) FILTER (g = 0) AS DOUBLE) n0,
        |         CAST(COUNT(*) FILTER (g = 1) AS DOUBLE) n1
        |  FROM s GROUP BY event_type),
        |c AS (
        |  SELECT event_type, v,
        |         SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY event_type ORDER BY v) c0,
        |         SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY event_type ORDER BY v) c1
        |  FROM s),
        |d AS (
        |  SELECT c.event_type,
        |         ROUND(MAX(ABS(c.c0 / tot.n0 - c.c1 / tot.n1)), 6) ksd
        |  FROM c JOIN tot USING (event_type) GROUP BY c.event_type),
        |z AS (
        |  SELECT event_type,
        |         ROUND((AVG(v) FILTER (g = 0) - AVG(v) FILTER (g = 1))
        |               / SQRT(2000.0 / COUNT(*) FILTER (g = 0)
        |                      + 2000.0 / COUNT(*) FILTER (g = 1)), 6) z
        |  FROM s GROUP BY event_type)
        |SELECT d.event_type, d.ksd, z.z,
        |       0.5205 AS erf_pin, 24.0 AS tg_pin
        |FROM d JOIN z USING (event_type)
        |ORDER BY d.event_type""".stripMargin,

    // the stripped text reconstructs from the source columns; hygiene
    // functions are identity on the ASCII inputs; fingerprints are
    // literal pins
    "q153_html_text" ->
      """SELECT event_id,
        |  event_type || ' id ' || event_id AS text,
        |  'A<raw>B' AS cdata_pin,
        |  event_type || ',' || event_id AS grp_v,
        |  event_type AS nfc,
        |  TRUE AS valid,
        |  event_type AS repaired,
        |  'SELECT * FROM t WHERE id = ? AND name = ?' AS nq,
        |  '1,"a",{"k": ' || event_id || '}' AS jraw,
        |  4 AS jlen
        |FROM events
        |WHERE event_id <= 300
        |ORDER BY event_id""".stripMargin,

    // DuckDB list functions on DOUBLE[] mirror the double-lane folds;
    // bit/IP math spelled out with native operators
    "q152_vector_bits" ->
      """WITH v AS (
        |  SELECT e1.vec_id AS id1,
        |         CAST(e1.embedding AS DOUBLE[]) AS a,
        |         CAST(e2.embedding AS DOUBLE[]) AS b
        |  FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1
        |  WHERE e1.vec_id <= 100),
        |vm AS (
        |  SELECT id1,
        |         ROUND(list_dot_product(a, b), 4) AS dp,
        |         ROUND(list_aggregate(list_transform(a, x -> ABS(x)), 'sum'), 4) AS n1,
        |         ROUND(SQRT(list_dot_product(a, a)), 4) AS n2,
        |         ROUND(list_aggregate(list_transform(a, x -> ABS(x)), 'max'), 4) AS ninf,
        |         ROUND(list_aggregate(list_transform(list_zip(a, b),
        |               p -> ABS(p[1] - p[2])), 'sum'), 4) AS d1,
        |         ROUND(list_distance(a, b), 4) AS d2,
        |         ROUND(1 - list_cosine_similarity(a, b), 6) AS cd,
        |         1.0 AS unit
        |  FROM v),
        |eb AS (
        |  SELECT event_id,
        |         hex(user_id) AS hx,
        |         to_base64(encode(event_type)) AS b64,
        |         event_type AS b64rt,
        |         user_id & 255 AS band,
        |         xor(user_id, 170) AS bxor,
        |         (user_id % 1024) << 2 AS bshl,
        |         CAST(bit_count(user_id) AS INT) AS bcnt,
        |         CAST((user_id >> 3) & 1 AS INT) AS btst,
        |         ((user_id * 7919 % 4294967296) >> 24 & 255) || '.' ||
        |         ((user_id * 7919 % 4294967296) >> 16 & 255) || '.' ||
        |         ((user_id * 7919 % 4294967296) >> 8 & 255) || '.' ||
        |         ((user_id * 7919 % 4294967296) & 255) AS ip,
        |         user_id * 7919 % 4294967296 AS ipn,
        |         TRUE AS isip,
        |         FALSE AS notip,
        |         '192.168.5.0' AS cidr_lo,
        |         '192.168.5.255' AS cidr_hi,
        |         POW(2, user_id % 10) AS e2,
        |         CAST(POW(2, user_id % 20) AS BIGINT) AS ie2,
        |         (CAST(1 AS BIGINT) << CAST(FLOOR(LOG2(user_id + 1)) AS INT)) AS rte
        |  FROM events WHERE event_id <= 300)
        |SELECT eb.*, vm.dp, vm.n1, vm.n2, vm.ninf, vm.d1, vm.d2, vm.cd, vm.unit
        |FROM eb JOIN vm ON vm.id1 = eb.event_id % 100 + 1
        |ORDER BY eb.event_id""".stripMargin,

    // ordered-list indexing per user; backward+last_match resolves to
    // the event just before the earliest match in ascending order
    "q151_sequence_next_node" ->
      """WITH ul AS (
        |  SELECT user_id, list(event_type ORDER BY ts, event_type) ev
        |  FROM events WHERE user_id <= 200 GROUP BY user_id),
        |p AS (
        |  SELECT user_id, ev,
        |         CASE WHEN list_position(ev, 'purchase') > 0
        |              THEN len(ev) - list_position(list_reverse(ev), 'purchase') + 1
        |              ELSE 0 END lp
        |  FROM ul)
        |SELECT user_id,
        |  CASE WHEN len(ev) >= 3 AND ev[1] = 'view' AND ev[2] = 'click'
        |       THEN ev[3] END AS after_vc,
        |  CASE WHEN list_position(ev, 'signup') > 0
        |        AND list_position(ev, 'signup') < len(ev)
        |       THEN ev[list_position(ev, 'signup') + 1] END AS after_signup,
        |  CASE WHEN lp > 1 THEN ev[lp - 1] END AS before_last_purchase
        |FROM p ORDER BY user_id""".stripMargin,

    // sorted-key renderings written out; ISO helpers are native DuckDB
    "q150_maps_dates" ->
      """SELECT event_id,
        |  '1:' || event_id || ',2:' || (user_id + 10) || ',3:20' AS madd,
        |  '1:' || (event_id % 5) || ',2:0,3:0,4:7' AS mpop,
        |  TRUE AS mhas,
        |  '1970-01-02 ' || strftime(ts, '%H:%M:%S') AS tt,
        |  CAST(weekofyear(ts) AS INT) AS iw,
        |  CAST(isoyear(ts) AS INT) AS iy,
        |  CAST(last_day(CAST(ts AS DATE)) AS VARCHAR) AS ld,
        |  CAST(make_timestamp(CAST(FLOOR(epoch(ts)) AS BIGINT) // 900 * 900
        |       * 1000000) AS VARCHAR) AS si15,
        |  CAST(CASE WHEN month(ts) % 2 = 0
        |            THEN date_trunc('month', ts) - INTERVAL 1 MONTH
        |            ELSE date_trunc('month', ts) END AS VARCHAR) AS si2m,
        |  '2024-03-05 10:20:30' AS pdt,
        |  '2024-03-05 10:20:30' AS pbe,
        |  '2023-11-14' AS fut,
        |  CAST(date_trunc('hour', ts) AS VARCHAR) AS dtr,
        |  'view' AS only_view,
        |  CAST(NULL AS BIGINT) AS mixed
        |FROM events
        |WHERE event_id <= 300
        |ORDER BY event_id""".stripMargin,

    // exact mirrors: COUNT DISTINCT, the planted majority literal,
    // midpoint bins from per-value counts, level chars from bucket ratios
    "q149_sketch_aggs" ->
      """WITH hc AS (
        |  SELECT event_type, CAST(user_id % 4 AS DOUBLE) v,
        |         CAST(COUNT(*) AS DOUBLE) cnt
        |  FROM events GROUP BY 1, 2),
        |hist0 AS (
        |  SELECT event_type, v, cnt,
        |         COALESCE((LAG(v) OVER w + v) / 2,
        |                  MIN(v) OVER (PARTITION BY event_type)) lo,
        |         COALESCE((LEAD(v) OVER w + v) / 2,
        |                  MAX(v) OVER (PARTITION BY event_type)) hi
        |  FROM hc
        |  WINDOW w AS (PARTITION BY event_type ORDER BY v)),
        |hist AS (
        |  SELECT event_type,
        |         STRING_AGG(CAST(lo AS VARCHAR) || ':' || CAST(hi AS VARCHAR)
        |           || ':' || CAST(cnt AS VARCHAR), ';' ORDER BY v) h
        |  FROM hist0 GROUP BY event_type),
        |bc AS (
        |  SELECT event_type, user_id % 8 r, CAST(COUNT(*) AS DOUBLE) y
        |  FROM events GROUP BY 1, 2),
        |bc2 AS (
        |  SELECT event_type, r,
        |         (['▁','▂','▃','▄','▅','▆','▇','█'])[
        |           CAST(CEIL(y / MAX(y) OVER (PARTITION BY event_type) * 8) AS INT)] ch
        |  FROM bc),
        |bars AS (
        |  SELECT event_type, STRING_AGG(ch, '' ORDER BY r) b
        |  FROM bc2 GROUP BY event_type),
        |agg AS (
        |  SELECT event_type, COUNT(DISTINCT user_id) ut
        |  FROM events GROUP BY event_type)
        |SELECT agg.event_type, agg.ut, 'M' AS heavy, hist.h AS hist, bars.b AS bar
        |FROM agg
        |JOIN hist ON agg.event_type = hist.event_type
        |JOIN bars ON agg.event_type = bars.event_type
        |ORDER BY agg.event_type""".stripMargin,

    // EMA = Σ x·2^((t−t_max)/hl) / Σ 2^((t−t_max)/hl); sweep = +1/−1
    // boundary deltas, ends before starts at the same point, max prefix
    "q148_sequence_aggs" ->
      """WITH e AS (
        |  SELECT event_type, value, CAST(FLOOR(epoch(ts)) AS BIGINT) t,
        |         user_id % 1000 s, user_id % 1000 + event_id % 20 en
        |  FROM events),
        |ema AS (
        |  SELECT e.event_type,
        |         SUM(e.value * POW(2, (e.t - m.tmax) / 3600.0))
        |           / SUM(POW(2, (e.t - m.tmax) / 3600.0)) r
        |  FROM e JOIN (SELECT event_type, MAX(t) tmax FROM e GROUP BY event_type) m
        |    ON e.event_type = m.event_type
        |  GROUP BY e.event_type),
        |b AS (
        |  SELECT event_type, s AS p, 1 AS d FROM e WHERE s < en
        |  UNION ALL
        |  SELECT event_type, en AS p, -1 AS d FROM e WHERE s < en),
        |sweep AS (
        |  SELECT event_type, p,
        |         SUM(SUM(d)) OVER (PARTITION BY event_type ORDER BY p) depth
        |  FROM b GROUP BY event_type, p),
        |mx AS (
        |  SELECT event_type, MAX(depth) m FROM sweep GROUP BY event_type),
        |pos AS (
        |  SELECT sweep.event_type, MIN(p) mp
        |  FROM sweep JOIN mx ON sweep.event_type = mx.event_type
        |             AND sweep.depth = mx.m
        |  GROUP BY sweep.event_type)
        |SELECT ema.event_type,
        |       ROUND(ema.r, 6) AS ema,
        |       CAST(mx.m AS BIGINT) AS mx,
        |       pos.mp AS mx_pos
        |FROM ema
        |JOIN mx ON ema.event_type = mx.event_type
        |JOIN pos ON ema.event_type = pos.event_type
        |ORDER BY ema.event_type""".stripMargin,

    // pooled/Welch t from FILTER aggregates; U from tie-averaged ranks
    "q147_two_sample_tests" ->
      """WITH s AS (
        |  SELECT AVG(value) FILTER (user_id % 2 = 0) m0,
        |         AVG(value) FILTER (user_id % 2 = 1) m1,
        |         VAR_SAMP(value) FILTER (user_id % 2 = 0) v0,
        |         VAR_SAMP(value) FILTER (user_id % 2 = 1) v1,
        |         CAST(COUNT(*) FILTER (user_id % 2 = 0) AS DOUBLE) n0,
        |         CAST(COUNT(*) FILTER (user_id % 2 = 1) AS DOUBLE) n1,
        |         COUNT(*) n
        |  FROM events),
        |r AS (
        |  SELECT user_id % 2 g,
        |         RANK() OVER (ORDER BY value)
        |           + (COUNT(*) OVER (PARTITION BY value) - 1) / 2.0 rk
        |  FROM events),
        |u AS (
        |  SELECT SUM(rk) FILTER (g = 0) r0,
        |         CAST(COUNT(*) FILTER (g = 0) AS DOUBLE) n0,
        |         CAST(COUNT(*) FILTER (g = 1) AS DOUBLE) n1
        |  FROM r)
        |SELECT
        |  ROUND((s.m0 - s.m1) / SQRT(((s.n0 - 1) * s.v0 + (s.n1 - 1) * s.v1)
        |        / (s.n0 + s.n1 - 2) * (1 / s.n0 + 1 / s.n1)), 6) AS st_t,
        |  ROUND((s.m0 - s.m1) / SQRT(s.v0 / s.n0 + s.v1 / s.n1), 6) AS wt_t,
        |  ROUND(LEAST(u.r0 - u.n0 * (u.n0 + 1) / 2,
        |              u.n0 * u.n1 - (u.r0 - u.n0 * (u.n0 + 1) / 2)), 1) AS mw_u,
        |  s.n AS n
        |FROM s CROSS JOIN u""".stripMargin,

    // the same haversine spelled in SQL; geohash-9 cell centers collapse
    // to the source coordinate at 2 decimals; display pins are literals
    "q146_geo_format" ->
      """WITH pts AS (
        |  SELECT event_id,
        |         CAST(user_id % 360 AS DOUBLE) - 180 + 0.5 AS lon,
        |         CAST(user_id % 170 AS DOUBLE) - 85 + 0.25 AS lat
        |  FROM events WHERE event_id <= 500)
        |SELECT event_id,
        |  ROUND(2 * 6372797.560856 * ASIN(SQRT(
        |    POW(SIN((RADIANS(40.7484) - RADIANS(lat)) / 2), 2)
        |    + COS(RADIANS(lat)) * COS(RADIANS(40.7484))
        |      * POW(SIN((RADIANS(-73.9857) - RADIANS(lon)) / 2), 2))), 2) AS gcd,
        |  ROUND(lon, 2) AS gh_lon,
        |  ROUND(lat, 2) AS gh_lat,
        |  lon < 0 AS west,
        |  'u4pruydqqvj' AS gh_pin,
        |  TRUE AS pip_pin,
        |  '1.08 KiB' AS fsize,
        |  '1.11 thousand' AS fqty,
        |  '1 minute, 57 seconds' AS fdelta,
        |  '█████' AS bar5,
        |  '██▎' AS bar_frac
        |FROM pts
        |ORDER BY event_id""".stripMargin,

    // epoch arithmetic, strftime names, and position scans per helper
    "q145_date_helpers" ->
      """SELECT event_id,
        |  make_timestamp((CAST(FLOOR(epoch(ts)) AS BIGINT) // 1800 * 1800) * 1000000) AS slot,
        |  ((CAST(FLOOR(epoch(ts)) AS BIGINT) + 3600) // 1800 - CAST(FLOOR(epoch(ts)) AS BIGINT) // 1800 + 1) AS nslots,
        |  CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS rel_hour,
        |  datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS rel_day,
        |  year(ts) * 12 + month(ts) AS rel_month,
        |  datediff('day', DATE '1858-11-17', CAST(ts AS DATE)) AS mjd,
        |  CAST(ts AS DATE) AS mjd_rt,
        |  strftime(ts, '%B') AS mname,
        |  strftime(ts, '%A') AS wname,
        |  (CAST(FLOOR(epoch(ts)) AS BIGINT) - epoch(TIMESTAMP '2024-01-01 00:00:00')::BIGINT) // 3600 AS age_h,
        |  (CAST(FLOOR(epoch(ts)) AS BIGINT) - epoch(TIMESTAMP '2024-01-01 00:00:00')::BIGINT) // 86400 AS age_d,
        |  CASE event_type WHEN 'view' THEN 'V' WHEN 'purchase' THEN 'P'
        |       ELSE '?' END AS tcode,
        |  array_to_string([position('ie' IN event_type),
        |                   position('ur' IN event_type),
        |                   position('xx' IN event_type)], ',') AS mpos,
        |  (event_type LIKE '%chase%' OR event_type LIKE '%zz%') AS many
        |FROM events
        |WHERE event_id <= 500
        |ORDER BY event_id""".stripMargin,

    // list slicing/aggregate mirrors for the per-row ops, literal pins
    // for the scan shapes, rank-window AUC for the aggregate
    "q144_array_battery" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |         [CAST(l_linenumber AS BIGINT), CAST(l_quantity AS BIGINT),
        |          l_partkey % 7 + 1] AS arr
        |  FROM lineitem WHERE l_orderkey <= 200),
        |r AS (
        |  SELECT event_type, CAST(user_id % 2 AS INT) l,
        |         RANK() OVER (PARTITION BY event_type ORDER BY value)
        |           + (COUNT(*) OVER (PARTITION BY event_type, value) - 1) / 2.0 rk
        |  FROM events),
        |auc AS (
        |  SELECT event_type,
        |         ROUND((SUM(CASE WHEN l = 1 THEN rk ELSE 0 END)
        |                - SUM(l) * (SUM(l) + 1) / 2.0)
        |               / (SUM(l) * (COUNT(*) - SUM(l))), 6) AS auc
        |  FROM r GROUP BY event_type)
        |SELECT l_orderkey, l_linenumber,
        |       list_aggregate(arr, 'product') AS prod,
        |       array_to_string(arr[2:] || arr[1:1], ',') AS rotl,
        |       array_to_string(arr[3:] || arr[1:2], ',') AS rotr,
        |       array_to_string(list_transform(range(1, 3),
        |                                      i -> array_to_string(arr[i:i+1], ',')), ';') AS sh,
        |       '1,2,0,1' AS ccs,
        |       '1,1,2,2,2,3' AS fil,
        |       '1,2,2,3,3,3' AS rfil,
        |       '0,0;1,0;1' AS spl,
        |       '0,0,1;0,1' AS rspl,
        |       (SELECT MIN(auc) FROM auc) AS auc
        |FROM li
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // same-definition DuckDB text built-ins per metric
    "q143_string_distance" ->
      """SELECT p_partkey,
        |       levenshtein(p_name, p_type) AS ed,
        |       damerau_levenshtein(substring(p_name, 1, 12),
        |                           substring(p_type, 1, 12)) AS dl,
        |       ROUND(jaro_similarity(p_name, p_type), 6) AS js,
        |       ROUND(jaro_winkler_similarity(p_name, p_type), 6) AS jw,
        |       hamming(rpad(p_name, 10, '.'), rpad(p_type, 10, '.')) AS bh,
        |       ROUND(jaccard(p_name, p_type), 6) AS sj
        |FROM part
        |WHERE p_partkey <= 500
        |ORDER BY p_partkey""".stripMargin,

    // the same contingency-table math spelled out: chi-square over all
    // r×c cells, entropies via LOG2, ratios per the CH formulas
    "q138_entropy_assoc" ->
      """WITH p AS (
        |  SELECT event_type AS x, CAST(user_id % 3 AS VARCHAR) AS y FROM events),
        |cells AS (SELECT x, y, CAST(COUNT(*) AS DOUBLE) c FROM p GROUP BY x, y),
        |rt AS (SELECT x, SUM(c) r FROM cells GROUP BY x),
        |ct AS (SELECT y, SUM(c) q FROM cells GROUP BY y),
        |tot AS (SELECT SUM(c) n FROM cells),
        |dims AS (SELECT (SELECT COUNT(*) FROM rt) rr, (SELECT COUNT(*) FROM ct) qq),
        |chi AS (
        |  SELECT SUM(POWER(COALESCE(cells.c, 0) - rt.r * ct.q / tot.n, 2)
        |             / (rt.r * ct.q / tot.n)) chi2
        |  FROM rt CROSS JOIN ct CROSS JOIN tot
        |  LEFT JOIN cells ON cells.x = rt.x AND cells.y = ct.y),
        |hx AS (SELECT -SUM(r / tot.n * LOG2(r / tot.n)) h FROM rt CROSS JOIN tot),
        |hxy AS (SELECT -SUM(c / tot.n * LOG2(c / ct.q)) h
        |        FROM cells JOIN ct USING (y) CROSS JOIN tot)
        |SELECT
        |  ROUND((SELECT entropy(event_type) FROM events), 6) AS h_type,
        |  ROUND((SELECT entropy(user_id % 10) FROM events), 6) AS h_mod,
        |  ROUND(SQRT(chi.chi2 / tot.n / LEAST(dims.rr - 1, dims.qq - 1)), 6) AS cv,
        |  ROUND(SQRT(
        |    GREATEST(0, chi.chi2 / tot.n
        |                - (dims.rr - 1) * (dims.qq - 1) / (tot.n - 1))
        |    / LEAST(dims.rr - POWER(dims.rr - 1, 2) / (tot.n - 1) - 1,
        |            dims.qq - POWER(dims.qq - 1, 2) / (tot.n - 1) - 1)), 6) AS cvbc,
        |  ROUND((hx.h - hxy.h) / hx.h, 6) AS tu,
        |  ROUND(SQRT(chi.chi2 / (chi.chi2 + tot.n)), 6) AS cg
        |FROM chi CROSS JOIN tot CROSS JOIN dims CROSS JOIN hx CROSS JOIN hxy""".stripMargin,

    // classic island aggregation: a segment starts a new island when its
    // start exceeds the running max end of everything before it
    "q139_interval_sum" ->
      """WITH iv AS (
        |  SELECT event_type, user_id * 37 % 10000 s,
        |         user_id * 37 % 10000 + event_id % 7 e
        |  FROM events),
        |m AS (
        |  SELECT event_type, s, e,
        |         MAX(e) OVER (PARTITION BY event_type ORDER BY s, e
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) pmax
        |  FROM iv),
        |g AS (
        |  SELECT event_type, s, e,
        |         SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY event_type ORDER BY s, e) grp
        |  FROM m),
        |isl AS (SELECT event_type, grp, MAX(e) - MIN(s) len FROM g GROUP BY 1, 2)
        |SELECT event_type, CAST(SUM(len) AS BIGINT) AS covered
        |FROM isl GROUP BY event_type ORDER BY event_type""".stripMargin,

    // positive lag-deltas in (ts, value) order
    "q140_delta_sum" ->
      """WITH o AS (
        |  SELECT event_type, value,
        |         LAG(value) OVER (PARTITION BY event_type ORDER BY ts, value) pv
        |  FROM events)
        |SELECT event_type,
        |       ROUND(SUM(CASE WHEN value > pv THEN value - pv ELSE 0 END), 6) AS dsum
        |FROM o GROUP BY event_type ORDER BY event_type""".stripMargin,

    // CH's ascending-scan rule: first value whose cumulative weight
    // reaches level * total
    "q141_weighted_quantile" ->
      """WITH w AS (
        |  SELECT l_returnflag rf, CAST(l_quantity AS BIGINT) v,
        |         SUM(l_linenumber) wt
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT rf, v,
        |         SUM(wt) OVER (PARTITION BY rf ORDER BY v) cum,
        |         SUM(wt) OVER (PARTITION BY rf) tot
        |  FROM w)
        |SELECT rf AS l_returnflag,
        |       MIN(CASE WHEN cum >= 0.5 * tot THEN v END) AS wmed,
        |       MIN(CASE WHEN cum >= 0.5 * tot THEN v END) AS wmed2,
        |       MIN(CASE WHEN cum >= 0.9 * tot THEN v END) AS wq90
        |FROM c GROUP BY rf ORDER BY rf""".stripMargin,

    // Spearman = Pearson over average ranks (ties share their mean rank)
    "q142_rank_corr" ->
      """WITH r AS (
        |  SELECT l_returnflag rf,
        |    RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |      + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0 rx,
        |    RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
        |      + (COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2.0 ry,
        |    RANK() OVER (PARTITION BY l_returnflag ORDER BY l_discount)
        |      + (COUNT(*) OVER (PARTITION BY l_returnflag, l_discount) - 1) / 2.0 rd
        |  FROM lineitem)
        |SELECT rf AS l_returnflag,
        |       ROUND(corr(rx, ry), 6) AS rc,
        |       ROUND(corr(rx, rd), 6) AS rc_disc
        |FROM r GROUP BY rf ORDER BY rf""".stripMargin,

    // sorted distinct-uid lists mirror every bitmap value: xor = union
    // minus intersection, andnot = left minus intersection, subsets =
    // ordered list slices/filters.
    "q135_bitmap_algebra" ->
      """WITH lv AS (
        |  SELECT list_sort(list(DISTINCT user_id)) AS l FROM events
        |  WHERE event_type = 'view' AND user_id < 500),
        |lp AS (
        |  SELECT list_sort(list(DISTINCT user_id)) AS l FROM events
        |  WHERE event_type = 'purchase' AND user_id < 500)
        |SELECT
        |  CAST(len(lv.l) AS BIGINT) AS n_view,
        |  CAST(len(lp.l) AS BIGINT) AS n_buy,
        |  CAST(len(list_distinct(lv.l || lp.l)) - len(list_intersect(lv.l, lp.l)) AS BIGINT) AS n_xor,
        |  CAST(len(lv.l) - len(list_intersect(lv.l, lp.l)) AS BIGINT) AS n_viewonly,
        |  true AS hasall_self,
        |  len(list_intersect(lv.l, lp.l)) > 0 AS overlap,
        |  list_contains(lv.l, 42) AS has42,
        |  CAST(COALESCE(lp.l[1], 0) AS BIGINT) AS min_buy,
        |  CAST(COALESCE(lp.l[-1], 0) AS BIGINT) AS max_buy,
        |  array_to_string(list_filter(lp.l, x -> x >= 100)[1:5], ',') AS first5_ge100,
        |  CAST(len(list_filter(lv.l, x -> x >= 100 AND x < 200)) AS BIGINT) AS views_100_200,
        |  CAST(least(7, greatest(0, len(lv.l) - 10)) AS BIGINT) AS sub7,
        |  CAST(len(list_filter(lv.l, x -> x NOT IN (1, 2, 3))) AS BIGINT) AS minus3
        |FROM lv, lp""".stripMargin,

    // unsigned wraps mirror as % 2^n (keys are nonnegative); the decimal
    // sum is the exact accumulator both engines share before the one
    // double cast.
    "q133_ch_casts" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS INT)) AS BIGINT) AS q_sum,
        |  CAST(SUM(CAST(l_linenumber AS TINYINT)) AS BIGINT) AS ln_sum,
        |  CAST(SUM(l_orderkey % 256) AS BIGINT) AS u8_sum,
        |  CAST(SUM(l_orderkey % 65536) AS BIGINT) AS u16_sum,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
        |  MIN(CAST(l_discount AS REAL)) AS disc_min,
        |  CAST(MAX(l_partkey) AS BIGINT) AS pk_max
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // DuckDB's json extension mirrors every member: extract_string for
    // the string/typed forms, json_keys length for the object-size arm.
    "q132_ch_json" ->
      """SELECT event_type,
        |  COUNT(CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN 1 END) AS has_k,
        |  COUNT(CASE WHEN json_extract(props, '$.missing') IS NOT NULL THEN 1 END) AS has_missing,
        |  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS max_kf,
        |  MIN(json_extract_string(props, '$.k')) AS min_ks,
        |  CAST(SUM(CASE WHEN json_type(props) = 'ARRAY'
        |                THEN json_array_length(props)
        |                ELSE len(json_keys(props)) END) AS BIGINT) AS key_counts
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // list(x) sorted+sliced mirrors the bounded ordered collect;
    // list_intersect dedups like Spark's array_intersect, and both sides
    // canonicalize by sorting before the string join.
    "q131_group_array_sorted" ->
      """WITH t AS (
        |  SELECT lang, doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |u AS (
        |  SELECT lang, doc_id,
        |    len(list_intersect(list_distinct(toks),
        |        ['table', 'scan', 'row', 'agg'])) AS n_kw
        |  FROM t)
        |SELECT lang,
        |  array_to_string(list_sort(list(doc_id))[1:5], ',') AS low_ids,
        |  CAST(SUM(n_kw) AS BIGINT) AS kw_hits
        |FROM u GROUP BY lang ORDER BY lang""".stripMargin
  )
}
