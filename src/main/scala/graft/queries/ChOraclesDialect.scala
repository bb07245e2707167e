package graft.queries

/** DuckDB oracle SQL for ChPack's dialect-surface queries — the CH
  * relational/window/MV/array/dictionary mirror families (q23–q136).
  * Split from ChPack (round 9) so the oracle corpus grows per-family
  * instead of in one 2,500-line hotspot; this file is the family's live
  * home going forward, not a frozen copy.
  */
object ChOraclesDialect {
  val sql: Map[String, String] = Map(
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

  )
}
