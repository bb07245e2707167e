package graft.queries

/** DuckDB oracle SQL for ChPack's function-family completion queries
  * — the statistical aggregates, sequence/sketch, string-distance,
  * map/date/geo, and combinator mirrors (q131 onward). Split from
  * ChPack in round 9 (same round also REWROTE q137/q139/q148's SUM
  * casts and q151's backward/last_match semantics, and added q163/q164
  * — this file is the family's live home, not a frozen copy).
  */
object ChOraclesStats {
  val sql: Map[String, String] = Map(
    // the translated block-order trio in native window form: first-row
    // difference is 0 (COALESCE over the non-null count), neighbor's
    // omitted default is the type default 0, runningAccumulate is the
    // running partitioned SUM; (event_type, hr) is a grouping key, so
    // the window order is unique and ties cannot diverge
    // DuckDB is the VERIFIER here, not a mirror: sipHash64 is not
    // recomputable in DuckDB, so the oracle reads the SAME staged shard
    // assignment the Spark query wrote (path keyed by the SF dir name; the
    // `good` CTE picks the stage matching THIS comparison's events row
    // AND distinct-uid counts, so interleaved sf0.01/sf0.1 driver runs
    // can't cross wires; stage write and oracle read are sequential in
    // the driver, same-path CONCURRENT runs are out of contract) and
    // re-derives the identical per-bucket profile — gated behind the two
    // invariants checked over the same bytes: stage completeness (row
    // count == raw events) and disjointness (one bucket per uid). Breaking
    // either empties the result, failing the row-count compare.
    "q170_shard_parity" ->
      """WITH st AS (
        |  SELECT user_id, sip_bucket,
        |         regexp_extract(filename, 'graft_q170_stage_([^/]+)', 1) AS tag
        |  FROM read_parquet('/tmp/graft_q170_stage_*/*.parquet', filename=true)),
        |good AS (
        |  SELECT tag FROM st GROUP BY tag
        |  HAVING count(*) = (SELECT count(*) FROM events)
        |     AND count(DISTINCT user_id) = (SELECT count(DISTINCT user_id) FROM events)
        |     AND count(DISTINCT (user_id, sip_bucket)) = count(DISTINCT user_id))
        |SELECT sip_bucket, count(*) AS cnt, count(DISTINCT user_id) AS uids
        |FROM st WHERE tag IN (SELECT tag FROM good)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q169_running_window" ->
      """WITH h AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
        |         CAST(SUM(user_id % 97) AS BIGINT) AS sv,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, hr,
        |  COALESCE(c - lag(c) OVER w, CAST(0 AS BIGINT)) AS dc,
        |  lead(c, 1, CAST(0 AS BIGINT)) OVER w AS next_c,
        |  lag(c, 1, CAST(-1 AS BIGINT)) OVER w AS prev_c,
        |  CAST(SUM(sv) OVER (PARTITION BY event_type ORDER BY hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_sum
        |FROM h
        |WINDOW w AS (ORDER BY event_type, hr)
        |ORDER BY event_type, hr""".stripMargin,

    // DuckDB's native bit_and/bit_or/bit_xor + arg FILTER forms; the
    // arg ordering key (event_id) is unique, so ties cannot diverge
    "q168_bit_aggs" ->
      """SELECT event_type,
        |  bit_and(user_id + 1024) AS band,
        |  bit_or(user_id % 4096) AS bor,
        |  bit_xor(user_id) AS bxor,
        |  arg_max(user_id, event_id) FILTER (event_id % 3 = 0) AS amx,
        |  arg_min(user_id, event_id) FILTER (event_id % 3 = 0) AS amn
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // values present on all ndays days = the intersection; empty
    // intersections render '' through the LEFT JOIN
    "q167_array_intersect" ->
      """WITH u AS (
        |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
        |         CAST(hour(ts) % 6 AS BIGINT) AS h
        |  FROM events),
        |nd AS (SELECT event_type, COUNT(DISTINCT day) ndays FROM u GROUP BY 1),
        |c AS (SELECT event_type, h, COUNT(*) cnt FROM u GROUP BY 1, 2),
        |i AS (
        |  SELECT c.event_type, c.h FROM c
        |  JOIN nd ON c.event_type = nd.event_type AND c.cnt = nd.ndays)
        |SELECT n.event_type,
        |  COALESCE(string_agg(CAST(i.h AS VARCHAR), ',' ORDER BY i.h), '')
        |    AS common_hours
        |FROM nd n LEFT JOIN i ON n.event_type = i.event_type
        |GROUP BY n.event_type ORDER BY n.event_type""".stripMargin,

    // Inclusive rides DuckDB's own quantile_cont (independent R-7
    // implementation); Exclusive writes the clamped h = level·(n+1) rank
    // formula over the sorted list; F from per-group n/avg/var_samp
    "q166_quantile_anova" ->
      """WITH t AS (
        |  SELECT event_type, CAST(user_id % 41 AS DOUBLE) v, value,
        |         user_id % 3 AS grp
        |  FROM events),
        |q AS (
        |  SELECT event_type,
        |         quantile_cont(v, 0.3) inc30, quantile_cont(v, 0.77) inc77,
        |         list(v ORDER BY v) l, CAST(COUNT(*) AS DOUBLE) n,
        |         AVG(value) grand
        |  FROM t GROUP BY event_type),
        |e AS (
        |  SELECT event_type, inc30, inc77, grand,
        |    GREATEST(1.0, LEAST(0.3 * (n + 1.0), n)) h30,
        |    GREATEST(1.0, LEAST(0.5 * (n + 1.0), n)) h50,
        |    l, CAST(n AS INT) ni
        |  FROM q),
        |x AS (
        |  SELECT event_type, inc30, inc77, grand,
        |    l[CAST(FLOOR(h30) AS INT)]
        |      + (h30 - FLOOR(h30))
        |        * (l[LEAST(CAST(FLOOR(h30) AS INT) + 1, ni)]
        |           - l[CAST(FLOOR(h30) AS INT)]) exc30,
        |    l[CAST(FLOOR(h50) AS INT)]
        |      + (h50 - FLOOR(h50))
        |        * (l[LEAST(CAST(FLOOR(h50) AS INT) + 1, ni)]
        |           - l[CAST(FLOOR(h50) AS INT)]) exc50
        |  FROM e),
        |a AS (
        |  SELECT event_type, grp, CAST(COUNT(*) AS DOUBLE) ng,
        |         AVG(value) mg, VAR_SAMP(value) vg
        |  FROM t GROUP BY 1, 2),
        |f AS (
        |  SELECT a.event_type,
        |         SUM(a.ng * (a.mg - x.grand) * (a.mg - x.grand)) ssb,
        |         SUM(a.vg * (a.ng - 1)) ssw,
        |         SUM(a.ng) nn, CAST(COUNT(*) AS DOUBLE) k
        |  FROM a JOIN x ON a.event_type = x.event_type
        |  GROUP BY a.event_type)
        |SELECT x.event_type,
        |  ROUND(x.inc30, 6) AS inc30,
        |  ROUND(x.inc77, 6) AS inc77,
        |  ROUND(x.exc30, 6) AS exc30,
        |  ROUND(x.exc50, 6) AS exc50,
        |  ROUND((f.ssb / (f.k - 1)) / (f.ssw / (f.nn - f.k)), 6) AS f3
        |FROM x JOIN f ON x.event_type = f.event_type
        |ORDER BY x.event_type""".stripMargin,

    // the same midpoint rule written out: per-value Σweight, window
    // cumsum → p_i = (cum − 0.5·w)/W, arg_max/arg_min bracket the level,
    // interpolation in the same double order as the Spark aggregate
    "q165_interp_quantile" ->
      """WITH t AS (
        |  SELECT event_type, CAST(user_id % 50 AS DOUBLE) v,
        |         event_id % 7 + 1 AS wt
        |  FROM events),
        |g AS (SELECT event_type, v, SUM(wt) w FROM t GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, v, w,
        |         SUM(w) OVER (PARTITION BY event_type ORDER BY v) cum,
        |         SUM(w) OVER (PARTITION BY event_type) tot
        |  FROM g),
        |p AS (
        |  SELECT event_type, v,
        |         (CAST(cum AS DOUBLE) - 0.5 * CAST(w AS DOUBLE))
        |           / CAST(tot AS DOUBLE) AS p
        |  FROM c),
        |b AS (
        |  SELECT event_type,
        |    MIN(v) vmin, MAX(v) vmax,
        |    MAX(p) FILTER (p <= 0.25) pl25, arg_max(v, p) FILTER (p <= 0.25) vl25,
        |    MIN(p) FILTER (p >= 0.25) pu25, arg_min(v, p) FILTER (p >= 0.25) vu25,
        |    MAX(p) FILTER (p <= 0.5)  pl50, arg_max(v, p) FILTER (p <= 0.5)  vl50,
        |    MIN(p) FILTER (p >= 0.5)  pu50, arg_min(v, p) FILTER (p >= 0.5)  vu50,
        |    MAX(p) FILTER (p <= 0.9)  pl90, arg_max(v, p) FILTER (p <= 0.9)  vl90,
        |    MIN(p) FILTER (p >= 0.9)  pu90, arg_min(v, p) FILTER (p >= 0.9)  vu90
        |  FROM p GROUP BY event_type)
        |SELECT event_type,
        |  ROUND(CASE WHEN pl25 IS NULL THEN vmin WHEN pu25 IS NULL THEN vmax
        |             WHEN pu25 = pl25 THEN vl25
        |             ELSE vl25 + (vu25 - vl25) * (0.25 - pl25) / (pu25 - pl25) END, 6) AS q25,
        |  ROUND(CASE WHEN pl50 IS NULL THEN vmin WHEN pu50 IS NULL THEN vmax
        |             WHEN pu50 = pl50 THEN vl50
        |             ELSE vl50 + (vu50 - vl50) * (0.5 - pl50) / (pu50 - pl50) END, 6) AS q50,
        |  ROUND(CASE WHEN pl90 IS NULL THEN vmin WHEN pu90 IS NULL THEN vmax
        |             WHEN pu90 = pl90 THEN vl90
        |             ELSE vl90 + (vu90 - vl90) * (0.9 - pl90) / (pu90 - pl90) END, 6) AS q90
        |FROM b ORDER BY event_type""".stripMargin,

    // pairwise corr/covar mirror the matrix entries; the one-sample t is
    // its closed form from AVG/VAR_SAMP/COUNT
    "q163_stat_matrix" ->
      """WITH t AS (
        |  SELECT event_type, CAST(user_id % 97 AS DOUBLE) u, value v,
        |         CAST(event_id % 31 AS DOUBLE) w
        |  FROM events)
        |SELECT event_type,
        |  ROUND(corr(u, v), 6) AS c_uv,
        |  ROUND(corr(u, w), 6) AS c_uw,
        |  ROUND(corr(v, w), 6) AS c_vw,
        |  ROUND(covar_samp(u, v), 6) AS cs_uv,
        |  ROUND(covar_pop(v, w), 6) AS cp_vw,
        |  ROUND((AVG(v) - 50.0) / SQRT(VAR_SAMP(v) / COUNT(*)), 6) AS t_one
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,

    // day-of-week count slots written out as the four shifted renderings;
    // DuckDB's dayofweek is 0=Sunday..6, matching Spark's dayofweek - 1
    "q164_array_insert" ->
      """WITH d AS (
        |  SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dw FROM events),
        |c AS (
        |  SELECT event_type,
        |    CAST(COUNT(*) FILTER (dw = 0) AS VARCHAR) c0,
        |    CAST(COUNT(*) FILTER (dw = 1) AS VARCHAR) c1,
        |    CAST(COUNT(*) FILTER (dw = 2) AS VARCHAR) c2,
        |    CAST(COUNT(*) FILTER (dw = 3) AS VARCHAR) c3,
        |    CAST(COUNT(*) FILTER (dw = 4) AS VARCHAR) c4,
        |    CAST(COUNT(*) FILTER (dw = 5) AS VARCHAR) c5,
        |    CAST(COUNT(*) FILTER (dw = 6) AS VARCHAR) c6
        |  FROM d GROUP BY event_type)
        |SELECT event_type,
        |  c0||','||c1||','||c2||','||c3||','||c4||','||c5||','||c6 AS counts,
        |  c2||','||c3||','||c4||','||c5||','||c6||',0,0' AS shl2,
        |  '-1,-1,-1,'||c0||','||c1||','||c2||','||c3 AS shr3,
        |  '0,'||c0||','||c1||','||c2||','||c3||','||c4||','||c5 AS shl_neg
        |FROM c ORDER BY event_type""".stripMargin,
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

    // ordered-list indexing per user; backward+last_match anchors at the
    // chronologically LAST purchase (len − reversed-position + 1) and
    // the result is the event just before it
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
        |ORDER BY l_orderkey, l_linenumber, prod, rotl""".stripMargin,

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
