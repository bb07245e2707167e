package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Declared relational queries — SURVEY.md §2's scan/filter/project/join/
  * group/order/set-op inventory (rows S1, P1-P6, J1-J5, A1-A5, A13-A15, O1,
  * U1, §2.7 scalars), each paired with a DuckDB oracle.
  *
  * All of this is deliberately plain `org.apache.spark.sql` — Catalyst gets
  * the declarative plan and does pushdown/pruning/broadcast on its own.
  */
object RelationalPack {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A1/A2/P1: multi-key hash aggregate with exact-decimal sums (TPC-H Q1
    // shape; ref's PV sums dwm.mainpage_stat_mv_dis.sql:47-50).
    "q01_pricing_summary" -> { (s, dir) =>
      val li = Tables(s, dir).lineitem
      // NOT spread (r14 measured): hash-spreading the filtered rows does
      // parallelize the decimal partial agg (448→106 ms stage), but the
      // single-row-group scan that feeds the exchange stays one task, and
      // the added shuffle + 32-way JIT warmup ate the win (bench min
      // 1.109→1.079, median 1.134→1.745) — reverted, single partial agg
      // at the scan remains the right 100 TB shape (map-side combine,
      // tiny exchange).
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampNTZType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec("l_quantity")).cast(DoubleType).as("sum_qty"),
          moneySum("l_extendedprice").as("sum_base_price"),
          sum(dec("l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - dec("l_discount")))
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // P2/P3/P4: comparison predicates ANDed, projection.
    "q02_filter_project" -> { (s, dir) =>
      val li = Tables(s, dir).lineitem
      li.filter(col("l_quantity") > 45 && col("l_discount") <= 0.02 && col("l_returnflag") =!= "A")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")
        // TOTAL order: the generated lineitem carries duplicate
        // (l_orderkey, l_linenumber) pairs, and the gate compares rows
        // positionally — a two-key sort leaves tie order engine-defined
        // (first diverged at the sf1 rehearsal, round 14)
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")
    },

    // P5: LIKE pattern match (ref data_rebalance.py:199).
    "q03_like" -> { (s, dir) =>
      val p = Tables(s, dir).part
      p.filter(col("p_name").like("%red%"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    },

    // J1: fact ⋈ dim inner equi-join + group (ref dim.dict_user_dim.sql:29-43).
    // The dim side is broadcast — no shuffle of the fact table's join input.
    "q04_join_group" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.orders.join(broadcast(t.customer), col("o_custkey") === col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("order_cnt"), moneySum("o_totalprice").as("revenue"))
        .orderBy("c_mktsegment")
    },

    // J2: dictGet-style enrichment = broadcast left join + default on miss
    // (ref dim.dict_user_dim.sql:24,47; missing key → declared default).
    "q05_dict_enrich" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.events.join(broadcast(t.customer), col("user_id") === col("c_custkey"), "left_outer")
        .withColumn("segment", coalesce(col("c_mktsegment"), lit("UNKNOWN")))
        .groupBy("segment")
        .agg(count(lit(1)).as("evt_cnt"),
          count_distinct(col("user_id")).as("uv"),
          moneySum("value").as("total_value"))
        .orderBy("segment")
    },

    // J3: left join of two aggregated subqueries USING(day)
    // (ref dwm.mainpage_stat_mv_dis.sql:255-276 multi-log merge).
    "q06_subquery_join" -> { (s, dir) =>
      val e = Tables(s, dir).eventsWithDefaults
      val views = e.filter(col("event_type") === "view")
        .groupBy("day").agg(count_distinct(col("user_id")).as("view_uv"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy("day").agg(count_distinct(col("user_id")).as("click_uv"))
      views.join(clicks, Seq("day"), "left_outer")
        .select(col("day"), col("view_uv"), coalesce(col("click_uv"), lit(0L)).as("click_uv"))
        .orderBy("day")
    },

    // J4: cross join (ref data_rebalance.py:133-142 shard×partition skeleton).
    "q07_cross_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.region.crossJoin(t.nation)
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    },

    // J5: join on compound condition (ref data_rebalance.py:143-154).
    "q08_compound_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem.join(t.orders,
          col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")
    },

    // A4: min/max/avg + HAVING (the rebalancer's skew detector,
    // ref data_rebalance.py:159-160).
    "q09_having_skew" -> { (s, dir) =>
      val li = Tables(s, dir).lineitem
      li.groupBy("l_suppkey")
        .agg(count(lit(1)).as("cnt"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          (sum(dec("l_quantity")).cast(DoubleType) / count(lit(1))).as("avg_qty"))
        .filter(col("min_qty") <= col("avg_qty") * 0.5 && col("max_qty") >= col("avg_qty") * 1.5)
        .select("l_suppkey", "cnt", "min_qty", "max_qty")
        .orderBy("l_suppkey")
    },

    // A15: DISTINCT (ref data_rebalance.py:134-141).
    "q10_distinct" -> { (s, dir) =>
      Tables(s, dir).lineitem
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // A5 (exact form) + A14: count distinct of a column and of a tuple.
    "q11_count_distinct" -> { (s, dir) =>
      val li = Tables(s, dir).lineitem
      li.groupBy("l_returnflag")
        .agg(count_distinct(col("l_partkey")).as("part_uv"),
          count_distinct(col("l_partkey"), col("l_suppkey")).as("ps_uv"))
        .orderBy("l_returnflag")
    },

    // O1/O3: order by + top-k.
    "q12_topk" -> { (s, dir) =>
      Tables(s, dir).orders
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    },

    // U1: UNION ALL then aggregate (doc:441-491 batch-union pattern).
    "q13_union_all" -> { (s, dir) =>
      val e = Tables(s, dir).events
      val a = e.filter(col("event_type") === "view").select("event_type", "user_id", "value")
      val b = e.filter(col("event_type") === "click").select("event_type", "user_id", "value")
      a.unionByName(b)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          count_distinct(col("user_id")).as("uv"),
          moneySum("value").as("total_value"))
        .orderBy("event_type")
    },

    // §2.7 date/time scalars: the reference's server-side DEFAULT columns
    // day=toDate(second), hour=toStartOfHour(second) (ods.action_001_dis.sql:3-4)
    // materialized at ingest, then the MV-style hourly rollup.
    "q14_hourly_rollup" -> { (s, dir) =>
      Tables(s, dir).eventsWithDefaults
        .groupBy("day", "hour")
        .agg(count(lit(1)).as("evt_cnt"), moneySum("value").as("total_value"))
        .orderBy("day", "hour")
    },

    // §2.7 JSON + regexp: extract props.k (generators emit/read JSONL,
    // make_user_action_001.py:18).
    "q15_json_extract" -> { (s, dir) =>
      Tables(s, dir).events
        .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast(LongType))
        .groupBy("event_type")
        .agg(count(when(col("k") >= 50, 1)).as("high_k_cnt"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")
    },

    // P6: conditional aggregation — the -If combinator family
    // (ref dwm.mainpage_stat_mv_dis.sql:46-48 uniqCombinedIf/sumIf shape).
    "q16_agg_if" -> { (s, dir) =>
      Tables(s, dir).events
        .groupBy("event_type")
        .agg(
          count_distinct(when(col("value") > 100, col("user_id"))).as("high_uv"),
          sum(when(col("value") > 100, 1).otherwise(0)).as("high_cnt"),
          count(lit(1)).as("cnt"))
        .orderBy("event_type")
    },

    // §2.7 arrays: ARRAY JOIN ≙ explode (doc:341-345).
    "q17_token_explode" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy("token")
    },

    // §2.7 casts + integer math: CH toUInt32(x/1000) truncating division,
    // % bucketing (models.py:270 item_id%100).
    "q18_scalar_math" -> { (s, dir) =>
      Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_extendedprice") / 1000).cast(LongType).as("price_k"),
          pmod(col("l_partkey"), lit(100)).as("part_bucket"))
        // TOTAL order over every projected column (see q02's note)
        .orderBy("l_orderkey", "l_linenumber", "price_k", "part_bucket")
    },

    // A13: exact median (ref medianExact, dwm.mainpage_stat_mv_dis.sql:83).
    "q19_median" -> { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    },

    // O2/S2 promoted to the hash gate: fact⋈fact through BUCKETED tables
    // (Warehouse.writeBucketed — co-located join, the 100 TB lever for
    // repeated joins on one key). The exchange-free plan property is
    // pinned in WarehouseSpec; this query verifies the bucketed READ path
    // end-to-end against DuckDB over the raw parquet.
    "q120_bucketed_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      graft.engine.Warehouse.writeBucketed(
        t.lineitem.select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
        "graft_q120_li", Seq("l_orderkey"), numBuckets = 8)
      graft.engine.Warehouse.writeBucketed(
        t.orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")),
        "graft_q120_ord", Seq("o_orderkey"), numBuckets = 8)
      s.table("graft_q120_li")
        .join(s.table("graft_q120_ord"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_lines"),
          sum(dec("l_extendedprice")).cast(DoubleType).as("revenue"))
        .orderBy("o_orderstatus")
    },

    // S4 widened to the CH text FORMAT family: the documents table takes
    // a full round trip through CSVWithNames (Warehouse.writeDelimited →
    // readDelimited with explicit schema — quoting, header, free-text
    // values with embedded delimiters), then re-aggregates; the oracle
    // reads the original parquet, so any value corrupted in the text
    // round trip breaks the hash.
    "q128_csv_roundtrip" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val tmp = java.nio.file.Files.createTempDirectory("graft-q128-csv")
        .toString + "/docs_csv"
      graft.engine.Warehouse.writeDelimited(docs, tmp, header = true)
      graft.engine.Warehouse.readDelimited(s, tmp, docs.schema, header = true)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("docs"),
          sum(col("n_chars")).as("chars"),
          sum(length(col("text"))).as("text_chars"))
        .orderBy("lang", "source")
    }
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         | ${moneySumSql("l_extendedprice")} AS sum_base_price,
         | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         | COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount <= 0.02 AND l_returnflag <> 'A'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag""".stripMargin,

    "q03_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name LIKE '%red%' ORDER BY p_partkey""".stripMargin,

    "q04_join_group" ->
      s"""SELECT c_mktsegment, COUNT(*) AS order_cnt,
         | ${moneySumSql("o_totalprice")} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q05_dict_enrich" ->
      s"""SELECT COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
         | COUNT(*) AS evt_cnt, COUNT(DISTINCT user_id) AS uv,
         | ${moneySumSql("value")} AS total_value
         |FROM events LEFT JOIN customer ON user_id = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q06_subquery_join" ->
      """WITH v AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS view_uv
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS click_uv
        |  FROM events WHERE event_type = 'click' GROUP BY 1)
        |SELECT v.day AS day, v.view_uv, COALESCE(c.click_uv, 0) AS click_uv
        |FROM v LEFT JOIN c ON v.day = c.day
        |ORDER BY day""".stripMargin,

    "q07_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q08_compound_join" ->
      """SELECT o_orderstatus, COUNT(*) AS cnt
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q09_having_skew" ->
      """SELECT l_suppkey, COUNT(*) AS cnt, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING MIN(l_quantity) <= (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 0.5
        |   AND MAX(l_quantity) >= (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 1.5
        |ORDER BY l_suppkey""".stripMargin,

    "q10_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q11_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS part_uv,
        | COUNT(DISTINCT (l_partkey, l_suppkey)) AS ps_uv
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q12_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q13_union_all" ->
      s"""SELECT event_type, COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS uv,
         | ${moneySumSql("value")} AS total_value
         |FROM (
         |  SELECT event_type, user_id, value FROM events WHERE event_type = 'view'
         |  UNION ALL
         |  SELECT event_type, user_id, value FROM events WHERE event_type = 'click')
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q14_hourly_rollup" ->
      s"""SELECT CAST(ts AS DATE) AS day,
         | CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
         | COUNT(*) AS evt_cnt, ${moneySumSql("value")} AS total_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q15_json_extract" ->
      """SELECT event_type,
        | COUNT(CASE WHEN CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) >= 50 THEN 1 END) AS high_k_cnt,
        | MIN(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS min_k,
        | MAX(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q16_agg_if" ->
      """SELECT event_type,
        | COUNT(DISTINCT CASE WHEN value > 100 THEN user_id END) AS high_uv,
        | CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS high_cnt,
        | COUNT(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q17_token_explode" ->
      """SELECT token, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> '' GROUP BY token ORDER BY token""".stripMargin,

    "q18_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
        | l_partkey % 100 AS part_bucket
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, price_k, part_bucket""".stripMargin,

    "q19_median" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty, COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the bucketed tables hold the same rows as the raw parquet — the
    // oracle joins the originals directly.
    "q120_bucketed_join" ->
      s"""SELECT o.o_orderstatus, COUNT(*) AS n_lines,
         | ${moneySumSql("l.l_extendedprice")} AS revenue
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // oracle reads the ORIGINAL parquet — equality gates that the CSV
    // round trip preserved every text/count value exactly.
    "q128_csv_roundtrip" ->
      """SELECT lang, source, COUNT(*) AS docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars,
        |  CAST(SUM(length(text)) AS BIGINT) AS text_chars
        |FROM documents
        |GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin
  )
}
