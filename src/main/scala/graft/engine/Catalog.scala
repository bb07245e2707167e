package graft.engine

import org.apache.spark.sql.SparkSession

import graft.functions.{ChCompat, Dictionaries}

/** The reference's layered `db.table` namespace (ods/dim/dwm/dws —
  * SURVEY.md §1.1) materialized in Spark's session catalog, so queries
  * address `FROM dws.action_001_dis`-style names verbatim
  * (ref ods.action_001_dis.sql:2,31; dwm.mainpage_stat_mv_dis.sql:28-70).
  *
  * Tables are registered as catalog VIEWS over the driver-generated
  * parquet — no data copy, and the parquet scan under each view still
  * prunes/pushes down through the view boundary. The `*_local` vs `*_dis`
  * split (MergeTree shard vs Distributed router) collapses in Spark:
  * every table is already distributed, so `_dis` is a same-data alias.
  *
  * The raw `events` table is projected into the reference's action-log
  * shape (uid/show_cnt/click_cnt/show_time + server-side DEFAULT columns
  * day/hour, ref ods.action_001_dis.sql:3-16) with deterministic derived
  * dimensions, and `dim.dict_user_dim` (ref dim.dict_user_dim.sql:2-20)
  * is both a queryable dim view (the doc's join form) and a registered
  * broadcast dictionary (the doc's dictGet form).
  */
object Catalog {

  val databases: Seq[String] = Seq("ods", "dim", "dwm", "dws")

  // memoize the session's CURRENT data dir: view DDL is cheap but the
  // dictionary snapshot is a driver collect + broadcast — don't redo it on
  // every call (declared queries call register() unconditionally). The view
  // names are global, so switching dirs must rebuild, and switching back
  // must rebuild again — hence current-dir tracking, not a seen-set.
  // Weak keys: a dead session's entry can never alias a new session (an
  // identity-hash key could, after GC), and entries don't accumulate.
  private val current =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Create the layered databases + action/dim views over `sfDir` and
    * register `dim.dict_user_dim` for SQL `dictGet`. Idempotent per
    * (session, current sfDir); use [[registerForce]] to rebuild in place
    * (e.g. after the underlying data changed — the LIFETIME refresh).
    */
  def register(spark: SparkSession, sfDir: String): Unit =
    if (current.get(spark) != sfDir)
      registerForce(spark, sfDir)

  /** Unconditional rebuild of the catalog views + dictionary snapshot. */
  def registerForce(spark: SparkSession, sfDir: String): Unit = {
    ChCompat.register(spark)
    // events.parquet has shipped `ts` as both TIMESTAMP(NANOS) (loads as
    // BIGINT under nanosAsLong) and TIMESTAMP(MICROS) (loads as NTZ) across
    // testdata generations — probe the actual footer type and emit the
    // matching cast into the view SQL, same branch as Tables.events.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    databases.foreach(db => spark.sql(s"CREATE DATABASE IF NOT EXISTS $db"))
    val ev = s"$sfDir/events.parquet"
    val secondExpr =
      spark.read.parquet(ev).schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          "CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"
        case org.apache.spark.sql.types.TimestampNTZType => "ts"
        case _ => "CAST(ts AS TIMESTAMP_NTZ)"
      }

    // ods.action_001_local (ref ods.action_001_dis.sql:2-22): second is the
    // event time; day/hour are the server-side DEFAULT materializations.
    spark.sql(
      s"""CREATE OR REPLACE VIEW ods.action_001_local AS
         |SELECT to_date(second)                                        AS day,
         |       date_trunc('HOUR', second)                             AS hour,
         |       second,
         |       second                                                 AS insert_second,
         |       CASE WHEN pmod(user_id, 2) = 0 THEN 'android' ELSE 'ios' END AS platform,
         |       ''                                                     AS ip,
         |       ''                                                     AS isp,
         |       user_id                                                AS uid,
         |       concat('1.', pmod(user_id, 3))                         AS ver,
         |       pmod(event_id, 1000)                                   AS item_id,
         |       CASE WHEN event_type = 'view'  THEN 1 ELSE 0 END       AS show_cnt,
         |       CASE WHEN event_type = 'click' THEN 1 ELSE 0 END       AS click_cnt,
         |       CAST(value * 1000 AS BIGINT)                           AS show_time
         |FROM (SELECT *, $secondExpr AS second
         |      FROM parquet.`$ev`)""".stripMargin)

    // ods.action_002_local (ref dwm.mainpage_stat_mv_dis.sql:239-262): the
    // second log of the wide-table MV, with a/b/c action counters derived
    // from the remaining event types.
    spark.sql(
      s"""CREATE OR REPLACE VIEW ods.action_002_local AS
         |SELECT to_date(second)                                        AS day,
         |       date_trunc('HOUR', second)                             AS hour,
         |       second,
         |       CASE WHEN pmod(user_id, 2) = 0 THEN 'android' ELSE 'ios' END AS platform,
         |       user_id                                                AS uid,
         |       concat('1.', pmod(user_id, 3))                         AS ver,
         |       pmod(event_id, 1000)                                   AS item_id,
         |       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END    AS action_a_cnt,
         |       CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END    AS action_b_cnt,
         |       CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END    AS action_c_cnt,
         |       CAST(value AS BIGINT)                                  AS action_d_sum
         |FROM (SELECT *, $secondExpr AS second
         |      FROM parquet.`$ev`)""".stripMargin)

    // Distributed aliases (ref ods.action_001_dis.sql:24-31)
    spark.sql("CREATE OR REPLACE VIEW dws.action_001_dis AS SELECT * FROM ods.action_001_local")
    spark.sql("CREATE OR REPLACE VIEW dws.action_002_dis AS SELECT * FROM ods.action_002_local")

    // dim.dict_user_dim (ref dim.dict_user_dim.sql:2-20): one row per uid
    // with deterministic derived attributes; queryable as a view (the
    // doc's join form, :37-44) and registered as a broadcast dictionary
    // (the doc's dictGet form, :24-27).
    spark.sql(
      s"""CREATE OR REPLACE VIEW dim.dict_user_dim AS
         |SELECT DISTINCT
         |       user_id                                                AS uid,
         |       CASE WHEN pmod(user_id, 2) = 0 THEN 'android' ELSE 'ios' END AS platform,
         |       ''                                                     AS country,
         |       ''                                                     AS province,
         |       ''                                                     AS isp,
         |       ''                                                     AS app_version,
         |       ''                                                     AS os_version,
         |       ''                                                     AS mac,
         |       ''                                                     AS ip,
         |       CASE CAST(pmod(user_id, 3) AS INT)
         |            WHEN 0 THEN 'male' WHEN 1 THEN 'female' ELSE '' END AS gender,
         |       CAST(18 + pmod(user_id, 50) AS SMALLINT)               AS age
         |FROM parquet.`$ev`""".stripMargin)

    Dictionaries.register(spark, "dim.dict_user_dim", spark.table("dim.dict_user_dim"),
      keyCol = "uid", defaults = Map("age" -> (-1).toShort))

    // dim.dict_item_dim (ref dim.dict_item_dim.sql:2-11, item_dim_dis.sql:
    // 2-11): one row per item_id with deterministic derived attributes
    // (type_id, price) — queryable view + broadcast dictionary, with the
    // DDL's declared defaults (type_id 0, price 0).
    spark.sql(
      s"""CREATE OR REPLACE VIEW dim.dict_item_dim AS
         |SELECT DISTINCT
         |       pmod(event_id, 1000)                                   AS item_id,
         |       pmod(pmod(event_id, 1000), 7)                          AS type_id,
         |       pmod(event_id, 1000) % 100 * 10                        AS price
         |FROM parquet.`$ev`""".stripMargin)
    Dictionaries.register(spark, "dim.dict_item_dim", spark.table("dim.dict_item_dim"),
      keyCol = "item_id", defaults = Map("type_id" -> 0L, "price" -> 0L))
    // memoize only after the whole build (incl. the dictionary collect)
    // succeeded — a failed build must not suppress the retry
    current.put(spark, sfDir)
  }

  /** Register a written state table (e.g. an MV target the test just
    * produced) under a `db.table` name — the `dws.mainpage_stat_mv_dis`
    * read-side seam (ref dwm.mainpage_stat_mv_dis.sql:23-26).
    */
  def registerParquet(spark: SparkSession, name: String, path: String): Unit =
    spark.sql(s"CREATE OR REPLACE VIEW $name AS SELECT * FROM parquet.`$path`")
}
