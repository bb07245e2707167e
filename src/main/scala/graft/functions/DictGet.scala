package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Literal `dictGet('db.dict', 'attr', key)` semantics (ref
  * dim.dict_user_dim.sql:2-27, doc:660-703): an in-memory hash map shipped to
  * every executor, point-lookup per row, declared default on missing key.
  *
  * The broadcast-join formulation (see RelationalPack q05) is the preferred
  * Spark shape — Catalyst keeps it shuffle-free on the fact side — but this
  * UDF form exists for parity, and the two are asserted equivalent in tests
  * (the reference proves the same equivalence, doc:663-745).
  *
  * Refreshing a dictionary (LIFETIME 1800-3600s, ref dim.dict_user_dim.sql:20)
  * ≙ rebuilding this broadcast from the current dim snapshot per batch.
  */
object DictGet {

  /** Build a string-attribute dictionary from a dim table snapshot.
    * The dim side must be small enough to broadcast — same constraint the
    * reference's HASHED dictionary layout imposes (per-node RAM copy).
    */
  def stringDict(
      spark: SparkSession,
      dim: DataFrame,
      keyCol: String,
      attrCol: String,
      default: String): Column => Column = {
    val m = dim.select(col(keyCol).cast("long"), col(attrCol).cast("string"))
      .na.drop(Seq(keyCol))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) default else r.getString(1)))
      .toMap
    val bc = spark.sparkContext.broadcast(m)
    val fn = udf((k: java.lang.Long) =>
      if (k == null) default else bc.value.getOrElse(k.longValue(), default))
    (key: Column) => fn(key)
  }

  /** Long-attribute variant (e.g. item price lookups, ref dict_item_dim). */
  def longDict(
      spark: SparkSession,
      dim: DataFrame,
      keyCol: String,
      attrCol: String,
      default: Long): Column => Column = {
    val m = dim.select(col(keyCol).cast("long"), col(attrCol).cast("long"))
      .na.drop(Seq(keyCol))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) default else r.getLong(1)))
      .toMap
    val bc = spark.sparkContext.broadcast(m)
    val fn = udf((k: java.lang.Long) =>
      if (k == null) default else bc.value.getOrElse(k.longValue(), default))
    (key: Column) => fn(key)
  }
}
