package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Literal `dictGet('db.dict', 'attr', key)` semantics (ref
  * dim.dict_user_dim.sql:2-27, doc:660-703): an in-memory hash map shipped to
  * every executor, point-lookup per row, declared default on missing key.
  *
  * The broadcast-join formulation (see RelationalPack q05) is the preferred
  * Spark shape — Catalyst keeps it shuffle-free on the fact side — but this
  * point-lookup form exists for parity, and the two are asserted equivalent
  * in tests (the reference proves the same equivalence, doc:663-745). Both
  * faces ride the native [[DictGetExpr]] Catalyst expression through the
  * [[Dictionaries]] registry — no Scala UDF anywhere on the lookup path;
  * these helpers just register an ad-hoc dictionary for a one-off dim.
  *
  * Refreshing a dictionary (LIFETIME 1800-3600s, ref dim.dict_user_dim.sql:20)
  * ≙ rebuilding this broadcast from the current dim snapshot per batch
  * (re-call, or the scheduled form: `ChReplay.startDictionaryTicker`).
  */
object DictGet {

  private def adhoc(
      spark: SparkSession,
      dim: DataFrame,
      keyCol: String,
      attrCol: String,
      attrType: String,
      default: Any): Column => Column = {
    ChCompat.register(spark)
    val name = "graft_adhoc_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    Dictionaries.register(spark, name,
      dim.select(col(keyCol), col(attrCol).cast(attrType)), keyCol,
      Map(attrCol -> default))
    key => call_function("dictGet", lit(name), lit(attrCol), key)
  }

  /** Build a string-attribute dictionary from a dim table snapshot.
    * The dim side must be small enough to broadcast — same constraint the
    * reference's HASHED dictionary layout imposes (per-node RAM copy).
    */
  def stringDict(
      spark: SparkSession,
      dim: DataFrame,
      keyCol: String,
      attrCol: String,
      default: String): Column => Column =
    adhoc(spark, dim, keyCol, attrCol, "string", default)

  /** Long-attribute variant (e.g. item price lookups, ref dict_item_dim). */
  def longDict(
      spark: SparkSession,
      dim: DataFrame,
      keyCol: String,
      attrCol: String,
      default: Long): Column => Column =
    adhoc(spark, dim, keyCol, attrCol, "long", default)
}
