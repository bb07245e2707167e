package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deliberate key-salting for skewed joins.
  *
  * AQE's skew-join handling splits oversized sort-merge partitions at
  * runtime; pre-salting is the complementary tool when a hot key is known
  * a priori (the reference meets the same problem as storage skew and
  * rebalances parts, `data_rebalance.py:207-258` — [[Rebalance]] is that
  * analog; this one is for the shuffle itself): one reducer receiving a
  * whole hot key becomes `salt` reducers receiving 1/salt of it each.
  */
object Skew {

  /** Equi-join with the skewed side salted into `salt` buckets per key.
    *
    * The skewed (probe) side gets a deterministic per-row salt — a content
    * hash mod `salt`, no RNG state, stable across retries — and the other
    * side is exploded `salt`× so every (key, salt) bucket finds its match.
    * Only join types that keep one output row per probe-side match are
    * allowed (inner / left variants); right/full would duplicate the
    * replicated side's unmatched rows.
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be positive: $salt")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin supports inner/left join types, got: $joinType")
    val saltCol = "__graft_salt"
    val s = skewed.withColumn(saltCol,
      pmod(xxhash64(struct(skewed.columns.toSeq.map(col): _*)), lit(salt)).cast("int"))
    val o = other.withColumn(saltCol, explode(sequence(lit(0), lit(salt - 1))))
    s.join(o, keys :+ saltCol, joinType).drop(saltCol)
  }
}
