package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** ClickHouse's `windowFunnel(window)(ts, cond1..condN)` — the deepest
  * funnel level reachable through a strictly time-increasing event chain
  * e1 < e2 < … < eL (cond_i holds at e_i) with every step within `window`
  * of the chain's FIRST event. Spelled `windowFunnel(ts, window, c1..cN)`
  * (the usual parameterized-aggregate arity adaptation). `ts` may be a
  * timestamp (window in wall seconds) or a BIGINT taken as CH's DateTime
  * epoch seconds (window in the bigint's own units).
  *
  * Semantics are exact-existential: the result is L iff SOME qualifying
  * chain of length L exists (ties in timestamp never chain — strict
  * order). Verified against brute-force subsequence enumeration in
  * WindowFunnelSpec.
  *
  * Shape: a [[TypedImperativeAggregate]] whose state is the group's
  * (ts, condition-bitmask) pairs — like `medianExact`, deliberately
  * value-complete per group (funnel groups are per-user/per-day slices,
  * bounded by a user's event count, not the corpus). The partial/merge
  * phases just concatenate; the DP runs once at eval:
  * sort, then for each level keep the MAX chain-start achievable by
  * strictly-earlier events — extension feasibility (`ts - start ≤ window`)
  * is monotone in start, so the running max is a lossless frontier and
  * the O(n·levels) scan is exact.
  */
object WindowFunnel {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "windowFunnel", es => {
        require(es.length >= 3, "usage: windowFunnel(ts, windowSeconds, cond1, ...)")
        val window = es(1) match {
          case Literal(v: Int, IntegerType) => v.toLong
          case Literal(v: Long, LongType) => v
          case other => throw new IllegalArgumentException(
            s"windowFunnel: windowSeconds must be an integer literal, got $other")
        }
        WindowFunnelAgg(es.head, window, es.drop(2)).toAggregateExpression()
      }, "built-in")

  def window_funnel(ts: Column, windowSeconds: Long, conds: Column*): Column =
    call_function("windowFunnel", (ts +: lit(windowSeconds) +: conds): _*)
}

/** Aggregation state: (event micros, condition bitmask) pairs. */
final class FunnelEvents {
  private[functions] val events = mutable.ArrayBuffer.empty[(Long, Int)]
  def add(ts: Long, mask: Int): Unit = if (mask != 0) events += ((ts, mask))
}

case class WindowFunnelAgg(
    tsChild: Expression,
    windowSeconds: Long,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FunnelEvents] {

  require(conds.nonEmpty && conds.length <= 32, "windowFunnel: 1..32 conditions")
  // timestamp children eval to micros; BIGINT ts is CH's DateTime epoch
  // seconds, so the window stays in the column's own units
  @transient private lazy val windowScaled =
    if (tsChild.dataType == LongType) windowSeconds else windowSeconds * 1000000L

  override def children: Seq[Expression] = tsChild +: conds

  override def checkInputDataTypes(): TypeCheckResult = {
    val tsOk = tsChild.dataType match {
      case TimestampType | TimestampNTZType | LongType => true
      case _ => false
    }
    if (!tsOk) TypeCheckResult.TypeCheckFailure(
      s"windowFunnel: ts must be a timestamp or bigint, got ${tsChild.dataType.simpleString}")
    else conds.find(_.dataType != BooleanType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"windowFunnel: conditions must be boolean, got ${c.dataType.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): FunnelEvents = new FunnelEvents

  override def update(buf: FunnelEvents, row: InternalRow): FunnelEvents = {
    val tsVal = tsChild.eval(row)
    if (tsVal != null) {
      var mask = 0
      var i = 0
      while (i < conds.length) {
        val c = conds(i).eval(row)
        if (c != null && c.asInstanceOf[Boolean]) mask |= (1 << i)
        i += 1
      }
      buf.add(tsVal.asInstanceOf[Long], mask)
    }
    buf
  }

  override def merge(buf: FunnelEvents, other: FunnelEvents): FunnelEvents = {
    buf.events ++= other.events; buf
  }

  override def eval(buf: FunnelEvents): Any = {
    val evs = buf.events.sortBy(_._1)
    val levels = conds.length
    val none = Long.MinValue
    // best(i) = max chain start among chains of length i+1 ending at a
    // STRICTLY earlier event than the current one
    val best = Array.fill(levels)(none)
    val pending = Array.fill(levels)(none)
    var g = 0
    while (g < evs.length) {
      val ts = evs(g)._1
      var h = g
      // process the tie-group [g, h) against the pre-group frontier only
      while (h < evs.length && evs(h)._1 == ts) {
        val mask = evs(h)._2
        if ((mask & 1) != 0 && ts > pending(0)) pending(0) = ts
        var i = 1
        while (i < levels) {
          if ((mask & (1 << i)) != 0 && best(i - 1) != none &&
              ts - best(i - 1) <= windowScaled && best(i - 1) > pending(i))
            pending(i) = best(i - 1)
          i += 1
        }
        h += 1
      }
      var i = 0
      while (i < levels) {
        if (pending(i) > best(i)) best(i) = pending(i)
        i += 1
      }
      g = h
    }
    var level = 0
    var i = 0
    while (i < levels) { if (best(i) != none) level = i + 1; i += 1 }
    level
  }

  override def serialize(buf: FunnelEvents): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.events.length * 12)
    bb.putInt(buf.events.length)
    buf.events.foreach { case (ts, m) => bb.putLong(ts); bb.putInt(m) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FunnelEvents = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new FunnelEvents
    var j = 0
    while (j < n) { buf.events += ((bb.getLong, bb.getInt)); j += 1 }
    buf
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): WindowFunnelAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WindowFunnelAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): WindowFunnelAgg =
    copy(tsChild = cs.head, conds = cs.tail)
  override def prettyName: String = "windowFunnel"
}
