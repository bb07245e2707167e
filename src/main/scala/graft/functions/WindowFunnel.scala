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
  * chain of length L exists (ties in timestamp never chain — CH's
  * `strict_increase` is this baseline already; its no-mode tie behavior
  * is insertion-order-dependent, which a distributed engine cannot
  * reproduce, so the deterministic refinement is the default). Verified
  * against brute-force subsequence enumeration in WindowFunnelSpec.
  *
  * CH's interrupting modes ride as string literals between the window
  * and the conditions — `windowFunnel(ts, w, 'strict_order', c1, …)`:
  * `strict_order` (any stored event between chain steps interrupts) and
  * `strict_dedup` (an event repeating an already-matched condition
  * interrupts) switch eval to CH's documented greedy forward scan.
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

  def register(spark: SparkSession): Unit = Registration.once(spark, "WindowFunnel") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "windowFunnel", es => {
          require(es.length >= 3,
            "usage: windowFunnel(ts, windowSeconds, ['mode', ...] cond1, ...)")
          val window = es(1) match {
            case Literal(v: Int, IntegerType) => v.toLong
            case Literal(v: Long, LongType) => v
            case other => throw new IllegalArgumentException(
              s"windowFunnel: windowSeconds must be an integer literal, got $other")
          }
          // CH's mode arguments ride between the window and the conditions
          // as string literals ('strict_order' / 'strict_dedup' /
          // 'strict_increase')
          val (modeLits, conds) = es.drop(2).span {
            case Literal(_, StringType) => true
            case _ => false
          }
          val modes = modeLits.map {
            case Literal(s, StringType) => String.valueOf(s)
          }.toSet
          val known = Set("strict_order", "strict_dedup", "strict_increase")
          val unknown = modes -- known
          require(unknown.isEmpty, s"windowFunnel: unknown modes $unknown")
          WindowFunnelAgg(es.head, window, conds,
            strictOrder = modes("strict_order"),
            strictDedup = modes("strict_dedup")).toAggregateExpression()
        }, "built-in")
  }

  def window_funnel(ts: Column, windowSeconds: Long, conds: Column*): Column =
    call_function("windowFunnel", (ts +: lit(windowSeconds) +: conds): _*)

  def window_funnel_modes(ts: Column, windowSeconds: Long, modes: Seq[String],
      conds: Column*): Column =
    call_function("windowFunnel",
      (ts +: lit(windowSeconds) +: modes.map(lit(_))) ++ conds: _*)
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
    strictOrder: Boolean = false,
    strictDedup: Boolean = false,
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
    if (strictOrder || strictDedup)
      return greedyEval(buf.events.sortBy(e => (e._1, e._2)).toSeq)
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

  /** CH's interrupting modes run its documented GREEDY forward scan (the
    * exact-existential DP above can't express "some other event broke the
    * chain" — interruption depends on what lies between chosen steps).
    * One pass over the (ts, mask)-sorted events, one live chain:
    *
    *  - an event carrying the next needed condition (strictly later than
    *    the last step, within window of the chain start) ADVANCES;
    *  - otherwise, under `strict_order` every stored event interrupts,
    *    and under `strict_dedup` an event repeating an already-matched
    *    condition interrupts — an interrupted position restarts at level
    *    1 if the event itself carries cond₁, else resets;
    *  - anything else is ignored (non-chain events are invisible without
    *    strict_order, as in CH).
    *
    * An event carrying BOTH the next condition and an interrupting bit
    * advances (advance wins — the tie CH leaves unspecified). The result
    * is the max level any chain reached. `strict_increase` is the
    * baseline contract here already (ties never chain), so it adds no
    * separate branch.
    */
  private def greedyEval(evs: Seq[(Long, Int)]): Int = {
    var maxLevel = 0
    var level = 0
    var matched = 0
    var start = 0L
    var lastStep = 0L
    evs.foreach { case (ts, mask) =>
      if (level > 0 && ts - start > windowScaled) { level = 0; matched = 0 }
      val needBit = 1 << level
      if (level < conds.length && (mask & needBit) != 0 &&
          (level == 0 || ts > lastStep)) {
        if (level == 0) start = ts
        matched |= needBit
        lastStep = ts
        level += 1
        if (level > maxLevel) maxLevel = level
      } else if (level > 0 &&
          (strictOrder || (strictDedup && (mask & matched) != 0))) {
        if ((mask & 1) != 0) {
          level = 1; matched = 1; start = ts; lastStep = ts
          if (maxLevel < 1) maxLevel = 1
        } else { level = 0; matched = 0 }
      }
    }
    maxLevel
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
