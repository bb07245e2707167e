package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Bounded, mergeable quantile-sketch aggregate family — the serving-table
  * answer to `medianExact`'s unbounded state (SCALE.md §3): the state is a
  * Greenwald-Khanna summary (Spark's own `QuantileSummaries`, the engine
  * under approxQuantile) capped at `compressThreshold` samples regardless
  * of group size, with ε-relative-error rank guarantees.
  *
  * Plays the ClickHouse `AggregateFunction(quantileTDigest, ...)` role
  * (ref dwm script AggregateFunction columns; CH quantileTDigest is its
  * bounded-median state). DOCUMENTED DIVERGENCE: the sketch algorithm is
  * GK, not t-digest — the CONTRACT matches (bounded state, mergeable,
  * ε-approximate quantiles, no exact-value guarantee in CH either), the
  * centroid layout does not. Same two-phase TypedImperativeAggregate
  * shape as [[Bitmaps]]/[[Sketches]]: mutable JVM buffer during partial
  * aggregation, serialized only at the shuffle boundary.
  */
object QuantileSketch {

  /** Mutable holder: QuantileSummaries' insert/compress return new
    * instances, so the aggregation buffer is a one-field box.
    */
  final class Buf(var qs: QuantileSummaries)

  private[graft] def empty(eps: Double): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps)

  private[graft] def toBytes(qs0: QuantileSummaries): Array[Byte] = {
    val qs = qs0.compress()
    val n = qs.sampled.length
    val buf = ByteBuffer.allocate(8 + 4 + 8 + 4 + n * 24)
    buf.putDouble(qs.relativeError)
    buf.putInt(qs.compressThreshold)
    buf.putLong(qs.count)
    buf.putInt(n)
    qs.sampled.foreach { s => buf.putDouble(s.value).putLong(s.g).putLong(s.delta) }
    buf.array()
  }

  private[graft] def fromBytes(b: Array[Byte]): QuantileSummaries = {
    val buf = ByteBuffer.wrap(b)
    val eps = buf.getDouble
    val threshold = buf.getInt
    val count = buf.getLong
    val n = buf.getInt
    val sampled = Array.fill(n)(
      QuantileSummaries.Stats(buf.getDouble, buf.getLong, buf.getLong))
    new QuantileSummaries(threshold, eps, sampled, count, true)
  }

  /** SQL literals arrive as whatever the parser typed them (Int, Decimal,
    * Double…) — normalize to Double instead of blind-casting, matching the
    * ChCompat quantileTDigest* handling.
    */
  private def evalDouble(e: Expression, what: String): Double = e.eval() match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: java.lang.Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got: $other")
  }

  def register(spark: SparkSession): Unit = Registration.once(spark, "QuantileSketch") {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("quantile_sketch_agg",
      exprs => QuantileSketchAggregate(exprs.head,
        if (exprs.length > 1) evalDouble(exprs(1), "quantile_sketch_agg eps") else 0.01),
      "built-in")
    reg.createOrReplaceTempFunction("quantile_sketch_merge_agg",
      exprs => QuantileSketchMergeAggregate(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("quantile_sketch_value",
      exprs => QuantileSketchValueExpr(exprs.head,
        evalDouble(exprs(1), "quantile_sketch_value q")), "built-in")
  }

  /** quantileTDigestState-role: aggregate doubles into a bounded sketch. */
  def quantile_state(c: Column, eps: Double = 0.01): Column =
    call_function("quantile_sketch_agg", c, lit(eps))

  /** Merge serialized sketch states (the -Merge face). */
  def quantile_merge_state(c: Column): Column =
    call_function("quantile_sketch_merge_agg", c)

  /** Finalize a serialized sketch to the q-quantile (NULL when empty). */
  def quantile_value(c: Column, q: Double): Column =
    call_function("quantile_sketch_value", c, lit(q))
}

sealed abstract class QuantileSketchAggregateBase
    extends TypedImperativeAggregate[QuantileSketch.Buf]
    with UnaryLike[Expression] {
  override def merge(b: QuantileSketch.Buf, o: QuantileSketch.Buf): QuantileSketch.Buf = {
    b.qs = b.qs.compress().merge(o.qs.compress())
    b
  }
  override def eval(b: QuantileSketch.Buf): Any = QuantileSketch.toBytes(b.qs)
  override def serialize(b: QuantileSketch.Buf): Array[Byte] = QuantileSketch.toBytes(b.qs)
  override def deserialize(bytes: Array[Byte]): QuantileSketch.Buf =
    new QuantileSketch.Buf(QuantileSketch.fromBytes(bytes))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** `quantile_sketch_agg(x, eps)` — raw values into a bounded GK summary.
  * Null inputs are skipped (CH aggregate null handling).
  */
case class QuantileSketchAggregate(
    child: Expression,
    eps: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends QuantileSketchAggregateBase {
  override def createAggregationBuffer(): QuantileSketch.Buf =
    new QuantileSketch.Buf(QuantileSketch.empty(eps))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch_agg requires a numeric child, got ${t.simpleString}")
  }
  override def update(b: QuantileSketch.Buf, row: InternalRow): QuantileSketch.Buf = {
    val v = child.eval(row)
    if (v != null) b.qs = b.qs.insert(v.asInstanceOf[Number].doubleValue())
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantileSketchAggregate =
    copy(child = c)
  override def prettyName: String = "quantile_sketch_agg"
}

/** `quantile_sketch_merge_agg(state)` — merge serialized sketch states;
  * feeding raw values here is an analysis-time type error.
  */
case class QuantileSketchMergeAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends QuantileSketchAggregateBase {
  override def createAggregationBuffer(): QuantileSketch.Buf =
    new QuantileSketch.Buf(QuantileSketch.empty(0.01))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch_merge_agg requires a BinaryType child (a serialized sketch), got ${t.simpleString}")
  }
  override def update(b: QuantileSketch.Buf, row: InternalRow): QuantileSketch.Buf = {
    val v = child.eval(row)
    if (v != null)
      b.qs = b.qs.compress().merge(QuantileSketch.fromBytes(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchMergeAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchMergeAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantileSketchMergeAggregate =
    copy(child = c)
  override def prettyName: String = "quantile_sketch_merge_agg"
}

/** `quantile_sketch_value(state, q)` — scalar finisher; runs
  * post-aggregation on group-count-sized row sets (CodegenFallback is
  * fine there, same posture as the bitmap algebra).
  */
case class QuantileSketchValueExpr(child: Expression, q: Double)
  extends Expression with UnaryLike[Expression] with CodegenFallback {
  require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch_value requires a BinaryType child, got ${t.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else QuantileSketch.fromBytes(v.asInstanceOf[Array[Byte]])
      .query(q).map(java.lang.Double.valueOf).orNull
  }
  override protected def withNewChildInternal(c: Expression): QuantileSketchValueExpr =
    copy(child = c)
  override def prettyName: String = "quantile_sketch_value"
}
