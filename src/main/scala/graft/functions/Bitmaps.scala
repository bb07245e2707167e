package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.{call_function, coalesce, lit, when}
import org.apache.spark.sql.types._
import org.roaringbitmap.RoaringBitmap

/** RoaringBitmap aggregate family — the Spark-native analog of ClickHouse's
  * `groupBitmap` / `groupBitmapMergeState` / `bitmap*` scalar algebra
  * (ref scripts/sql/dwm.mainpage_stat_mv_dis.sql:134-139, 184-185, 280-290;
  * funnel doc usage in docs/物化视图的实战经验分享.md:1207-1238).
  *
  * Implemented as Catalyst [[TypedImperativeAggregate]]s (not Scala
  * `Aggregator`s) so the bitmap buffer lives as a mutable JVM object during
  * partial aggregation and is serialized only at the shuffle boundary —
  * the same partial/final two-phase shape ClickHouse uses for `-State`/
  * `-Merge`, and the design that scales: the map-side combine collapses each
  * partition's uids into one bitmap before any data moves.
  *
  * Element domain is uint32 (the reference's `groupBitmap(UInt32)`); Long
  * inputs outside [0, 2^32) throw rather than silently corrupt.
  */
object Bitmaps {

  private[graft] def toBytes(bm: RoaringBitmap): Array[Byte] = {
    bm.runOptimize()
    val buf = ByteBuffer.allocate(bm.serializedSizeInBytes())
    bm.serialize(buf)
    buf.array()
  }

  private[graft] def fromBytes(b: Array[Byte]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    bm.deserialize(ByteBuffer.wrap(b))
    bm
  }

  private[graft] def toUint32(l: Long): Int = {
    require(l >= 0L && l <= 0xFFFFFFFFL, s"bitmap element out of uint32 range: $l")
    l.toInt
  }

  /** Register `bitmap_agg` / `bitmap_merge_agg` in the session's function
    * registry (idempotent). Needed before the Column helpers below resolve.
    */
  def register(spark: SparkSession): Unit = Registration.once(spark, "Bitmaps") {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "bitmap_agg", exprs => BitmapAggregate(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "bitmap_merge_agg", exprs => BitmapMergeAggregate(exprs.head), "built-in")
    for (op <- Seq("and", "or", "xor"))
      reg.createOrReplaceTempFunction(
        s"bitmap_${op}_fold_agg", exprs => BitmapFoldAggregate(exprs.head, op), "built-in")
    // raw (null-propagating) scalar algebra — the Column helpers below
    // wrap these with the CH null conventions
    reg.createOrReplaceTempFunction(
      "bitmap_cardinality_raw", exprs => BitmapCardinalityExpr(exprs.head), "built-in")
    for ((name, op) <- Seq("bitmap_and_raw" -> "and", "bitmap_or_raw" -> "or",
        "bitmap_and_card_raw" -> "and_card", "bitmap_or_card_raw" -> "or_card"))
      reg.createOrReplaceTempFunction(
        name, exprs => BitmapBinaryExpr(exprs(0), exprs(1), op), "built-in")
  }

  /** groupBitmap: aggregate integral ids into a serialized RoaringBitmap. */
  def bitmap_agg(c: Column): Column = call_function("bitmap_agg", c)

  /** groupBitmapMergeState: OR together serialized bitmaps (state merge). */
  def bitmap_merge_agg(c: Column): Column = call_function("bitmap_merge_agg", c)

  /** groupBitmapAndState/OrState/XorState: fold serialized bitmap states
    * with the given op (`"and" | "or" | "xor"`); empty group → empty bitmap. */
  def bitmap_fold_agg(c: Column, op: String): Column =
    call_function(s"bitmap_${op}_fold_agg", c)

  // ---- scalar bitmap algebra (post-aggregation, small row counts) ----
  // Native expressions (shared with the ChCompat SQL surface), wrapped in
  // CASE/COALESCE for the null conventions the former UDF forms had: a
  // NULL bitmap counts as empty for cardinalities and as identity for OR,
  // but AND of a NULL is NULL (unknown ∧ x is unknown). Requires
  // Bitmaps.register on the session (query packs and StateTable do this).

  /** bitmapCardinality — NULL counts 0 */
  def bitmap_cardinality(c: Column): Column =
    coalesce(call_function("bitmap_cardinality_raw", c), lit(0L))
  /** bitmapAnd (binary, nest for k-way — doc:1238); NULL in, NULL out */
  def bitmap_and(a: Column, b: Column): Column =
    call_function("bitmap_and_raw", a, b)
  /** bitmapOr — NULL is identity */
  def bitmap_or(a: Column, b: Column): Column =
    when(a.isNull, b).when(b.isNull, a)
      .otherwise(call_function("bitmap_or_raw", a, b))
  /** bitmapAndCardinality — any NULL side gives 0 */
  def bitmap_and_cardinality(a: Column, b: Column): Column =
    coalesce(call_function("bitmap_and_card_raw", a, b), lit(0L))
  /** bitmapOrCardinality — a NULL side falls back to the other's count */
  def bitmap_or_cardinality(a: Column, b: Column): Column =
    when(a.isNull, bitmap_cardinality(b))
      .when(b.isNull, bitmap_cardinality(a))
      .otherwise(call_function("bitmap_or_card_raw", a, b))
}

/** Shared shape for the two bitmap aggregates. */
sealed abstract class BitmapAggregateBase
    extends TypedImperativeAggregate[RoaringBitmap]
    with UnaryLike[Expression] {
  override def createAggregationBuffer(): RoaringBitmap = new RoaringBitmap()
  override def merge(b: RoaringBitmap, o: RoaringBitmap): RoaringBitmap = { b.or(o); b }
  override def eval(b: RoaringBitmap): Any = Bitmaps.toBytes(b)
  override def serialize(b: RoaringBitmap): Array[Byte] = Bitmaps.toBytes(b)
  override def deserialize(bytes: Array[Byte]): RoaringBitmap = Bitmaps.fromBytes(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** `bitmap_agg(uid)` — ClickHouse `groupBitmapState(uid)`. Null inputs are
  * skipped (matches CH aggregate null handling / the `-If` combinator when
  * fed `when(cond, uid)`).
  */
case class BitmapAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends BitmapAggregateBase {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bitmap_agg requires an integral child, got ${t.simpleString}")
  }
  override def update(b: RoaringBitmap, row: InternalRow): RoaringBitmap = {
    val v = child.eval(row)
    if (v != null) b.add(Bitmaps.toUint32(v.asInstanceOf[Number].longValue()))
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): BitmapAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapAggregate =
    copy(child = c)
  override def prettyName: String = "bitmap_agg"
}

/** Fold buffer for [[BitmapFoldAggregate]]: `bm == null` means "no input
  * yet" — required because AND has no representable identity element (the
  * full uint32 universe), so the first bitmap seeds the fold. */
final class BitmapFoldBuf {
  private[graft] var bm: RoaringBitmap = null
}

/** ClickHouse's aggregate-form bitmap folds `groupBitmapAnd/Or/Xor` over
  * an already-aggregated bitmap-state column (CH: AggregateFunction
  * (groupBitmap, UInt32)-typed input; the plain spellings return the
  * folded cardinality, the `-State` forms the folded bitmap). All three
  * ops are associative AND commutative, so partial folds merge exactly
  * under any partition order — the same two-phase shape as
  * [[BitmapMergeAggregate]] (which is the OR fold's state form). Null
  * inputs are skipped; an empty group evaluates to the empty bitmap
  * (cardinality 0), matching CH.
  */
case class BitmapFoldAggregate(
    child: Expression,
    op: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapFoldBuf]
  with UnaryLike[Expression] {

  require(Set("and", "or", "xor")(op), s"unknown bitmap fold op: $op")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BinaryType child (a serialized bitmap state), got ${t.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): BitmapFoldBuf = new BitmapFoldBuf

  private def combine(b: BitmapFoldBuf, in: RoaringBitmap): Unit =
    if (b.bm == null) b.bm = in
    else op match {
      case "and" => b.bm.and(in)
      case "or"  => b.bm.or(in)
      case "xor" => b.bm.xor(in)
    }

  override def update(b: BitmapFoldBuf, row: InternalRow): BitmapFoldBuf = {
    val v = child.eval(row)
    if (v != null) combine(b, Bitmaps.fromBytes(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def merge(b: BitmapFoldBuf, o: BitmapFoldBuf): BitmapFoldBuf = {
    if (o.bm != null) combine(b, o.bm)
    b
  }
  override def eval(b: BitmapFoldBuf): Any =
    Bitmaps.toBytes(if (b.bm == null) new RoaringBitmap() else b.bm)

  override def serialize(b: BitmapFoldBuf): Array[Byte] =
    if (b.bm == null) Array[Byte](0)
    else {
      val body = Bitmaps.toBytes(b.bm)
      val out = new Array[Byte](1 + body.length)
      out(0) = 1
      System.arraycopy(body, 0, out, 1, body.length)
      out
    }
  override def deserialize(bytes: Array[Byte]): BitmapFoldBuf = {
    val b = new BitmapFoldBuf
    if (bytes.nonEmpty && bytes(0) == 1)
      b.bm = Bitmaps.fromBytes(java.util.Arrays.copyOfRange(bytes, 1, bytes.length))
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): BitmapFoldAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapFoldAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapFoldAggregate =
    copy(child = c)
  override def prettyName: String = s"groupBitmap${op.capitalize}"
}

/** `bitmap_merge_agg(bm_binary)` — ClickHouse `groupBitmapMergeState`: OR
  * together already-serialized bitmap states. Re-feeding raw ids here is a
  * type error at analysis time (BinaryType expected) — by construction the
  * misuse the reference doc warns about (doc:326-505) cannot compile.
  */
case class BitmapMergeAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends BitmapAggregateBase {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bitmap_merge_agg requires a BinaryType child (a serialized bitmap state), got ${t.simpleString}")
  }
  override def update(b: RoaringBitmap, row: InternalRow): RoaringBitmap = {
    val v = child.eval(row)
    if (v != null) b.or(Bitmaps.fromBytes(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): BitmapMergeAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapMergeAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapMergeAggregate =
    copy(child = c)
  override def prettyName: String = "bitmap_merge_agg"
}
