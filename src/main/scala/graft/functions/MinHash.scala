package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature aggregate over exploded shingles.
  *
  * `minhash_agg(shingle, k)` consumes one shingle string per input row
  * (grouped by document) and produces the k-element signature
  * sig[j] = min over shingles of h_j(shingle).
  *
  * h_j uses the standard double-hashing construction h_j = h1 + j·h2
  * (two real xxh64 evaluations per shingle, k cheap combines) — the
  * difference between ~30 s and sub-second on a 5k-doc corpus versus
  * evaluating k seeded hashes in interpreted higher-order-function lambdas,
  * and the construction that keeps a 100 TB MinHash sweep CPU-light.
  * The update loop is tight JVM code on a primitive long[] buffer;
  * serialization happens only at the shuffle boundary.
  */
object MinHash {
  def register(spark: SparkSession): Unit = Registration.once(spark, "MinHash") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_agg",
      exprs => MinHashAggregate(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue()),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sig_match_count", exprs => SigMatchCount(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_buckets", exprs => LshBucketsExpr(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue(),
        exprs(2).eval(null).asInstanceOf[Number].intValue()), "built-in")
  }

  /** Signature column: group rows by doc first, one shingle per row. */
  def minhash_agg(shingle: Column, k: Int): Column =
    call_function("minhash_agg", shingle, org.apache.spark.sql.functions.lit(k))

  /** Matching-position count between two signatures (primitive loop). */
  def sig_match_count(a: Column, b: Column): Column =
    call_function("sig_match_count", a, b)

  /** Banded LSH bucket keys for a signature (primitive loop). */
  def lsh_buckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    call_function("lsh_buckets", sig,
      org.apache.spark.sql.functions.lit(bands),
      org.apache.spark.sql.functions.lit(rowsPerBand))
}

/** Banded bucket keys — for band b, the xxhash64 of (b, the band's
  * signature slice joined by commas), exactly what the composed
  * `xxhash64(b, concat_ws(",", slice(sig, ...)))` HOF computed (chained
  * seed-42 hash of an int then the joined string), in one loop per row
  * instead of a per-band interpreted slice + lambda dispatch.
  */
case class LshBucketsExpr(child: Expression, bands: Int, rowsPerBand: Int)
  extends Expression with UnaryLike[Expression]
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(bands >= 1 && rowsPerBand >= 1, s"bad bands/rowsPerBand: $bands/$rowsPerBand")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bucket", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder(rowsPerBand * 20)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      val start = b * rowsPerBand
      val end = math.min(start + rowsPerBand, n)
      var i = start
      while (i < end) {
        if (i > start) sb.append(',')
        sb.append(a.getLong(i))
        i += 1
      }
      val h1 = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(b, IntegerType, 42L)
      val h2 = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(UTF8String.fromString(sb.toString), StringType, h1)
      out(b) = org.apache.spark.sql.catalyst.InternalRow(b, h2)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): LshBucketsExpr =
    copy(child = c)
  override def prettyName: String = "lsh_buckets"
}

/** Count of positions where two bigint signatures agree — the MinHash
  * Jaccard-estimate numerator, evaluated once per CANDIDATE PAIR in every
  * LSH verify, so the interpreted zip_with+aggregate form it replaces was
  * per-pair lambda dispatch on the hottest dedup loop.
  */
case class SigMatchCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sig_match_count requires two array<bigint>, got ${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var cnt = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigMatchCount =
    copy(left = l, right = r)
  override def prettyName: String = "sig_match_count"
}

case class MinHashAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_agg requires a string shingle column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val h1 = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, 42L)
      val h2 = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, 7919L)
      var j = 0
      while (j < k) {
        val hj = h1 + j * h2
        if (hj < buf(j)) buf(j) = hj
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): MinHashAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MinHashAggregate =
    copy(child = c)
  override def prettyName: String = "minhash_agg"
}
