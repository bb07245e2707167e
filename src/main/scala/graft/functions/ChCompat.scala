package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._

/** ClickHouse-dialect function names registered as Spark SQL functions, so
  * the reference's queries run near-verbatim through `spark.sql(...)` —
  * the "a user of the reference could switch" surface.
  *
  * Each name maps onto the Spark expression with matching semantics
  * (SURVEY.md §2.7's function-by-function table):
  *
  * {{{
  *   toDate(second)            -> cast to date            (ods.action_001_dis.sql:3)
  *   toStartOfHour(second)     -> date_trunc('HOUR', ·)   (:4)
  *   toUInt32(x) / toUInt64(x) -> floor + cast long       (truncating, dwm:50,114)
  *   uniqCombined(x)           -> approx_count_distinct   (doc:304-316)
  *   uniqExact(x)              -> count(distinct)         (doc:305)
  *   groupBitmap(x)            -> bitmap cardinality of bitmap_agg (dwm:134-139)
  *   bitmapCardinality / bitmapAnd / bitmapOr /
  *   bitmapAndCardinality / bitmapOrCardinality           (doc:1207-1238)
  *   medianExact(x)            -> percentile(x, 0.5)      (dwm:83)
  * }}}
  *
  * groupBitmapState/Merge are exposed under their Spark names
  * (`bitmap_agg` / `bitmap_merge_agg`, see [[Bitmaps]]); `dictGet` is a
  * join/broadcast concern, not a registry function (see [[DictGet]]).
  */
object ChCompat {

  def register(spark: SparkSession): Unit = {
    Bitmaps.register(spark)
    MinHash.register(spark)
    VectorOps.register(spark)
    val reg = spark.sessionState.functionRegistry
    def f(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")

    f("toDate") { es => Cast(es.head, DateType) }
    f("toStartOfHour") { es => TruncTimestamp(Literal("HOUR"), es.head) }
    f("toStartOfDay") { es => TruncTimestamp(Literal("DAY"), es.head) }
    // CH toUInt32/64 on fractional input truncates toward zero, as Cast does
    f("toUInt32") { es => Cast(es.head, LongType) }
    f("toUInt64") { es => Cast(es.head, LongType) }
    f("toString") { es => Cast(es.head, StringType) }
    f("uniqCombined") { es => new HyperLogLogPlusPlus(es.head) }
    f("uniqExact") { es => Size(CollectSet(es.head).toAggregateExpression()) }
    f("medianExact") { es => new Percentile(es.head, Literal(0.5)) }
    f("groupBitmap") { es =>
      // cardinality of the aggregated bitmap — scalar-on-aggregate needs the
      // aggregate wrapped explicitly when composed inside another expression
      BitmapCardinalityExpr(BitmapAggregate(es.head).toAggregateExpression())
    }
    f("bitmapCardinality") { es => BitmapCardinalityExpr(es.head) }
    f("bitmapAnd") { es => BitmapBinaryExpr(es(0), es(1), "and") }
    f("bitmapOr") { es => BitmapBinaryExpr(es(0), es(1), "or") }
    f("bitmapAndCardinality") { es => BitmapBinaryExpr(es(0), es(1), "and_card") }
    f("bitmapOrCardinality") { es => BitmapBinaryExpr(es(0), es(1), "or_card") }
    // parseDateTimeBestEffortOrZero (ref data_rebalance.py:137,149): parse
    // failure yields epoch zero rather than NULL
    f("parseDateTimeBestEffortOrZero") { es =>
      Coalesce(Seq(
        Cast(Cast(es.head, StringType), TimestampType, None, EvalMode.TRY),
        Cast(Literal(0L), TimestampType)))
    }
  }
}

/** bitmapCardinality as a Catalyst expression (scalar over binary state). */
case class BitmapCardinalityExpr(child: Expression)
  extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(Bitmaps.fromBytes(v.asInstanceOf[Array[Byte]]).getLongCardinality)
  override protected def withNewChildInternal(c: Expression): BitmapCardinalityExpr = copy(child = c)
  override def prettyName: String = "bitmapCardinality"
}

/** bitmapAnd / bitmapOr / *Cardinality as Catalyst expressions. */
case class BitmapBinaryExpr(left: Expression, right: Expression, op: String)
  extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = op match {
    case "and" | "or" => BinaryType
    case _ => LongType
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = Bitmaps.fromBytes(l.asInstanceOf[Array[Byte]])
    val b = Bitmaps.fromBytes(r.asInstanceOf[Array[Byte]])
    op match {
      case "and" => Bitmaps.toBytes(org.roaringbitmap.RoaringBitmap.and(a, b))
      case "or" => Bitmaps.toBytes(org.roaringbitmap.RoaringBitmap.or(a, b))
      case "and_card" => java.lang.Long.valueOf(
        org.roaringbitmap.RoaringBitmap.andCardinality(a, b).toLong)
      case "or_card" => java.lang.Long.valueOf(
        org.roaringbitmap.RoaringBitmap.orCardinality(a, b).toLong)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapBinaryExpr =
    copy(left = l, right = r)
  override def prettyName: String = s"bitmap_$op"
}
