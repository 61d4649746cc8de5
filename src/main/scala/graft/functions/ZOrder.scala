package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 2-D Morton (Z-order) interleave as a native codegen'd expression —
  * the clustering key behind multi-dimensional data layout: sorting
  * files by the interleaved bits of two scaled dimensions gives every
  * file a bounded min/max range in BOTH dimensions, so a predicate on
  * either (or both) prunes files, where a linear sort serves only its
  * leading column. This is the standard lakehouse Z-ORDER layout
  * technique, applied at write time by
  * [[graft.operators.SourceSinkQueries.sinkZorderLayout]].
  *
  * The kernel is the textbook bit-spread: each 16-bit input fans out
  * to alternating bit positions via the classic magic-mask doubling
  * sequence, x taking even bits and y odd — a handful of shifts and
  * masks per row, inside whole-stage codegen. Inputs are expected
  * pre-scaled to [0, 65535]; out-of-range bits are masked, never
  * thrown, because the z-value is a LAYOUT key, not data.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to even bit positions (0,2,4,…30). */
  def spread16(v: Int): Long = {
    var x = v.toLong & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Morton code of (x, y): x on even bits, y on odd. */
  def morton(x: Int, y: Int): Long =
    spread16(x) | (spread16(y) << 1)

  case class ZOrderValue(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "zorder_value"
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs (int, int), got " +
            s"(${l.simpleString}, ${r.simpleString})")
      }
    override def nullSafeEval(x: Any, y: Any): Any =
      ZOrder.morton(x.asInstanceOf[Int], y.asInstanceOf[Int])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) =>
        s"${ev.value} = graft.functions.ZOrder.morton($x, $y);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): ZOrderValue =
      copy(left = newLeft, right = newRight)
  }

  def zorderCol(x: Column, y: Column): Column =
    ColumnBridge.column(ZOrderValue(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
