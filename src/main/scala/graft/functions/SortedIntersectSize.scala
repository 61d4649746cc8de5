package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: |A ∩ B| for two SORTED, DISTINCT string
  * arrays, as a single merge scan — O(|A|+|B|) comparisons, zero
  * per-row allocation. The built-in `size(array_intersect(a, b))`
  * builds a hash set per row, which dominates exact-Jaccard
  * verification once candidate sets grow (measured 12s → ~2s on the
  * 310k-pair prefix-join verify at sf0.1).
  *
  * PRECONDITION: both inputs ascending-sorted (UTF8 binary order, i.e.
  * Spark's `array_sort`) with no duplicates and no null elements —
  * exactly what `Dedup.shingleArrays` produces. On unsorted input the
  * result is undefined (a subset count), so this is deliberately not a
  * general replacement for array_intersect.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size needs two array<string> args, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n1, n2) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var c = 0
    // Null elements are admitted by the type check (containsNull
    // schemas are common even when no null is ever present); treat
    // them defensively as no-match and skip, instead of NPE-ing.
    while (i < n1 && j < n2) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val cmp = ctx.freshName("cmp")
      s"""
        int $n1 = $a.numElements(); int $n2 = $b.numElements();
        int $i = 0; int $j = 0; int $c = 0;
        while ($i < $n1 && $j < $n2) {
          if ($a.isNullAt($i)) { $i++; }
          else if ($b.isNullAt($j)) { $j++; }
          else {
            int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
            if ($cmp == 0) { $c++; $i++; $j++; }
            else if ($cmp < 0) { $i++; } else { $j++; }
          }
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** The expression as a Column. */
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
