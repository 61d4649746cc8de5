package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-vector symmetric int8 scalar quantization as ONE native
  * expression: `struct(ma: double, codes: array<tinyint>)` from a
  * single primitive pass over the embedding, replacing the four-HOF
  * chain (cast-transform, abs-transform, array_max, round-transform)
  * that previously ran INTERPRETED on every index build
  * (`Similarity.quantizeInt8` — the round-8 CentroidAssign lesson,
  * applied to the quantize pass).
  *
  * Arithmetic parity is the contract: the kernel replays the HOF
  * chain op-for-op so existing oracles and spec pins hold unchanged —
  * float→double cast per element; `ma` as a sequential max fold over
  * |ed| with Spark's NaN-is-greatest array_max ordering; codes as
  * `round((ed_i * 127.0) / ma)` with Spark's own Round semantics
  * (decimal-string BigDecimal, HALF_UP — which also means the
  * BigDecimal cost per element is the same as the built-in `round`,
  * not a regression); `ma == 0` → all-zero codes; empty array →
  * (null, empty) exactly as `array_max`'s null propagates. A NaN
  * element fails loudly like the ANSI tinyint cast in the HOF form
  * did — never a silent zero code. */
object Int8Quantize {

  val OutType: StructType = StructType(Seq(
    StructField("ma", DoubleType, nullable = true),
    StructField("codes", ArrayType(ByteType, containsNull = false),
      nullable = false)))

  /** Static kernel (called from generated code): one pass for `ma`,
    * one for the codes. */
  def quantize(arr: ArrayData, isFloat: Boolean): InternalRow = {
    val n = arr.numElements()
    if (n == 0)
      return new GenericInternalRow(
        Array[Any](null, new GenericArrayData(Array.empty[Byte])))
    def ed(i: Int): Double =
      if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
    var ma = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(ed(i))
      // Spark's array_max ordering: NaN compares greatest.
      if (java.lang.Double.isNaN(a) || a > ma) ma = a
      i += 1
    }
    if (java.lang.Double.isNaN(ma))
      throw new ArithmeticException(
        "int8_quantize: NaN element in embedding (the ANSI tinyint " +
          "cast would fail here; refusing to emit silent zero codes)")
    val codes = new Array[Byte](n)
    if (ma != 0.0) {
      i = 0
      while (i < n) {
        // Spark Round(DoubleType) semantics: decimal-string BigDecimal,
        // scale 0, HALF_UP. |ed_i| <= ma bounds the result to ±127.
        codes(i) = java.math.BigDecimal.valueOf((ed(i) * 127.0) / ma)
          .setScale(0, java.math.RoundingMode.HALF_UP).byteValue()
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](ma, new GenericArrayData(codes)))
  }

  case class Int8QuantizeExpr(child: Expression) extends UnaryExpression {
    private def isFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def dataType: DataType = OutType
    override def prettyName: String = "int8_quantize"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<float|double>, got ${other.simpleString}")
      }
    override def nullSafeEval(input: Any): Any =
      Int8Quantize.quantize(input.asInstanceOf[ArrayData], isFloat)
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val f = isFloat
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Int8Quantize.quantize($c, $f);")
    }
    override protected def withNewChildInternal(
        newChild: Expression): Int8QuantizeExpr = copy(child = newChild)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def int8Col(emb: Column): Column =
    ColumnBridge.column(Int8QuantizeExpr(ColumnBridge.expression(emb)))
}
