package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for product quantization (PQ) — the
  * billion-scale ANN storage layout (Jégou et al. 2011, the FAISS
  * IVF-PQ family): the vector is split into `m` contiguous subvectors,
  * each encoded as the index of its nearest entry in a per-subspace
  * codebook, so a dim-float vector stores as `m` bytes (here 64 floats
  * = 256 B → 8 B, 8× beyond the int8 scalar codes). Probes score
  * candidates with ASYMMETRIC DISTANCE (ADC): the query precomputes a
  * per-subspace lookup table of exact subvector→codeword distances,
  * and a candidate's approximate distance is m table lookups — no
  * decode, no float math per candidate beyond the adds.
  *
  * Both hot paths are the [[CentroidAssign]] pattern: constants
  * (codebooks) ride as codegen reference objects, `doGenCode` emits
  * one static call to a primitive loop over `ArrayData`, nothing is
  * interpreted per element. Encoding normalizes the vector first
  * (same L2 normalization as the IVF cell assignment, so one
  * normalized geometry serves coarse cells and fine codes); parity
  * with the driver-side reference loop is spec-pinned.
  */
object PqOps {

  // ---- static primitive kernels (called from generated code) ----

  /** PQ-encode a float vector: L2-normalize, split into
    * `codebooks.length` contiguous subvectors, emit each subvector's
    * nearest codeword index (strict `<` keeps the first of equal
    * distances). codebooks(s)(j) is codeword j of subspace s; subspace
    * s covers dims [s·sub, (s+1)·sub) where sub = dim/m — vectors
    * shorter than (s+1)·sub contribute only their present dims, same
    * truncation law as [[CentroidAssign]]. */
  def pqEncode(codebooks: Array[Array[Array[Double]]], v: ArrayData): ArrayData = {
    val vn = CentroidAssign.normalized(v)
    val m = codebooks.length
    val codes = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val sub = if (cb.isEmpty) 0 else cb(0).length
      val off = s * sub
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb.length) {
        val cw = cb(j)
        val n = math.min(cw.length, math.max(0, vn.length - off))
        var d = 0.0
        var i = 0
        while (i < n) { val t = vn(off + i) - cw(i); d += t * t; i += 1 }
        // Dims the vector lacks score as distance to the codeword's
        // remaining mass — keeps argmin well-defined on short vectors.
        var i2 = n
        while (i2 < cw.length) { d += cw(i2) * cw(i2); i2 += 1 }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best.toByte
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  /** ADC score: Σ_s lut[s·ksub + codes(s)] — the flattened per-query
    * lookup table carries the EXACT distance from the query's
    * subvector to every codeword, so the sum is the exact distance
    * from the query to the candidate's reconstruction. */
  def pqAdc(lut: ArrayData, codes: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var s = 0
    var d = 0.0
    while (s < m) {
      d += lut.getDouble(s * ksub + (codes.getByte(s).toInt & 0xFF))
      s += 1
    }
    d
  }

  /** Driver-side LUT for one (already normalized) query vector against
    * the codebooks, flattened as m·ksub doubles — O(m·ksub·sub) work
    * per query, computed once per probe on the bounded query set. */
  def lutFor(codebooks: Array[Array[Array[Double]]], qn: Array[Double]): Array[Double] = {
    val m = codebooks.length
    val ksub = if (m == 0) 0 else codebooks(0).length
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val sub = if (cb.isEmpty) 0 else cb(0).length
      val off = s * sub
      var j = 0
      while (j < cb.length) {
        val cw = cb(j)
        val n = math.min(cw.length, math.max(0, qn.length - off))
        var d = 0.0
        var i = 0
        while (i < n) { val t = qn(off + i) - cw(i); d += t * t; i += 1 }
        var i2 = n
        while (i2 < cw.length) { d += cw(i2) * cw(i2); i2 += 1 }
        out(s * ksub + j) = d
        j += 1
      }
      s += 1
    }
    out
  }

  case class PqEncode(
      codebooks: Array[Array[Array[Double]]], child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def prettyName: String = "pq_encode"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode needs array<float>, got ${other.simpleString}")
    }
    override def nullSafeEval(input: Any): Any =
      PqOps.pqEncode(codebooks, input.asInstanceOf[ArrayData])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cb = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.PqOps.pqEncode($cb, $c);")
    }
    override protected def withNewChildInternal(
        newChild: Expression): PqEncode = copy(child = newChild)
  }

  /** left = flattened LUT (array<double>, from the broadcast query
    * side), right = PQ codes (array<tinyint>, from the corpus side). */
  case class PqAdcScore(ksub: Int, left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_adc"
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(ByteType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"pq_adc needs (array<double> lut, array<tinyint> codes), " +
            s"got ${l.simpleString} / ${r.simpleString}")
      }
    override def nullSafeEval(lut: Any, codes: Any): Any =
      PqOps.pqAdc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], ksub)
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (lut, codes) =>
        s"${ev.value} = graft.functions.PqOps.pqAdc($lut, $codes, $ksub);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqAdcScore =
      copy(left = newLeft, right = newRight)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def pqEncodeCol(codebooks: Array[Array[Array[Double]]], v: Column): Column =
    ColumnBridge.column(PqEncode(codebooks, ColumnBridge.expression(v)))

  def pqAdcCol(ksub: Int, lut: Column, codes: Column): Column =
    ColumnBridge.column(PqAdcScore(ksub,
      ColumnBridge.expression(lut), ColumnBridge.expression(codes)))
}
