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
  * (codebooks + coarse centroids) ride as codegen reference objects,
  * `doGenCode` emits one static call to a primitive loop over
  * `ArrayData`, nothing is interpreted per element. Encoding is
  * RESIDUAL (classic IVFPQ): the vector is L2-normalized, its coarse
  * cell's centroid subtracted — the same normalize + argmin kernels as
  * the cell assignment itself, so code and partition column can never
  * disagree — and the residual is what the codebooks quantize.
  * Residuals concentrate near zero, so the same 8 bytes carry more
  * precision than raw-vector codes and ADC ranks candidates better;
  * the price is a per-(query, probed-cell) LUT instead of per-query.
  * Parity with the driver-side reference loop is spec-pinned.
  */
object PqOps {

  // ---- static primitive kernels (called from generated code) ----

  /** The residual a vector PQ-encodes as — its normalized form minus
    * its coarse cell's centroid (classic IVFPQ, Jégou et al. 2011 §III:
    * residuals carry far less variance than raw vectors, so the same m
    * bytes rank candidates better). Dims past the centroid's length
    * pass through unshifted — same shared-prefix law as
    * [[CentroidAssign]]'s distance fold. */
  def residual(centroid: Array[Double], vn: Array[Double]): Array[Double] = {
    val r = new Array[Double](vn.length)
    val n = math.min(centroid.length, vn.length)
    var i = 0
    while (i < n) { r(i) = vn(i) - centroid(i); i += 1 }
    while (i < vn.length) { r(i) = vn(i); i += 1 }
    r
  }

  /** Encode an (already residual) double vector: split into
    * `codebooks.length` contiguous subvectors, emit each subvector's
    * nearest codeword index (strict `<` keeps the first of equal
    * distances). codebooks(s)(j) is codeword j of subspace s; subspace
    * s covers dims [s·sub, (s+1)·sub) where sub = dim/m — vectors
    * shorter than (s+1)·sub contribute only their present dims, same
    * truncation law as [[CentroidAssign]]. */
  def encodeResidual(
      codebooks: Array[Array[Array[Double]]], r: Array[Double]): Array[Byte] = {
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
        val n = math.min(cw.length, math.max(0, r.length - off))
        var d = 0.0
        var i = 0
        while (i < n) { val t = r(off + i) - cw(i); d += t * t; i += 1 }
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
    codes
  }

  /** PQ-encode a float vector against its coarse cell: L2-normalize,
    * subtract the nearest centroid (the SAME normalize + argmin kernels
    * as [[CentroidAssign.nearestCell]], so the cell this subtracts is
    * bit-identical to the `cell` partition column written next to the
    * codes), then encode the residual. */
  def pqEncode(
      codebooks: Array[Array[Array[Double]]],
      centroids: Array[Array[Double]], v: ArrayData): ArrayData = {
    val vn = CentroidAssign.normalized(v)
    val cell = CentroidAssign.nearestCellOfNormalized(centroids, vn)
    UnsafeArrayData.fromPrimitiveArray(
      encodeResidual(codebooks, residual(centroids(cell), vn)))
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

  /** Driver-side LUT for one query RESIDUAL (normalized query minus the
    * probed cell's centroid — residual encoding makes the LUT
    * per-(query, probed cell)) against the codebooks, flattened as
    * m·ksub doubles — O(nProbe·m·ksub·sub) work per query, computed on
    * the bounded query set only. */
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

  /** Per-subspace training statistics for one vector, in ONE kernel
    * call: normalize, subtract the coarse centroid (the same kernels as
    * [[pqEncode]], so training sees exactly the residuals encoding will
    * see), then for each subspace emit (code, squared distance to it,
    * the subvector itself). The caller explodes the m-entry array and
    * aggregates per (subspace, code) — the per-row work of a
    * distributed PQ Lloyd iteration
    * ([[graft.operators.Similarity.trainPqCodebooksDistributed]]).
    * Argmin replays [[encodeResidual]] op-for-op (strict `<` keep-first
    * tie-break, missing-dims-score-codeword-mass), so training-time
    * assignment is bit-identical to encode-time assignment. Subvectors
    * are emitted at full `sub` width, zero-padded past the vector's
    * length — the padding contributes nothing to the mean numerator
    * beyond what the distance law already charged. */
  def pqAssignStats(
      codebooks: Array[Array[Array[Double]]],
      centroids: Array[Array[Double]], v: ArrayData): ArrayData = {
    val vn = CentroidAssign.normalized(v)
    val cell = CentroidAssign.nearestCellOfNormalized(centroids, vn)
    val r = residual(centroids(cell), vn)
    val m = codebooks.length
    val out = new Array[Any](m)
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
        val n = math.min(cw.length, math.max(0, r.length - off))
        var d = 0.0
        var i = 0
        while (i < n) { val t = r(off + i) - cw(i); d += t * t; i += 1 }
        var i2 = n
        while (i2 < cw.length) { d += cw(i2) * cw(i2); i2 += 1 }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      val sv = new Array[Double](sub)
      val n = math.min(sub, math.max(0, r.length - off))
      var i = 0
      while (i < n) { sv(i) = r(off + i); i += 1 }
      out(s) = org.apache.spark.sql.catalyst.InternalRow(
        s, best, bestD, UnsafeArrayData.fromPrimitiveArray(sv))
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  val PqAssignStatsType: DataType = ArrayType(StructType(Seq(
    StructField("sub", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false),
    StructField("sv", ArrayType(DoubleType, containsNull = false),
      nullable = false))), containsNull = false)

  case class PqAssignStats(
      codebooks: Array[Array[Array[Double]]],
      centroids: Array[Array[Double]], child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = PqAssignStatsType
    override def prettyName: String = "pq_assign_stats"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_assign_stats needs array<float>, got ${other.simpleString}")
    }
    override def nullSafeEval(input: Any): Any =
      PqOps.pqAssignStats(codebooks, centroids, input.asInstanceOf[ArrayData])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cb = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      val cs = ctx.addReferenceObj("centroids", centroids, "double[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.PqOps.pqAssignStats($cb, $cs, $c);")
    }
    override protected def withNewChildInternal(
        newChild: Expression): PqAssignStats = copy(child = newChild)
  }

  case class PqEncode(
      codebooks: Array[Array[Array[Double]]],
      centroids: Array[Array[Double]], child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def prettyName: String = "pq_encode"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode needs array<float>, got ${other.simpleString}")
    }
    override def nullSafeEval(input: Any): Any =
      PqOps.pqEncode(codebooks, centroids, input.asInstanceOf[ArrayData])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cb = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      val cs = ctx.addReferenceObj("centroids", centroids, "double[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.PqOps.pqEncode($cb, $cs, $c);")
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

  def pqAssignStatsCol(codebooks: Array[Array[Array[Double]]],
      centroids: Array[Array[Double]], v: Column): Column =
    ColumnBridge.column(
      PqAssignStats(codebooks, centroids, ColumnBridge.expression(v)))

  def pqEncodeCol(codebooks: Array[Array[Array[Double]]],
      centroids: Array[Array[Double]], v: Column): Column =
    ColumnBridge.column(
      PqEncode(codebooks, centroids, ColumnBridge.expression(v)))

  def pqAdcCol(ksub: Int, lut: Column, codes: Column): Column =
    ColumnBridge.column(PqAdcScore(ksub,
      ColumnBridge.expression(lut), ColumnBridge.expression(codes)))
}
