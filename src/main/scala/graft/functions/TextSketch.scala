package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the per-document text sketches —
  * MinHash signatures and 64-bit SimHash — replacing the ScalaUDFs
  * that previously computed them on every corpus scan. The arithmetic
  * is IDENTICAL to the UDF loops (spec-pinned): what changes is the
  * evaluation path. A ScalaUDF pays the catalyst→Scala converter per
  * row — for an `array<string>` argument that means materializing a
  * whole `Seq[String]` (wrapper allocation + per-element decode
  * through the generic converter) before the closure even runs. These
  * expressions read the `ArrayData` directly and `doGenCode` emits one
  * static call, so the only per-element cost left is the UTF8→String
  * decode the string hash itself requires. Same toolbox as
  * [[CentroidAssign]]/[[CosineSimilarity]]; sketch model constants
  * (the permutation coefficients) ride as codegen reference objects.
  *
  * The signature family (a·h + b mod p, p = 2³¹−1) and the two-pass
  * murmur string hash are public constructions (Broder 1997 resp. the
  * Scala stdlib murmur3); values are seed-fixed and deterministic but
  * never oracle-compared — candidates they generate are always
  * re-verified by exact Jaccard.
  */
object TextSketch {

  /** The 31-bit Mersenne prime — a·h stays under 2⁶², no Long overflow. */
  val MersennePrime: Long = (1L << 31) - 1

  /** 64-bit string hash from two 32-bit murmur passes (same constants
    * as the original UDFs — bit parity with pre-rewrite sketches). */
  def hash64(s: String): Long = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0x85ebca6b)
    (h1.toLong << 32) | (h2.toLong & 0xFFFFFFFFL)
  }

  // ---- static primitive kernels (called from generated code) ----

  /** k-permutation MinHash signature of a string array: one pass over
    * the shingles, k running minima of (a_i·h + b_i) mod p. */
  def minHashSig(pA: Array[Long], pB: Array[Long], arr: ArrayData): ArrayData = {
    val k = pA.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, MersennePrime)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = java.lang.Math.floorMod(
        hash64(arr.getUTF8String(j).toString), MersennePrime)
      var i = 0
      while (i < k) {
        val v = (pA(i) * h + pB(i)) % MersennePrime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** 64-bit SimHash of a string array: bit i is the sign of
    * Σ_elements (±1 by bit i of hash64(element)). */
  def simHash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = hash64(arr.getUTF8String(j).toString)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  private def requireStringArray(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name needs array<string>, got ${other.simpleString}")
    }

  case class MinHashSignature(
      permA: Array[Long], permB: Array[Long], child: Expression)
      extends UnaryExpression {
    require(permA.length == permB.length,
      s"coefficient arrays differ: ${permA.length} vs ${permB.length}")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child, prettyName)
    override def nullSafeEval(input: Any): Any =
      TextSketch.minHashSig(permA, permB, input.asInstanceOf[ArrayData])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val a = ctx.addReferenceObj("permA", permA, "long[]")
      val b = ctx.addReferenceObj("permB", permB, "long[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextSketch.minHashSig($a, $b, $c);")
    }
    override protected def withNewChildInternal(
        newChild: Expression): MinHashSignature = copy(child = newChild)
  }

  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child, prettyName)
    override def nullSafeEval(input: Any): Any =
      TextSketch.simHash64(input.asInstanceOf[ArrayData])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextSketch.simHash64($c);")
    override protected def withNewChildInternal(
        newChild: Expression): SimHash64 = copy(child = newChild)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def minHashCol(pA: Array[Long], pB: Array[Long], arr: Column): Column =
    ColumnBridge.column(MinHashSignature(pA, pB, ColumnBridge.expression(arr)))

  def simHashCol(arr: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(arr)))
}
