package graft.functions

import java.util.zip.Deflater
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string column as a native
  * codegen'd expression — the classic compression-ratio quality signal
  * for corpus curation (low ratio ⇒ repetitive/templated text, ratio
  * near 1 ⇒ high-entropy noise; used as a filter dimension by the
  * Gopher and CCNet curation pipelines). The reference has no such
  * signal; this extends its quality-scoring surface
  * (`transformations.py`-style row scoring) with the standard one.
  *
  * Determinism: a FIXED level (6) and strategy (default) make the
  * output a pure function of the input bytes for a given zlib build —
  * stable across runs, partitionings, and executors of one cluster,
  * which is what the engine's witnesses compare. Cross-library parity
  * is NOT claimed (an external engine cannot replay the exact byte
  * count), so queries expose ratio-derived BOOLEANS and oracle-
  * computable counts, never the raw compressed length.
  *
  * Per-row cost is O(len) CPU with zero shuffle — the signal
  * parallelizes embarrassingly at any corpus size. The `Deflater` is
  * native-backed and expensive to create, so one per thread is cached
  * in a ThreadLocal and `reset()` between rows (the same per-worker
  * codec-reuse pattern as the multimodal mapPartitions paths, without
  * leaving whole-stage codegen).
  */
object DeflateRatio {

  // A Deflater holds NATIVE zlib buffers that only end() releases; a
  // plain ThreadLocal[Deflater] would pin them for the JVM's lifetime on
  // every thread that ever evaluated the expression. The holder object is
  // what the ThreadLocal map references, so when its thread dies the
  // holder becomes unreachable and the Cleaner end()s the Deflater — the
  // lambda captures only `d`, never the holder, or it would never run.
  private val cleaner = java.lang.ref.Cleaner.create()

  private final class Holder {
    val d = new Deflater(6, /* nowrap = */ true)
  }

  private val deflaters = new ThreadLocal[Holder] {
    override def initialValue(): Holder = {
      val h = new Holder
      val d = h.d
      cleaner.register(h, () => d.end())
      h
    }
  }

  /** Static kernel (called from generated code): compressed byte count
    * of the UTF-8 bytes under DEFLATE level 6, raw stream (no zlib
    * header — the count is pure payload). */
  def deflateLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = deflaters.get().d
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  case class DeflateLen(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "deflate_len"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs string, got ${other.simpleString}")
      }
    override def nullSafeEval(input: Any): Any =
      DeflateRatio.deflateLen(input.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.DeflateRatio.deflateLen($c);")
    override protected def withNewChildInternal(
        newChild: Expression): DeflateLen = copy(child = newChild)
  }

  def deflateLenCol(c: Column): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(c)))

  /** Driver-side twin of the kernel for bounded literal checks. */
  def deflateLenOf(s: String): Int =
    deflateLen(UTF8String.fromString(s))
}
