package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: deserialize THIS ROW's serialized Bloom
  * filter and test whether ANY of a fixed (closure-sized) set of hashed
  * probe keys might be contained — the reverse shape of
  * [[BucketedBloomMightContain]] (fixed blooms, per-row key). This is
  * the in-plan evaluation of a point-lookup probe against a PERSISTED
  * per-file bloom manifest: each index row carries its own file's
  * filter, the handful of probe hashes ride in the expression, and the
  * scan emits a boolean per file. The driver never materializes the
  * manifest's blooms — a 100 TB table's ~1M-file index (~128 GB of
  * filters) streams through executors; only the candidate FILE NAMES
  * (O(probe keys + fpp sliver)) ever reach the driver.
  *
  * Per-row cost is one `BloomFilter.readFrom` over the row's bytes
  * plus k probe tests. Deserialization per row is the right trade
  * here: the relation is the MANIFEST (one row per file), so rows
  * number in the thousands per 100 TB — never the data.
  */
case class BloomMightContainAny(child: Expression, hashes: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain_any"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_any needs a binary bloom, got " +
        child.dataType.simpleString)

  override def nullSafeEval(bytes: Any): Any =
    BloomMightContainAny.anyContained(
      bytes.asInstanceOf[Array[Byte]], hashes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashes", hashes, "long[]")
    nullSafeCodeGen(ctx, ev, bytes =>
      s"${ev.value} = graft.functions.BloomMightContainAny" +
        s".anyContained($bytes, $ref);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainAny = copy(child = newChild)
}

object BloomMightContainAny {
  /** Static kernel shared by eval and generated code. */
  def anyContained(bytes: Array[Byte], hashes: Array[Long]): Boolean = {
    val bf = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    var i = 0
    while (i < hashes.length) {
      if (bf.mightContainLong(hashes(i))) return true
      i += 1
    }
    false
  }

  /** The expression as a Column over a serialized-bloom column. */
  def apply(bloomBytes: Column, hashes: Array[Long]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BloomMightContainAny(
      ColumnBridge.expression(bloomBytes), hashes))
  }
}
