package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: probe ONE of a fixed array of Bloom
  * filters, selected per row by a bucket-id column — the sharded twin
  * of Spark's `BloomFilterMightContain`, whose sketch child must be a
  * single constant. Sharding the dedup sketch by the digest index's
  * bucket id is what keeps the short-circuit viable past the point a
  * single driver bloom saturates: each shard covers only its bucket's
  * digests, capacity scales with bucket count, and a row is only ever
  * tested against the shard that could contain it.
  *
  * The serialized sketches travel in the expression (closure-sized,
  * like the constant bloom Literal they replace) and deserialize once
  * per executor via the transient lazy val; codegen references the
  * deserialized array directly, so the per-row work is an array index
  * plus `mightContainLong` — no UDF, no per-row deserialization, and
  * the branch count does not grow with the number of buckets (unlike a
  * CASE WHEN chain of single-bloom probes, whose generated code would
  * scale O(nBuckets)).
  *
  * PRECONDITION: `bucket` is in [0, blooms.length) — the caller
  * computes it with the same pmod(hash) law that assigned the index's
  * buckets. Out-of-range ids fail loudly (AIOOBE), never probe the
  * wrong shard.
  */
case class BucketedBloomMightContain(
    bloomsBytes: Array[Array[Byte]],
    left: Expression,
    right: Expression)
    extends BinaryExpression {

  /** bucket selector */
  def bucket: Expression = left

  /** long key to probe (xxhash64 of the digest) */
  def value: Expression = right

  @transient private lazy val blooms: Array[BloomFilter] =
    bloomsBytes.map(BloomFilter.readFrom)

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bucketed_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bucketed_bloom_might_contain needs (int bucket, long key), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def nullSafeEval(bkt: Any, v: Any): Any =
    blooms(bkt.asInstanceOf[Int]).mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // NB: Java SOURCE syntax, not Class.getName (whose array form
    // "[L...;" is not compilable and would silently drop the whole
    // projection to the interpreted fallback).
    val ref = ctx.addReferenceObj("blooms", blooms,
      "org.apache.spark.util.sketch.BloomFilter[]")
    nullSafeCodeGen(ctx, ev, (bkt, v) =>
      s"${ev.value} = $ref[$bkt].mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketedBloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BucketedBloomMightContain {
  /** The expression as a Column over (bucket, key) columns. */
  def apply(blooms: Array[BloomFilter], bucket: Column, key: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val bytes = blooms.map { b =>
      val bos = new java.io.ByteArrayOutputStream()
      b.writeTo(bos)
      bos.toByteArray
    }
    ColumnBridge.column(BucketedBloomMightContain(bytes,
      ColumnBridge.expression(bucket), ColumnBridge.expression(key)))
  }

  /** Deserialize helper shared with the aggregate-built shards. */
  def read(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}
