package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst aggregate: elementwise sum of `array<double>` rows
  * into one fixed-length vector — the numerator of a distributed
  * centroid mean. `TypedImperativeAggregate` gives the property that
  * makes full-corpus k-means training scale
  * ([[graft.operators.Similarity.kmeansDistributed]]): PARTIAL
  * aggregation. Each map task folds its rows into one O(dim) buffer
  * before the shuffle, merges are O(dim), and the reducer sees one
  * buffer per upstream partition — so a Lloyd iteration over any
  * corpus size shuffles nCells × nPartitions × dim doubles, never the
  * corpus. (The built-in alternative — posexplode + groupBy(cell, pos)
  * — shuffles the same partial sums but pays a dim-way row explosion
  * on the scan; this keeps the corpus pass at one row per vector.)
  *
  * Rows shorter than `dim` contribute to their prefix (the shared-
  * prefix convention of [[CentroidAssign]]'s distance kernels); longer
  * rows fold their first `dim` elements. Null rows are skipped.
  * Ordering caveat: double addition is not associative, so the summed
  * vector is deterministic only up to partitioning — consumers compare
  * with a tolerance, never by bit equality.
  */
case class VectorSumAgg(
    child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  require(dim > 0, s"dim must be positive, got $dim")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_sum needs array<double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](dim)

  override def update(
      buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dim, arr.numElements())
      var i = 0
      while (i < n) {
        // A NULL element would read as 0.0 through getDouble — a
        // silently wrong sum. Fail loudly (the Int8Quantize NaN-guard
        // convention); whole-row nulls above are skipped as usual.
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"vector_sum: NULL element at index $i — refusing to treat " +
              "it as 0.0; filter or coalesce the array first")
        buf(i) += arr.getDouble(i)
        i += 1
      }
    }
    buf
  }

  override def merge(
      b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < dim) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * dim + 4)
    val out = new DataOutputStream(bos)
    out.writeInt(dim)
    var i = 0
    while (i < dim) { out.writeDouble(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    require(n == dim, s"vector_sum buffer dim mismatch: $n vs $dim")
    val buf = new Array[Double](dim)
    var i = 0
    while (i < n) { buf(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "vector_sum"
}

object VectorSumAgg {
  def asColumn(c: Column, dim: Int): Column =
    ColumnBridge.column(
      VectorSumAgg(ColumnBridge.expression(c), dim)
        .toAggregateExpression())
}
