package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst aggregate: Misra-Gries heavy-hitters candidates over
  * a string column with at most `k` counters — the mergeable-summaries
  * form (Agarwal et al. 2012): partials combine by summing counters
  * and then subtracting the k-th largest combined count, which
  * preserves the MG guarantee under ANY merge tree. The guarantee:
  * every item with true frequency > n/k is in the candidate set (its
  * counter is within n/k of the true count); items below can appear
  * but never silently vanish from above. O(k) state per partition →
  * partial aggregation before the shuffle, constant memory at any
  * corpus size — the frequent-tokens / hot-keys primitive a 100 TB
  * vocabulary or skew scan needs when an exact groupBy's key set no
  * longer fits anywhere.
  *
  * eval emits the candidate KEYS sorted lexicographically (counter
  * values are sketch-internal and merge-order-dependent; the keys of
  * everything above threshold are not). Callers recount candidates
  * EXACTLY in a bounded second pass (|candidates| ≤ k) and filter by
  * the exact threshold, making the final result a pure function of the
  * data — deterministic, engine-replayable — while the sketch only
  * ever decides how much work that second pass does.
  */
case class HeavyHittersSketch(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 1, s"k must be > 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters needs a string argument, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** Classic MG step: increment if tracked; open a counter if a slot is
    * free; otherwise decrement every counter (dropping zeros) — the
    * step that charges one occurrence of each tracked item against the
    * untracked occurrence. */
  private def add(buf: mutable.HashMap[String, Long], s: String): Unit =
    buf.get(s) match {
      case Some(c) => buf(s) = c + 1
      case None if buf.size < k - 1 => buf(s) = 1L
      case None =>
        // Snapshot before mutating: HashMap iterators are undefined
        // under concurrent modification; the buffer is O(k) so the
        // copy is free.
        buf.toList.foreach { case (key, c) =>
          if (c == 1L) buf.remove(key) else buf(key) = c - 1
        }
    }

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  /** Mergeable-summaries combine: sum counters, and if more than k-1
    * survive, subtract the k-th largest combined count from every
    * counter and drop the non-positive — equivalent to a batch of MG
    * decrement steps, so the n/k error bound adds across merges
    * instead of compounding. */
  override def merge(
      b1: mutable.HashMap[String, Long], b2: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    b2.foreach { case (key, c) => b1(key) = b1.getOrElse(key, 0L) + c }
    if (b1.size > k - 1) {
      val kth = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
      // Snapshot before mutating (same rationale as add()).
      b1.toList.foreach { case (key, c) =>
        if (c - kth <= 0L) b1.remove(key) else b1(key) = c - kth
      }
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keys.toSeq.sorted.map(UTF8String.fromString))

  // Length-prefixed UTF-8, not writeUTF: tracked keys are arbitrary
  // corpus tokens, and writeUTF throws past 64 KiB — a single giant
  // "token" (minified blob, base64 run) must not kill the shuffle.
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val b = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, java.nio.charset.StandardCharsets.UTF_8)) =
        in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersSketch =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "heavy_hitters"
}

object HeavyHittersSketch {

  /** `heavy_hitters(col, k)` as a Column aggregate — candidate keys. */
  def asColumn(c: Column, k: Int): Column =
    ColumnBridge.column(
      HeavyHittersSketch(ColumnBridge.expression(c), k).toAggregateExpression())

  /** sketch_heavy_hitters driver query — tokens occurring in MORE than
    * 1/k of all token positions across the corpus: MG(k) over one
    * token scan proposes ≤ k candidate tokens (the same pass also
    * computes n — one job, one traversal); a bounded second pass
    * recounts ONLY the candidates exactly (broadcast isin — |cands| ≤
    * k rows drive it) and the STRICT integer comparison count·k > n
    * keeps the true heavy hitters. Strictness matters: the MG
    * guarantee covers items with count > n/k — an item at exactly n/k
    * may legitimately be evicted — so a ≥ filter could emit a set the
    * sketch is not guaranteed to have proposed. With >, the candidate
    * set provably contains every qualifying token and the output
    * equals the full exact groupBy's answer — which IS the oracle: a
    * missed heavy hitter would surface as a missing row against the
    * DuckDB replay. At 100 TB the second pass touches ≤ k keys while
    * the exact groupBy this replaces would shuffle the whole key
    * set. */
  def heavyHittersQuery(
      spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val toks = graft.operators.Relational.table(spark, dir, "documents")
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("token"))
    val cached = toks.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val head = cached
        .agg(count(lit(1)).as("n"), asColumn(col("token"), k).as("cands"))
        .head()
      val n = head.getLong(0)
      val cands = head.getSeq[String](1)
      cached
        .filter(col("token").isin(cands: _*))
        .groupBy("token")
        .agg(count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") * k > n)
        .orderBy("token")
        .localCheckpoint(true)
    } finally cached.unpersist(false)
  }
}
