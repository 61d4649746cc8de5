package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator Catalyst extension: GROUPED TOP-K as its own logical
  * node, planner strategy, and physical operator.
  *
  * Spark expresses "top k per key" as a window (`row_number() OVER
  * (PARTITION BY ... ORDER BY ...)` + filter), which the planner
  * executes as shuffle → FULL SORT of every partition → WindowExec →
  * filter: O(n log n) per partition and the entire input is sorted
  * just to discard all but k rows per key. `TopKPerKeyExec` instead
  * keeps a BOUNDED HEAP of k rows per key while streaming each
  * partition once — O(n log k), no sort of the losers, memory bounded
  * by k·n_keys_per_partition rather than the partition size. The
  * operator declares `ClusteredDistribution(keys)`, so
  * EnsureRequirements inserts exactly the one hash shuffle the
  * semantics need — the same contract built-in aggregates use.
  *
  * This is deliberately the (c)-tier extension point: a capability the
  * DataFrame surface cannot express as a better PLAN (the window form
  * fixes the sort), implemented as first-class Catalyst pieces rather
  * than an opaque mapPartitions, so EXPLAIN shows it, the analyzer
  * resolves its expressions, and the planner places its exchange. */
case class TopKPerKeyPlan(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k requires k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerKeyPlan = copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {
  import org.apache.spark.sql.execution.metric.SQLMetrics

  // SQLMetrics make the custom operator observable like a built-in:
  // they render in EXPLAIN/the SQL UI, and heap evictions quantify the
  // work the bounded heap saved versus a full per-partition sort
  // (every eviction is a row the window form would have sorted and
  // then discarded).
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numHeapEvictions" -> SQLMetrics.createMetric(sparkContext,
      "number of heap evictions"))

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  // Row-pruning preserves the child's clustering: advertise it, so a
  // downstream groupBy/join on the same keys reuses this shuffle
  // instead of paying a second one (the contract built-in aggregates
  // follow).
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning
  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerKeyExec = copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val outputRows = longMetric("numOutputRows")
    val evictions = longMetric("numHeapEvictions")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // rowOrd ranks rows: the FIRST row in this order is rank 1.
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      // Per key: a j.u.PriorityQueue with the WORST retained row at the
      // head (reverse order), so exceeding k evicts in O(log k).
      val worstFirst = rowOrd.reverse
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        heap.add(row.copy())
        if (heap.size > limit) { heap.poll(); evictions += 1 }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.asScala.iterator.flatMap(_.iterator.asScala)
        .map { r => outputRows += 1; r }
    }
  }
}

object TopKPerKey {

  /** Grouped top-k over a DataFrame through the custom operator.
    * Columns are named (not `Column`s): in Spark 4's classic API a
    * `Column` carries a lazy ColumnNode that only the built-in Dataset
    * operators convert, so a custom logical node must hand the analyzer
    * genuine `UnresolvedAttribute`s for ResolveReferences to bind
    * against the child. `orderSpecs` is (name, descending). The
    * strategy is installed add-if-absent on the session. */
  def apply(df: DataFrame, keyNames: Seq[String],
      orderSpecs: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val sortOrder = orderSpecs.map { case (name, desc) =>
      SortOrder(UnresolvedAttribute.quoted(name),
        if (desc) Descending else Ascending)
    }
    ColumnBridge.ofRows(spark, TopKPerKeyPlan(
      keyNames.map(UnresolvedAttribute.quoted), sortOrder, k,
      df.queryExecution.analyzed))
  }

  /** custom_topk_exec driver query — top-3 lineitems by extended price
    * per (returnflag, linestatus) through the custom physical operator,
    * with a total tie-break so the row set is deterministic. Oracle =
    * the row_number window form; results must be identical, proving the
    * operator replaces the window+sort plan without changing
    * semantics. */
  def topkQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val li = graft.operators.Relational.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    TopKPerKey(li,
        Seq("l_returnflag", "l_linestatus"),
        Seq(("l_extendedprice", true), ("l_orderkey", false),
          ("l_linenumber", false)),
        k = 3)
      .orderBy("l_returnflag", "l_linestatus",
        "l_extendedprice", "l_orderkey", "l_linenumber")
  }
}
