package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the extension operators — the
  * structural properties that make them scale, checked so a refactor
  * can't silently regress them. (AQE finalizes plans on execution, so
  * each query is collected before asserting.) */
class PlanShapeSpec extends AnyFunSuite with SparkTestBase {

  private def executedPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sfDir)
    df.collect()
    // AQE prints "== Final Plan ==" followed by "== Initial Plan ==";
    // assertions must see the executed (final) section only, or every
    // operator counts twice.
    df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
  }

  test("pivot_table scans lineitem exactly once (no pivot-value discovery scan)") {
    val plan = executedPlan("pivot_table")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan, plan:\n$plan")
  }

  test("embedding_centroid aggregates with a map-side partial") {
    val plan = executedPlan("embedding_centroid")
    assert(plan.contains("partial_avg") || plan.contains("partial_"),
      s"no partial aggregation in:\n$plan")
  }

  test("sketch_bottomk runs as a partial+final imperative aggregate") {
    val plan = executedPlan("sketch_bottomk")
    // TypedImperativeAggregate lowers to ObjectHashAggregate (or
    // SortAggregate); partial_bottom_k proves map-side reduction to k
    // values before the shuffle.
    assert(plan.contains("partial_bottom_k"),
      s"no partial bottom_k in:\n$plan")
  }

  test("time_resample joins the bounded spine via broadcast") {
    val plan = executedPlan("time_resample")
    assert(plan.contains("BroadcastHashJoin"),
      s"spine join should broadcast:\n$plan")
  }

  test("token_length_histogram prunes the scan to the text column") {
    val df = SparkEntry.queries("token_length_histogram")(spark, sfDir)
    df.collect()
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("text") && !scanLine.contains("lang"),
      s"scan not pruned to text: $scanLine")
  }

  test("bloom prefilter probes via might_contain, not a corpus join") {
    val plan = executedPlan("dedup_bloom_prefilter")
    assert(plan.contains("might_contain"),
      s"bloom probe missing from plan:\n$plan")
  }

  test("prefix sum: the only global-order window runs over block totals") {
    // Window nodes partitioned by _blk parallelize per block; exactly
    // one unpartitioned window may exist and it must sit above the
    // block-total aggregate (one row per block), never above the
    // corpus relation — that would be the accidental serialization the
    // two-level scan exists to avoid.
    val df = SparkEntry.queries("token_budget_pack")(spark, sfDir)
    df.collect()
    // collect() does not descend into AQE's finalized stages; flatten
    // through the adaptive wrappers explicitly.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case o => o.children
      }
      p +: kids.flatMap(flatten)
    }
    val windows = flatten(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    val (global, perBlock) = windows.partition(_.partitionSpec.isEmpty)
    assert(global.size == 1, s"expected one block-offset window")
    assert(perBlock.forall(_.partitionSpec.nonEmpty))
    // The global window's input must already be aggregated: its child
    // subtree contains the block groupBy, so an aggregate node sits
    // below it.
    val belowGlobal = flatten(global.head.child).filter(
      _.nodeName.contains("Aggregate"))
    assert(belowGlobal.nonEmpty,
      "global window must consume per-block aggregates, not raw rows")
  }

  test("aqe skew join reports the runtime split in its own output") {
    // The query's demonstration thresholds are sized so the hot
    // partition qualifies at every test scale, including this suite's
    // sf0.001.
    val rows = SparkEntry.queries("skew_aqe_join")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("skew_split_applied")),
      "AQE skew split did not fire on the skewed fixture")
  }

  test("unigram logprob broadcasts the vocabulary to the scoring scan") {
    val plan = executedPlan("text_unigram_logprob")
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab join should broadcast:\n$plan")
    // The scoring side must not sort-merge-join the token relation.
    assert(!plan.contains("SortMergeJoin"),
      s"token relation must not shuffle for scoring:\n$plan")
  }
}
