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
}
