package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import graft.operators.Relational
import graft.plans.{TopKPerKey, TopKPerKeyExec}

class TopKPerKeySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case o => o.children
    }
    p +: kids.flatMap(flatten)
  }

  test("custom top-k operator matches the window form exactly") {
    val li = Relational.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val custom = TopKPerKey(li, Seq("l_returnflag", "l_linestatus"),
        Seq(("l_extendedprice", true), ("l_orderkey", false),
          ("l_linenumber", false)), k = 3)
      .as[(String, String, Long, Long, Double)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_returnflag", "l_linestatus")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
    val viaWindow = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(custom == viaWindow)
    assert(custom.nonEmpty)
  }

  test("plans through TopKPerKeyExec with no window or per-key sort") {
    val li = Relational.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"),
        col("l_extendedprice"))
    val df = TopKPerKey(li, Seq("l_returnflag"),
      Seq(("l_extendedprice", true), ("l_orderkey", false)), k = 5)
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[TopKPerKeyExec]),
      s"custom exec missing:\n${df.queryExecution.executedPlan}")
    assert(!nodes.exists(_.nodeName.contains("Window")),
      "window operator should be absent")
    assert(!nodes.exists(_.nodeName == "Sort"),
      "no sort needed: the heap bounds work at O(n log k)")
    // Exactly one exchange: the ClusteredDistribution the operator
    // declares — the same single shuffle an aggregation would pay.
    val exchanges = nodes.count(_.nodeName.contains("Exchange"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges")
  }

  test("SQLMetrics: output rows and heap evictions are recorded") {
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 4.0), ("a", 3L, 3.0), ("a", 4L, 2.0),
      ("b", 5L, 9.0), ("b", 6L, 8.0))
      .toDF("key", "id", "score").repartition(3)
    val q = TopKPerKey(df, Seq("key"),
      Seq(("score", true), ("id", false)), k = 2)
    q.collect()
    val exec = flatten(q.queryExecution.executedPlan)
      .collectFirst { case t: TopKPerKeyExec => t }
      .getOrElse(fail("TopKPerKeyExec not in executed plan"))
    // a: 4 rows -> 2 kept, 2 evicted; b: 2 rows -> 2 kept, 0 evicted.
    assert(exec.metrics("numOutputRows").value == 4)
    assert(exec.metrics("numHeapEvictions").value == 2)
    // Observable like a built-in: the operator advertises both metrics
    // (these feed the SQL UI node, same as built-in exec nodes).
    assert(exec.metrics.keySet == Set("numOutputRows", "numHeapEvictions"))
    assert(exec.metrics("numHeapEvictions").name
      .contains("number of heap evictions"))
  }

  test("ties beyond k are cut deterministically by the total order") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0), ("a", 4L, 10.0),
      ("b", 9L, 1.0)).toDF("key", "id", "score")
    val got = TopKPerKey(df, Seq("key"),
        Seq(("score", true), ("id", false)), k = 2)
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("a", 1L, 10.0), ("a", 2L, 10.0), ("b", 9L, 1.0)))
  }
}
