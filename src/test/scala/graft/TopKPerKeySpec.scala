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
