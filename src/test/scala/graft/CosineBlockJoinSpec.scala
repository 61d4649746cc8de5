package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity
import graft.operators.{Dedup, Relational}
import graft.plans.CosineBlockJoin

class CosineBlockJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def naiveJoin() = {
    val e = Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    e.as("a").join(e.as("b"),
        col("a.vec_id") < col("b.vec_id") &&
          CosineSimilarity.asColumn(
            col("a.embedding"), col("b.embedding")) >= 0.46)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
  }

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ CosineBlockJoin(spark)
    try body
    finally spark.experimental.extraOptimizations = prev
  }

  test("naive quadratic cosine self-join plans as cartesian without the rule") {
    val plan = naiveJoin().queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"expected the naive plan to be quadratic:\n$plan")
  }

  test("rule rewrites it to a block equi-join with identical results") {
    val expected = naiveJoin().as[(Long, Long)].collect().toSet
    val (got, plan) = withRule {
      val df = naiveJoin()
      (df.as[(Long, Long)].collect().toSet,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"rule did not fire:\n$plan")
    assert(got == expected)
    assert(got.nonEmpty)
    // And it agrees with the hand-built block-join dedup operator.
    val handBuilt = Dedup.embeddingCosinePairs(spark, sfDir, 0.46)
      .as[(Long, Long)].collect().toSet
    assert(got == handBuilt)
  }

  test("rule leaves non-matching joins untouched") {
    val e = Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val q = e.as("a").join(e.as("b"), col("a.vec_id") === col("b.vec_id"))
      .select(col("a.vec_id"))
    val without = q.queryExecution.optimizedPlan.toString
    val within = withRule { naiveJoin().count() // rule active in session
      q.queryExecution.optimizedPlan.toString }
    assert(within == without)
  }
}
