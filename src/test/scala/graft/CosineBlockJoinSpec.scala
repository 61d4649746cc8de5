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

  test("single-side extra conjunct leaves the join untouched") {
    val e = Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val threeConjuncts = e.as("a").join(e.as("b"),
      col("a.vec_id") < col("b.vec_id") &&
        CosineSimilarity.asColumn(
          col("a.embedding"), col("b.embedding")) >= 0.46 &&
        col("b.vec_id") % 2 === 0)
    val (without, within) = {
      val w0 = threeConjuncts.queryExecution.optimizedPlan.toString
      val w1 = withRule {
        threeConjuncts.queryExecution.optimizedPlan.toString
      }
      (w0, w1)
    }
    // Pushdown moves the single-side predicate into one side before the
    // rule runs, so the sides are no longer `sameResult` — the rule
    // must not fire on an asymmetric self-join (and the pushed filter
    // already shrinks the quadratic anyway).
    assert(within == without)
  }

  test("two-side equality residual: rule fires, results identical") {
    def q = {
      val e = Relational.table(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"), col("label"))
      e.as("a").join(e.as("b"),
          col("a.vec_id") < col("b.vec_id") &&
            CosineSimilarity.asColumn(
              col("a.embedding"), col("b.embedding")) >= 0.2 &&
            col("a.label") === col("b.label"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
    }
    val expected = q.as[(Long, Long)].collect().toSet
    val (got, plan) = withRule {
      val df = q
      (df.as[(Long, Long)].collect().toSet,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"rule did not fire on the equality-residual join:\n$plan")
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("asymmetric residual is applied in id order, not block order") {
    // b.vec_id - a.vec_id > 200 flips meaning if evaluated on swapped
    // block roles — a rewrite that filtered before the id-order
    // projection would keep/drop the wrong pairs.
    def q = {
      val e = Relational.table(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      e.as("a").join(e.as("b"),
          col("a.vec_id") < col("b.vec_id") &&
            CosineSimilarity.asColumn(
              col("a.embedding"), col("b.embedding")) >= 0.46 &&
            col("b.vec_id") - col("a.vec_id") > 200)
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
    }
    val expected = q.as[(Long, Long)].collect().toSet
    val (got, plan) = withRule {
      val df = q
      (df.as[(Long, Long)].collect().toSet,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"rule did not fire on the inequality-residual join:\n$plan")
    assert(got == expected)
    assert(got.nonEmpty)
    // The residual genuinely bites: without it there are close pairs
    // within an id gap of 5.
    val unrestricted = withRule { naiveJoin().as[(Long, Long)].collect().toSet }
    assert(got.subsetOf(unrestricted) && got != unrestricted)
  }

  test("cross-column equality is a post-reorder residual, not a join key") {
    // a.next_id = b.vec_id relates two DIFFERENT columns: it is not
    // symmetric under the block-role swap, so folding it into the
    // pre-reorder join keys evaluates row_big.next_id = row_small.vec_id
    // for every pair the triangle scheme meets in swapped roles —
    // silently dropping matches. It must run above the id-order
    // projection instead (and the rewrite should still fire).
    def q = {
      val e = Relational.table(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .withColumn("next_id", col("vec_id") + 1)
      e.as("a").join(e.as("b"),
          col("a.vec_id") < col("b.vec_id") &&
            CosineSimilarity.asColumn(
              col("a.embedding"), col("b.embedding")) >= 0.0 &&
            col("a.next_id") === col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
    }
    val expected = q.as[(Long, Long)].collect().toSet
    val (got, plan) = withRule {
      val df = q
      (df.as[(Long, Long)].collect().toSet,
        df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"rule did not fire on the cross-column-equality join:\n$plan")
    assert(got == expected)
    assert(got.nonEmpty)
    // Every surviving pair is consecutive — the residual really ran.
    assert(got.forall { case (a, b) => b == a + 1 })
  }

  test("cross-column < or cosine conjuncts leave the join untouched") {
    // The triangle blocking keys both sides on the SAME column as the
    // matched `<` (and scores corresponding embeddings); cross-column
    // variants break that assumption, so the rule must not fire.
    val e = Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("next_id", col("vec_id") + 1)
      .withColumn("emb2", reverse(col("embedding")))
    val crossId = e.as("a").join(e.as("b"),
      col("a.vec_id") < col("b.next_id") &&
        CosineSimilarity.asColumn(
          col("a.embedding"), col("b.embedding")) >= 0.46)
    val crossEmb = e.as("a").join(e.as("b"),
      col("a.vec_id") < col("b.vec_id") &&
        CosineSimilarity.asColumn(
          col("a.embedding"), col("b.emb2")) >= 0.46)
    for (q <- Seq(crossId, crossEmb)) {
      val without = q.queryExecution.optimizedPlan.toString
      val within = withRule { q.queryExecution.optimizedPlan.toString }
      assert(within == without)
    }
  }

  test("parents above the rewritten join still resolve (exprIds kept)") {
    val expectedCount = naiveJoin().count()
    val got = withRule {
      // An aggregate ABOVE the join references the join's output
      // attributes; a rewrite that re-created them under fresh exprIds
      // would fail analysis or bind to the wrong columns.
      naiveJoin().groupBy((col("id_a") % 2).as("parity"))
        .agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
    }
    assert(got.values.sum == expectedCount)
    assert(got.nonEmpty)
  }

  test("rule is result-preserving under a grammar of extra conjuncts") {
    // The matcher has been bitten twice by conjunct shapes no fixture
    // exercised (single-side pushdown asymmetry; cross-column
    // equalities). Sweep a grammar of extras — whatever the rule
    // decides (rewrite, residual, or refuse), the results must equal
    // the no-rule plan's.
    import org.apache.spark.sql.Column
    val e = Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
      .withColumn("next_id", col("vec_id") + 1)
    def q(extra: Column) = e.as("a").join(e.as("b"),
        col("a.vec_id") < col("b.vec_id") &&
          CosineSimilarity.asColumn(
            col("a.embedding"), col("b.embedding")) >= 0.2 && extra)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
    val grammar: Seq[(String, Column)] = Seq(
      "same-column equality" -> (col("a.label") === col("b.label")),
      "cross-column equality" -> (col("a.next_id") === col("b.vec_id")),
      "asymmetric inequality" ->
        (col("b.vec_id") - col("a.vec_id") > 7),
      "two-side arithmetic" ->
        ((col("a.vec_id") + col("b.vec_id")) % 3 === 0),
      "single-side predicate" -> (col("b.vec_id") % 2 === 0),
      "stacked extras" -> (col("a.label") === col("b.label") &&
        col("b.vec_id") - col("a.vec_id") > 2))
    grammar.foreach { case (name, extra) =>
      val expected = q(extra).as[(Long, Long)].collect().toSet
      val got = withRule { q(extra).as[(Long, Long)].collect().toSet }
      assert(got == expected, s"result drift under extra conjunct: $name")
      assert(expected.nonEmpty, s"vacuous case: $name")
    }
  }

  test("every spelling of the id-order and threshold conjuncts rewrites") {
    // Each of these forms used to be a SILENT quadratic fallback: the
    // matcher accepted only `a.id < b.id` and `cos >= t`. A user
    // writing the strict threshold, the literal on the left, or the
    // flipped id order means the same query and must get the same
    // plan. For the flipped id order the expected SET differs (left
    // column is the larger id) — correctness is vs the no-rule run of
    // the same text, never vs the canonical form.
    val e = Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cosAB = CosineSimilarity.asColumn(
      col("a.embedding"), col("b.embedding"))
    val spellings: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "strict threshold cos > t" ->
        (col("a.vec_id") < col("b.vec_id") && cosAB > 0.46),
      "literal-left t <= cos" ->
        (col("a.vec_id") < col("b.vec_id") && lit(0.46) <= cosAB),
      "literal-left strict t < cos" ->
        (col("a.vec_id") < col("b.vec_id") && lit(0.46) < cosAB),
      "flipped id b.id > a.id" ->
        (col("b.vec_id") > col("a.vec_id") && cosAB >= 0.46),
      "reversed id a.id > b.id" ->
        (col("a.vec_id") > col("b.vec_id") && cosAB >= 0.46),
      "reversed id b.id < a.id" ->
        (col("b.vec_id") < col("a.vec_id") && cosAB >= 0.46),
      "all flipped t < cos, a.id > b.id" ->
        (col("a.vec_id") > col("b.vec_id") && lit(0.46) < cosAB))
    spellings.foreach { case (name, cond) =>
      def q = e.as("a").join(e.as("b"), cond)
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      val expected = q.as[(Long, Long)].collect().toSet
      val (got, plan) = withRule {
        val df = q
        (df.as[(Long, Long)].collect().toSet,
          df.queryExecution.executedPlan.toString)
      }
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"silent quadratic fallback for spelling: $name\n$plan")
      assert(got == expected, s"result drift for spelling: $name")
      assert(got.nonEmpty, s"vacuous case: $name")
    }
  }

  test("block count is conf-driven; non-default B preserves results") {
    // B caps the rewrite at B(B+1)/2 cells — it must be tunable to the
    // cluster, not baked into the rule. Run the full conjunct grammar
    // at B=5 and B=23 and require identical results and no quadratic
    // operator; also check the knob actually changes the plan (the
    // explode fan-out bound mentions B-1).
    val e = Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    def q(extra: org.apache.spark.sql.Column) = e.as("a").join(e.as("b"),
        col("a.vec_id") < col("b.vec_id") &&
          CosineSimilarity.asColumn(
            col("a.embedding"), col("b.embedding")) >= 0.2 && extra)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
    val grammar: Seq[org.apache.spark.sql.Column] = Seq(
      lit(true),
      col("a.label") === col("b.label"),
      col("b.vec_id") - col("a.vec_id") > 7)
    for (b <- Seq(5, 23); extra <- grammar) {
      val expected = q(extra).as[(Long, Long)].collect().toSet
      spark.conf.set(CosineBlockJoin.BlocksConfKey, b.toString)
      try {
        val (got, plan) = withRule {
          val df = q(extra)
          (df.as[(Long, Long)].collect().toSet,
            df.queryExecution.executedPlan.toString)
        }
        assert(!plan.contains("CartesianProduct") &&
          !plan.contains("BroadcastNestedLoopJoin"),
          s"rule did not fire at B=$b:\n$plan")
        // Only B=23 yields a digit string ("22", the explode upper
        // bound) distinctive enough to witness in the plan text.
        if (b == 23) assert(plan.contains("22"),
          s"plan does not reflect B=$b:\n$plan")
        assert(got == expected, s"result drift at B=$b, extra=$extra")
        assert(got.nonEmpty)
      } finally spark.conf.unset(CosineBlockJoin.BlocksConfKey)
    }
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
