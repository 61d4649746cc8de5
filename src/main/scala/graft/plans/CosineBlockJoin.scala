package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, EqualNullSafe, Expression, GreaterThanOrEqual, If, LessThan, Literal, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.CosineSimilarity

/** Optimizer rule: rewrite the NAIVE QUADRATIC cosine-threshold
  * self-join —
  *
  * {{{ e.as("a").join(e.as("b"),
  *       $"a.id" < $"b.id" && cosine_sim($"a.emb", $"b.emb") >= t) }}}
  *
  * (what a user writes first for embedding dedup; Spark can only plan
  * it as a cartesian/nested-loop join, O(n²) rows through one
  * unbalanced operator) — into the balanced TRIANGLE BLOCK EQUI-JOIN
  * that `Similarity.blockPairs` builds by hand: each side replicates
  * into B-block groups so every unordered pair meets in exactly one of
  * the B(B+1)/2 (p, q) cells, the pair condition runs as the
  * equi-join's post-filter, and a final projection restores the
  * original column order (smaller id on the left, as the `<` conjunct
  * demands). Shuffle volume O(B·n) rows, (n/B)² work per cell across
  * all executors — same results, distributed plan.
  *
  * Semantic requirements checked before rewriting: inner join, both
  * sides the SAME relation (`sameResult`), condition is exactly
  * `idL < idR AND cosine_sim(eL, eR) >= lit` with each attribute on
  * its own side, and no equi-join conjuncts already present (which
  * also prevents the rule re-matching its own output). Cosine is
  * symmetric, so scoring before the column reorder is sound.
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * (deployment) or `spark.experimental.extraOptimizations` (live
  * session) — both run it in the optimizer's user-rule batch, after
  * predicate pushdown has merged the filter into the join condition. */
case class CosineBlockJoin(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val Blocks = 16

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(l, r, Inner, Some(cond), _) if l.sameResult(r) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val noEqui = !conjuncts.exists {
        case _: EqualTo | _: EqualNullSafe => true
        case _ => false
      }
      val parts = (conjuncts, noEqui) match {
        case (Seq(a, b), true) => extract(a, b, l, r).orElse(extract(b, a, l, r))
        case _ => None
      }
      parts match {
        case Some((idL, idR, cosGte)) => rewrite(j, l, r, idL, idR, cosGte)
        case None => j
      }
  }

  /** Match (idL < idR, cosine_sim(eL, eR) >= lit) with correct
    * sidedness; returns (idL, idR, the cosine conjunct). */
  private def extract(c1: Expression, c2: Expression,
      l: LogicalPlan, r: LogicalPlan)
      : Option[(Attribute, Attribute, Expression)] = (c1, c2) match {
    case (LessThan(idL: Attribute, idR: Attribute),
          g @ GreaterThanOrEqual(CosineSimilarity(eL: Attribute,
            eR: Attribute), Literal(_, _)))
        if l.outputSet.contains(idL) && r.outputSet.contains(idR) &&
          l.outputSet.contains(eL) && r.outputSet.contains(eR) &&
          (idL.dataType == org.apache.spark.sql.types.LongType ||
            idL.dataType == org.apache.spark.sql.types.IntegerType) =>
      Some((idL, idR, g))
    case _ => None
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
      idL: Attribute, idR: Attribute, cosGte: Expression): LogicalPlan = {
    def c(e: Expression) = ColumnBridge.column(e)
    val ldf = ColumnBridge.ofRows(spark, l)
    val rdf = ColumnBridge.ofRows(spark, r)
    val lhs = ldf
      .withColumn("__gp", pmod(c(idL), lit(Blocks)).cast("int"))
      .withColumn("__gq", explode(sequence(col("__gp"), lit(Blocks - 1))))
    val rhs = rdf
      .withColumn("__gq2", pmod(c(idR), lit(Blocks)).cast("int"))
      .withColumn("__gp2", explode(sequence(lit(0), col("__gq2"))))
    val joined = lhs.join(rhs,
        col("__gp") === col("__gp2") && col("__gq") === col("__gq2"))
      // Same-block cells contain both orderings of a pair — keep one.
      .filter(col("__gp") =!= col("__gq") || c(idL) < c(idR))
      // The threshold runs as the equi-join's post-filter (symmetric,
      // so role order does not matter).
      .filter(c(cosGte))
    // Distinct-block cells assign roles by BLOCK order, the original
    // join by ID order — restore it: for every output column pair,
    // emit the smaller-id document's value on the left. Aliases reuse
    // the original exprIds so parent operators keep resolving.
    val ordered = LessThan(idL, idR)
    val proj: Seq[NamedExpression] =
      l.output.zip(r.output).map { case (la, ra) =>
        Alias(If(ordered, la, ra), la.name)(exprId = la.exprId)
      } ++
      l.output.zip(r.output).map { case (la, ra) =>
        Alias(If(ordered, ra, la), ra.name)(exprId = ra.exprId)
      }
    Project(proj, joined.queryExecution.analyzed)
  }
}

object CosineBlockJoinQuery {

  /** optimizer_cosine_rewrite driver query — the NAIVE quadratic join
    * text, executed with [[CosineBlockJoin]] active on the session
    * (scoped: installed and removed around the run). The emitted pairs
    * must equal the exact all-pairs cosine result (the oracle), and the
    * `rewritten` column carries the engine's own assertion that the
    * executed plan contains no cartesian/nested-loop operator — so a
    * rule regression flips a hash-checked value, not just a spec. */
  def rewriteQuery(spark: SparkSession, dir: String,
      threshold: Double = 0.46): DataFrame = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ CosineBlockJoin(spark)
    try {
      val e = graft.operators.Relational.table(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val pairs = e.as("a").join(e.as("b"),
          col("a.vec_id") < col("b.vec_id") &&
            ColumnBridge.column(CosineSimilarity(
              ColumnBridge.expression(col("a.embedding")),
              ColumnBridge.expression(col("b.embedding")))) >= threshold)
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      val planStr = pairs.queryExecution.executedPlan.toString
      val rewritten = !planStr.contains("CartesianProduct") &&
        !planStr.contains("BroadcastNestedLoopJoin")
      pairs.withColumn("rewritten", lit(rewritten))
        .orderBy("id_a", "id_b")
        .localCheckpoint(true)
    } finally spark.experimental.extraOptimizations = prev
  }
}
