package graft.transform

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.infer.Infer
import graft.types.FieldSpec

/** Transform-chain execution — SURVEY.md §2.3.
  *
  * A step is a named, versioned `DataFrame => DataFrame`; a chain is the
  * ordered fold of the active, confirmed steps
  * (`silver_service.py:96-127`, ordering `routers/silver.py:642-651`).
  * Because Spark is lazy, the fold builds ONE Catalyst plan — each step
  * contributes operators that the optimizer rewrites jointly (filter
  * pushdown through later steps, joint column pruning), which is exactly
  * why chains of many steps stay cheap at 100 TB.
  */
final case class Step(
    name: String,
    fn: DataFrame => DataFrame,
    order: Int = 0,
    version: Int = 1,
    active: Boolean = true,
    confirmed: Boolean = true)

final case class StepResult(
    name: String,
    version: Int,
    order: Int,
    status: String,
    durationMs: Long,
    error: Option[String] = None)

object Chain {

  /** transform_chain — fold ordered active+confirmed steps, fail fast;
    * per-step timing covers plan construction (execution is deferred to
    * the caller's action, as in the reference where transforms are also
    * lazy). */
  def run(df: DataFrame, steps: Seq[Step]): (DataFrame, Seq[StepResult]) = {
    val ordered = steps.filter(s => s.active && s.confirmed).sortBy(_.order)
    val results = Seq.newBuilder[StepResult]
    var cur = df
    var failed = false
    ordered.foreach { s =>
      if (!failed) {
        val t0 = System.nanoTime()
        try {
          cur = s.fn(cur)
          results += StepResult(s.name, s.version, s.order, "success",
            (System.nanoTime() - t0) / 1000000)
        } catch {
          case e: Exception =>
            failed = true
            results += StepResult(s.name, s.version, s.order, "failed",
              (System.nanoTime() - t0) / 1000000, Some(e.getMessage))
        }
      } else results += StepResult(s.name, s.version, s.order, "skipped", 0)
    }
    (cur, results.result())
  }

  final case class DryRunResult(
      rows: Seq[Map[String, Any]],
      schema: Seq[(String, String)],
      error: Option[String])

  /** dry_run — execute one step against ≤10 synthesized rows and
    * materialize rows + output schema, or the error
    * (`sandbox.py:124-220`). Runs in the caller's session (no throwaway
    * local[1]: session-per-request was a web-app artifact). */
  def dryRun(
      spark: SparkSession,
      step: Step,
      fields: Seq[FieldSpec],
      n: Int = 10): DryRunResult = {
    try {
      val sample = Infer.synthesizeRows(spark, fields, n)
      val out = step.fn(sample)
      val rows = out.limit(n).collect().toSeq.map { r =>
        out.schema.fieldNames.zipWithIndex
          .map { case (c, i) => c -> r.get(i) }.toMap
      }
      DryRunResult(rows,
        out.schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString),
        None)
    } catch {
      case e: Exception => DryRunResult(Nil, Nil, Some(e.getMessage))
    }
  }
}

/** SQL-expression transform surface + static validation — the
  * Spark-native analog of the reference's sandboxed code transforms
  * (`sandbox.py:23-71`, `ai_service.py:268-296`). Instead of exec()ing
  * Python, a transform may be declared as a SQL SELECT over the alias
  * `__input__`; validation rejects side-effecting statements before the
  * plan is ever built, and `spark.sql` keeps the whole chain inside
  * Catalyst.
  */
object SqlTransforms {

  private val Forbidden =
    Seq("insert ", "update ", "delete ", "drop ", "create ", "alter ",
      "truncate ", "merge ", "grant ", "copy ")

  /** code_validate — must be a single SELECT over `__input__`, free of
    * side-effecting keywords, and parseable. */
  def validate(spark: SparkSession, sql: String): Either[String, Unit] = {
    val norm = sql.trim.toLowerCase.replaceAll("\\s+", " ")
    if (!norm.startsWith("select ") && !norm.startsWith("with "))
      Left("transform must be a SELECT")
    else if (Forbidden.exists(norm.contains))
      Left("side-effecting statement forbidden")
    else if (!norm.contains("__input__"))
      Left("transform must read from __input__")
    else
      try { spark.sessionState.sqlParser.parsePlan(sql); Right(()) }
      catch { case e: Exception =>
        Left(s"parse error: ${e.getMessage.linesIterator.next()}") }
  }

  /** Build a Step from a validated SQL string. */
  def step(spark: SparkSession, name: String, sql: String,
      order: Int = 0): Step = {
    validate(spark, sql).left.foreach(err =>
      throw new IllegalArgumentException(s"invalid transform '$name': $err"))
    Step(name, df => {
      // Parse-and-rewrite, not string substitution: the parsed plan's
      // table reference `__input__` is rebound to a unique temp view, so
      // the token inside a string LITERAL of the user SQL (e.g.
      // SELECT '__input__') survives untouched. The view is dropped
      // before returning — analysis is forced first so the view subtree
      // is inlined into the resolved plan and a long-lived session does
      // not accumulate one catalog entry per step execution.
      import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
      import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, UnresolvedWith}
      val spark = df.sparkSession
      val alias = s"__input_${java.util.UUID.randomUUID.toString.take(8)}__"
      // CTE definitions are innerChildren (not traversed by transform),
      // so rebind recurses into them explicitly; subquery expressions
      // are covered by the WithSubqueries traversal.
      def rebind(p: LogicalPlan): LogicalPlan = p.transformUpWithSubqueries {
        case r: UnresolvedRelation
            if r.multipartIdentifier.map(_.toLowerCase) == Seq("__input__") =>
          UnresolvedRelation(Seq(alias))
        case w: UnresolvedWith =>
          w.copy(cteRelations = w.cteRelations.map { case (n, s, m) =>
            (n, rebind(s).asInstanceOf[SubqueryAlias], m) })
      }
      df.createOrReplaceTempView(alias)
      try {
        val plan = rebind(spark.sessionState.sqlParser.parsePlan(sql))
        val out = org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark, plan)
        out.queryExecution.assertAnalyzed()
        out
      } finally spark.catalog.dropTempView(alias)
    }, order)
  }
}

/** version_control — confirm/new-version/rollback/reorder semantics of
  * the reference's transformation registry
  * (`routers/silver.py:467-566, 596-611, 807-842`). Pure control-plane
  * metadata; no Spark involvement.
  */
final class TransformRegistry {
  private var versions = Map.empty[String, Vector[(Int, Step)]]
  private var orderOf = Vector.empty[String]

  /** Confirm a step: first confirm → v1; re-confirm → archive the old
    * version and activate v(N+1). */
  def confirm(name: String, fn: DataFrame => DataFrame): Step = {
    val prior = versions.getOrElse(name, Vector.empty)
    val v = prior.map(_._1).maxOption.getOrElse(0) + 1
    val step = Step(name, fn,
      order = orderOf.indexOf(name) match {
        case -1 => orderOf = orderOf :+ name; orderOf.size - 1
        case i  => i
      },
      version = v)
    versions += name -> (prior.map { case (pv, ps) =>
      (pv, ps.copy(active = false)) } :+ (v, step))
    step
  }

  /** Reactivate an archived version (rollback). */
  def rollback(name: String, version: Int): Option[Step] =
    versions.get(name).flatMap(_.find(_._1 == version)).map { case (v, s) =>
      versions += name -> versions(name).map { case (pv, ps) =>
        (pv, ps.copy(active = pv == v)) }
      s.copy(active = true)
    }

  /** Rewrite task_order from an explicit name list. */
  def reorder(names: Seq[String]): Unit = {
    require(names.toSet == orderOf.toSet, "reorder must mention every step")
    orderOf = names.toVector
  }

  /** The active chain in task order. */
  def activeChain: Seq[Step] =
    orderOf.zipWithIndex.flatMap { case (name, i) =>
      versions(name).collectFirst {
        case (_, s) if s.active => s.copy(order = i) }
    }

  def history(name: String): Seq[Step] =
    versions.getOrElse(name, Vector.empty).map(_._2)
}
