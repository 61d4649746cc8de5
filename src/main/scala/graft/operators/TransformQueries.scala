package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline
import graft.sources.Sources
import graft.transform.{Chain, SqlTransforms, Step, TransformRegistry}
import graft.types.FieldSpec
import graft.types.LogicalType._

/** Driver-contract queries for the transform-chain / control-plane
  * operators of SURVEY.md §2.3 and §2.5. */
object TransformQueries {

  private def bandExpr = when(col("o_totalprice") < 150000, "low")
    .otherwise("high").as("band")

  /** transform_chain — ordered fold of three steps over orders. */
  def transformChain(spark: SparkSession, dir: String): DataFrame = {
    val steps = Seq(
      Step("filter_open", _.filter(col("o_orderstatus") === "O"), order = 0),
      Step("derive_band", _.withColumn("band", bandExpr), order = 1),
      Step("agg_band",
        _.groupBy("band").agg(count(lit(1)).as("n_orders")), order = 2),
      Step("inactive_never_runs", _.limit(0), order = 3, active = false))
    val (out, results) = Chain.run(Relational.table(spark, dir, "orders"), steps)
    require(results.forall(_.status == "success"))
    out.orderBy("band")
  }

  /** dry_run — execute a SQL-expression step on 10 synthesized rows. */
  def dryRun(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fields = Seq(
      FieldSpec("name", TString, sampleValues = Seq("alice", "bob", "carol")),
      FieldSpec("age", TLong, sampleValues = Seq("30", "40")))
    val step = SqlTransforms.step(spark, "double_age",
      "SELECT name, age * 2 AS doubled FROM __input__")
    val r = Chain.dryRun(spark, step, fields)
    require(r.error.isEmpty, r.error.getOrElse(""))
    r.rows.zipWithIndex
      .map { case (m, i) =>
        (i, m("name").asInstanceOf[String], m("doubled").asInstanceOf[Long]) }
      .toDF("row_id", "name", "doubled")
      .orderBy("row_id")
  }

  /** version_control — confirm/re-confirm/rollback lifecycle. */
  def versionControl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val reg = new TransformRegistry
    reg.confirm("f", identity)
    reg.confirm("g", identity)
    reg.confirm("f", _.limit(1)) // v2 archives v1
    reg.rollback("f", 1)         // reactivate v1
    val rows =
      (reg.history("f") ++ reg.history("g"))
        .map(s => (s.name, s.version, s.active))
    rows.toDF("step_name", "version", "active")
      .orderBy("step_name", "version")
  }

  /** code_validate — static gate over SQL-expression transforms. */
  def codeValidate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cases = Seq(
      "SELECT name FROM __input__",                    // ok
      "INSERT INTO t SELECT * FROM __input__",         // side effect
      "SELECT 1",                                      // no __input__
      "SELECT name FROM __input__ WHERE ((")           // parse error
    cases.zipWithIndex
      .map { case (sql, i) =>
        (i, SqlTransforms.validate(spark, sql).isRight) }
      .toDF("check_idx", "valid")
      .orderBy("check_idx")
  }

  /** preview_limit — count + limit(n) + schema listing. */
  def previewLimit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Pipeline.preview(Relational.table(spark, dir, "customer"), 5)
    Seq((p.totalRows, p.rows.size.toLong, p.schema.size.toLong))
      .toDF("total_rows", "n_preview_rows", "n_cols")
  }

  /** count_records — input/output counts around a chain run. */
  def countRecords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = Relational.table(spark, dir, "orders")
    val (out, _) = Chain.run(in,
      Seq(Step("open_only", _.filter(col("o_orderstatus") === "O"))))
    Seq((in.count(), out.count())).toDF("input_rows", "output_rows")
  }

  /** pipeline_medallion — full bronze→silver→gold run with SQL-expression
    * steps and parquet layer interchange; returns the gold table. Covers
    * dag_generate (runner), silver_schema_handoff (gold reads the silver
    * output), count_records and the status machine. */
  def pipelineMedallion(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft_medallion").toString
    val silver = Seq(
      SqlTransforms.step(spark, "open_orders",
        """SELECT o_orderkey, o_orderstatus, o_totalprice
           FROM __input__ WHERE o_orderstatus = 'O'""", order = 0),
      SqlTransforms.step(spark, "band",
        """SELECT *, CASE WHEN o_totalprice < 150000 THEN 'low'
           ELSE 'high' END AS band FROM __input__""", order = 1))
    val gold = Seq(
      SqlTransforms.step(spark, "by_band",
        "SELECT band, count(*) AS n_orders FROM __input__ GROUP BY band"))
    val r = Pipeline.run(spark, Relational.table(spark, dir, "orders"),
      silver, gold, root)
    require(r.status == Pipeline.Status.GoldReady, s"status=${r.status}")
    require(r.layers.map(_.layer) == Seq("bronze", "silver", "gold"))
    Sources.scanParquet(spark, r.goldPath).orderBy("band")
  }

  /** silver_schema_handoff — gold's input schema is re-read from the
    * silver OUTPUT files, not the declared schema. */
  def silverSchemaHandoff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_handoff").resolve("s").toString
    val silver = Relational.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        (col("c_acctbal") * 2).as("doubled_bal"))
    graft.sinks.Sinks.parquetOverwrite(silver, out)
    val handoff = Sources.scanParquet(spark, out)
    handoff.schema.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString))
      .toDF("column_name", "dtype")
      .orderBy("column_name")
  }
}
