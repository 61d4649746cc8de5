package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation battery an
  * ETL platform runs at layer boundaries (the reference validates
  * per-field on ingest; Delta Live Tables' `expect` and Great
  * Expectations are the public shapes of the same idea): a rule SET is
  * declared once and evaluated with the minimum possible passes —
  * every row-level predicate folds into ONE conditional aggregate over
  * one scan (k rules ≠ k scans), uniqueness is one group-free
  * count-vs-distinct aggregate, and referential integrity is one
  * anti-join per foreign key that shuffles only key columns. Emits one
  * row per rule: (rule, n_checked, n_failed, passed) — the table a
  * pipeline gate reads before promoting a layer.
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** Row-level predicate: a row fails if the predicate is false OR
    * null (SQL three-valued logic would otherwise let nulls sail
    * through a range check). */
  final case class ExprRule(name: String, predicate: Column) extends Rule

  /** Key uniqueness: failures are the excess rows beyond one per
    * distinct key. Null keys are exempt (SQL UNIQUE semantics — and
    * `countDistinct` drops nulls, so counting null rows as checked
    * would report phantom duplicates); pair with an ExprRule when
    * nulls themselves should fail. */
  final case class UniqueRule(name: String, cols: Seq[String]) extends Rule

  /** Referential integrity: child rows whose key has no match in the
    * parent relation fail. Null child keys are exempt (SQL FK
    * semantics). */
  final case class ForeignKeyRule(
      name: String, cols: Seq[String],
      parent: DataFrame, parentCols: Seq[String]) extends Rule

  /** Evaluate a rule set against `df`. All ExprRules share one
    * aggregate pass; each UniqueRule is one aggregate; each
    * ForeignKeyRule is one left-anti join counting orphans. */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val exprRules = rules.collect { case r: ExprRule => r }
    val exprResults: Seq[(String, Long, Long)] =
      if (exprRules.isEmpty) Seq.empty
      else {
        val aggs = count(lit(1)).as("_n") +:
          exprRules.zipWithIndex.map { case (r, i) =>
            sum(when(r.predicate.isNull || !r.predicate, 1L).otherwise(0L))
              .as(s"_f$i")
          }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        val n = row.getAs[Long]("_n")
        exprRules.zipWithIndex.map { case (r, i) =>
          (r.name, n, row.getAs[Long](s"_f$i"))
        }
      }
    val uniqueResults = rules.collect { case r: UniqueRule =>
      val nonNull = r.cols.map(col(_).isNotNull).reduce(_ && _)
      val row = df.agg(count(lit(1)).as("_n"),
        sum(when(nonNull, 1L).otherwise(0L)).as("_nn"),
        countDistinct(r.cols.head, r.cols.tail: _*).as("_d")).head()
      (r.name, row.getAs[Long]("_n"),
        row.getAs[Long]("_nn") - row.getAs[Long]("_d"))
    }
    val fkResults = rules.collect { case r: ForeignKeyRule =>
      val n = df.count()
      val child = df.select(r.cols.map(col): _*).na.drop()
      val parent = r.parent
        .select(r.parentCols.map(col): _*).toDF(r.cols: _*)
      val orphans = child.join(parent, r.cols, "left_anti").count()
      (r.name, n, orphans)
    }
    (exprResults ++ uniqueResults ++ fkResults)
      .toDF("rule", "n_checked", "n_failed")
      .withColumn("passed", col("n_failed") === 0L)
      .orderBy("rule")
  }

  /** quality_expectations — the driver query: the gate a medallion
    * promotion would run over orders (+ lineitem referential
    * integrity). One scan serves the four row-level rules, one
    * aggregate the uniqueness rule, one key-only anti-join the FK. */
  def qualityExpectations(spark: SparkSession, dir: String): DataFrame = {
    val orders = Relational.table(spark, dir, "orders")
    val lineitem = Relational.table(spark, dir, "lineitem")
    evaluate(orders, Seq(
      ExprRule("orderkey_not_null", col("o_orderkey").isNotNull),
      ExprRule("totalprice_positive", col("o_totalprice") > 0.0),
      ExprRule("status_in_domain",
        col("o_orderstatus").isin("F", "O", "P")),
      ExprRule("date_in_epoch_range",
        year(col("o_orderdate")).between(1990, 2100)),
      UniqueRule("orderkey_unique", Seq("o_orderkey"))))
      .unionByName(evaluate(lineitem, Seq(
        ForeignKeyRule("lineitem_fk_orders", Seq("l_orderkey"),
          orders, Seq("o_orderkey")))))
      .orderBy("rule")
  }
}
