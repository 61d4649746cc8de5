package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.transform.{Chain, SqlTransforms, Step, TransformRegistry}
import graft.types.FieldSpec
import graft.types.LogicalType._

class TransformSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def df3 = Seq(1, 2, 3).toDF("n")

  test("chain folds active confirmed steps in order") {
    val steps = Seq(
      Step("b", _.withColumn("n", col("n") * 10), order = 1),
      Step("a", _.filter(col("n") > 1), order = 0))
    val (out, results) = Chain.run(df3, steps)
    assert(out.as[Int].collect().sorted.toSeq == Seq(20, 30))
    assert(results.map(_.name) == Seq("a", "b"))
  }

  test("inactive and unconfirmed steps are excluded") {
    val steps = Seq(
      Step("skip1", _.limit(0), active = false),
      Step("skip2", _.limit(0), confirmed = false),
      Step("keep", identity))
    val (out, results) = Chain.run(df3, steps)
    assert(out.count() == 3)
    assert(results.map(_.name) == Seq("keep"))
  }

  test("fail-fast: later steps are skipped after a failure") {
    val steps = Seq(
      Step("ok", identity, order = 0),
      Step("boom", _ => throw new RuntimeException("kapow"), order = 1),
      Step("never", identity, order = 2))
    val (_, results) = Chain.run(df3, steps)
    assert(results.map(_.status) == Seq("success", "failed", "skipped"))
    assert(results(1).error.exists(_.contains("kapow")))
  }

  test("registry: confirm, re-confirm archives, rollback reactivates") {
    val reg = new TransformRegistry
    reg.confirm("f", identity)
    reg.confirm("f", _.limit(1))
    assert(reg.history("f").map(s => (s.version, s.active))
      == Seq((1, false), (2, true)))
    assert(reg.rollback("f", 1).isDefined)
    assert(reg.history("f").map(s => (s.version, s.active))
      == Seq((1, true), (2, false)))
    assert(reg.rollback("f", 99).isEmpty)
  }

  test("registry: reorder rewrites task order; invalid reorder throws") {
    val reg = new TransformRegistry
    reg.confirm("x", identity)
    reg.confirm("y", identity)
    reg.reorder(Seq("y", "x"))
    assert(reg.activeChain.map(s => (s.name, s.order))
      == Seq(("y", 0), ("x", 1)))
    intercept[IllegalArgumentException](reg.reorder(Seq("y")))
  }

  test("sql validate: rejects side effects, non-selects, missing input") {
    assert(SqlTransforms.validate(spark,
      "SELECT n FROM __input__").isRight)
    assert(SqlTransforms.validate(spark,
      "DROP TABLE t; SELECT 1 FROM __input__").isLeft)
    assert(SqlTransforms.validate(spark,
      "INSERT INTO x SELECT * FROM __input__").isLeft)
    assert(SqlTransforms.validate(spark, "SELECT 1").isLeft)
    assert(SqlTransforms.validate(spark,
      "SELECT n FROM __input__ WHERE ((").isLeft)
  }

  test("sql step executes against the input alias") {
    val step = SqlTransforms.step(spark, "x2",
      "SELECT n * 2 AS n FROM __input__")
    assert(step.fn(df3).as[Int].collect().sorted.toSeq == Seq(2, 4, 6))
  }

  test("sql step: '__input__' inside a string literal is not rewritten") {
    val step = SqlTransforms.step(spark, "lit",
      "SELECT n, '__input__' AS tag FROM __input__ WHERE n = 1")
    val rows = step.fn(df3).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(1) == "__input__")
  }

  test("sql step: case-insensitive table token, CTE reference resolves") {
    val step = SqlTransforms.step(spark, "cte",
      "WITH t AS (SELECT n FROM __INPUT__ WHERE n > 1) " +
        "SELECT sum(n) AS s FROM t")
    assert(step.fn(df3).as[Long].collect().toSeq == Seq(5L))
  }

  test("dry run returns rows and schema; captures errors") {
    val fields = Seq(FieldSpec("v", TLong, sampleValues = Seq("5")))
    val ok = Chain.dryRun(spark,
      Step("inc", _.withColumn("w", col("v") + 1)), fields, n = 3)
    assert(ok.error.isEmpty && ok.rows.size == 3)
    assert(ok.schema == Seq("v" -> "bigint", "w" -> "bigint"))
    assert(ok.rows.forall(r => r("w") == 6L))
    val bad = Chain.dryRun(spark,
      Step("nocol", _.select(col("missing"))), fields)
    assert(bad.error.isDefined)
  }
}
