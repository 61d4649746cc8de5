package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Expectations
import graft.operators.Expectations.{ExprRule, ForeignKeyRule, UniqueRule}

/** The expectations engine on data engineered to FAIL each rule kind —
  * the pass-path is covered by the oracle-checked driver query. */
class ExpectationsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val t = Seq(
    (Some(1L), Some(10.0), "A"),
    (Some(1L), Some(-5.0), "B"),   // duplicate key; negative value
    (Some(2L), None, "A"),         // null value must FAIL a range rule
    (None, Some(3.0), "Z"))        // null key; out-of-domain category
    .toDF("id", "v", "cat")

  test("row-level rules fold into one pass and nulls fail predicates") {
    val out = Expectations.evaluate(t, Seq(
      ExprRule("v_positive", col("v") > 0.0),
      ExprRule("cat_domain", col("cat").isin("A", "B")),
      ExprRule("id_not_null", col("id").isNotNull)))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // v_positive: -5.0 fails, NULL fails (three-valued logic guarded)
    assert(out("v_positive") == ((4L, 2L, false)))
    assert(out("cat_domain") == ((4L, 1L, false)))
    assert(out("id_not_null") == ((4L, 1L, false)))
  }

  test("uniqueness counts excess rows; FK counts orphans, nulls exempt") {
    val parent = Seq(1L, 2L).toDF("pid")
    val out = Expectations.evaluate(t, Seq(
      UniqueRule("id_unique", Seq("id")),
      ForeignKeyRule("fk", Seq("id"), parent, Seq("pid"))))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // 4 rows, 3 distinct ids (1, 2, null) -> 1 excess
    assert(out("id_unique") == ((4L, 1L, false)))
    // ids 1,1,2 all have parents; the null id is exempt -> 0 orphans
    assert(out("fk") == ((4L, 0L, true)))
    val orphan = Expectations.evaluate(t, Seq(
      ForeignKeyRule("fk2", Seq("id"), Seq(1L).toDF("pid"), Seq("pid"))))
      .as[(String, Long, Long, Boolean)].collect()
    assert(orphan(0)._3 == 1L && !orphan(0)._4, "id=2 is an orphan")
  }

  test("an all-green rule set reports passed everywhere") {
    val out = Expectations.evaluate(t.filter(col("id").isNotNull), Seq(
      ExprRule("id_not_null", col("id").isNotNull)))
      .as[(String, Long, Long, Boolean)].collect()
    assert(out(0) == (("id_not_null", 3L, 0L, true)))
  }
}
