package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.plans.{GraftExtensions, GraftFunctions}

class SqlFunctionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("registered SQL functions agree with the Column API") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c1,
                cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c0,
                sorted_intersect_size(array('a','b','c'), array('b','c','d'))
                  AS i
      """).head()
    assert(math.abs(r.getAs[Double]("c1") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("c0")) < 1e-12)
    assert(r.getAs[Int]("i") == 2)
  }

  test("bottom_k works as a SQL aggregate, including GROUP BY") {
    GraftFunctions.registerAll(spark)
    Seq((0, "c"), (0, "a"), (0, "b"), (1, "z"), (1, "y"))
      .toDF("g", "s").createOrReplaceTempView("bk_in")
    try {
      val got = spark.sql(
        "SELECT g, bottom_k(s, 2) AS bk FROM bk_in GROUP BY g")
        .as[(Int, Seq[String])].collect().toMap
      assert(got(0) == Seq("a", "b") && got(1) == Seq("y", "z"))
    } finally spark.catalog.dropTempView("bk_in")
  }

  test("deflate_len, zorder_value, vector_sum work from pure SQL") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT deflate_len(repeat('spark ', 80)) AS rep,
                deflate_len(uuid()) AS _ignore,
                zorder_value(1, 0) AS zx,
                zorder_value(0, 1) AS zy,
                zorder_value(3, 3) AS zb
      """).head()
    assert(r.getAs[Int]("rep") ==
      graft.functions.DeflateRatio.deflateLenOf("spark " * 80))
    assert(r.getAs[Long]("zx") == 1L && r.getAs[Long]("zy") == 2L &&
      r.getAs[Long]("zb") == 15L)
    Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).toDF("v")
      .createOrReplaceTempView("vs_in")
    try {
      val s = spark.sql("SELECT vector_sum(v, 2) AS s FROM vs_in")
        .as[Seq[Double]].head()
      assert(s == Seq(4.0, 6.0))
    } finally spark.catalog.dropTempView("vs_in")
  }

  test("registerAll is idempotent and the extension injector wires up") {
    GraftFunctions.registerAll(spark)
    GraftFunctions.registerAll(spark) // replaces, must not throw
    assert(spark.sql("SELECT sorted_intersect_size(array('x'), array('x'))")
      .head().getInt(0) == 1)
    // The SparkSessionExtensions path shares the same function list.
    new GraftExtensions().apply(new SparkSessionExtensions())
  }

  test("bottom_k rejects a non-literal k") {
    GraftFunctions.registerAll(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT bottom_k(c_name, CAST(c_custkey AS INT)) FROM range(1)")
        .collect()
    }
    assert(err.getMessage != null)
  }
}
