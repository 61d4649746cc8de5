package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.BottomKStrings

class BottomKSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("bottom-k equals sorted distinct take(k), for any partitioning") {
    val vals = (0 until 500).map(i => s"v${i % 137}") // dups on purpose
    val want = vals.distinct.sorted.take(10)
    Seq(1, 7, 32).foreach { parts =>
      val got = vals.toDF("s").repartition(parts)
        .agg(BottomKStrings.asColumn(col("s"), 10).as("bk"))
        .as[Seq[String]].head()
      assert(got == want, s"parts=$parts")
    }
  }

  test("grouped bottom-k keeps per-group buffers independent") {
    val df = (0 until 100).map(i => (i % 2, f"x$i%03d")).toDF("g", "s")
    val got = df.groupBy("g")
      .agg(BottomKStrings.asColumn(col("s"), 3).as("bk"))
      .as[(Int, Seq[String])].collect().toMap
    assert(got(0) == Seq("x000", "x002", "x004"))
    assert(got(1) == Seq("x001", "x003", "x005"))
  }

  test("null inputs are skipped, short sets return all values") {
    val got = Seq(Some("b"), None, Some("a"), Some("b"))
      .toDF("s")
      .agg(BottomKStrings.asColumn(col("s"), 10).as("bk"))
      .as[Seq[String]].head()
    assert(got == Seq("a", "b"))
  }

  test("KMV estimate from md5 bottom-k is within 50% of exact distinct") {
    // k=64 gives ~1/sqrt(62) ≈ 13% standard error; 50% is a loose,
    // flake-proof bound that still catches an off-by-orders bug.
    val k = 64
    val d = graft.operators.Relational.table(spark, sfDir, "documents")
    val hs = d.agg(BottomKStrings.asColumn(
        md5(col("text").cast("binary")), k).as("hs"))
      .as[Seq[String]].head()
    val exact = d.select(countDistinct(col("text"))).as[Long].head()
    if (exact > k) {
      val frac = java.lang.Long.parseLong(hs.last.take(15), 16).toDouble /
        math.pow(16, 15)
      val est = (k - 1) / frac
      assert(math.abs(est - exact) / exact < 0.5, s"est=$est exact=$exact")
    } else assert(hs.size == exact)
  }

  test("count-min: guarantees hold and exact counts match a direct groupBy") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.RelationalExt.countMinQuery(spark, sfDir)
      .collect()
    assert(rows.length == 8)
    val want = graft.operators.Relational.table(spark, sfDir, "lineitem")
      .filter(col("l_partkey") <= 34)
      .groupBy("l_partkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == want.getOrElse(r.getLong(0), 0L),
        s"exact count for key ${r.getLong(0)}")
      assert(r.getBoolean(2), "CM must never undercount")
      assert(r.getBoolean(3), "CM must stay within eps*N")
      assert(r.getBoolean(4), "merged halves must equal the whole sketch")
    }
  }
}
