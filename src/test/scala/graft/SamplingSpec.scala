package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{RelationalExt, Relational, Sampling, TextOps}

class SamplingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("train/holdout split partitions the corpus deterministically") {
    val total = Relational.table(spark, sfDir, "documents").count()
    val a = Sampling.trainHoldout(spark, sfDir)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(a.map(_._2).sum == total, "splits must partition the corpus")
    assert(a.map(_._1).toSeq == Seq("holdout", "train"))
    val train = a.find(_._1 == "train").get._2
    // boundary 0xe6 → ~89.8% expected; generous band for a 500-doc corpus
    assert(train.toDouble / total > 0.8 && train.toDouble / total < 0.97)
    val b = Sampling.trainHoldout(spark, sfDir)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq, "split must be reproducible")
  }

  test("vocab top-k: dense ranks, non-increasing df, deterministic ties") {
    val rows = TextOps.vocabTopK(spark, sfDir, k = 20)
      .as[(Int, String, Long)].collect()
    assert(rows.map(_._1).toSeq == (1 to 20))
    assert(rows.sliding(2).forall { case Array(x, y) =>
      x._3 > y._3 || (x._3 == y._3 && x._2 < y._2) })
  }

  test("discrete quantiles are ordered data elements") {
    val vals = Relational.table(spark, sfDir, "lineitem")
      .select("l_extendedprice").as[Double].collect().toSet
    val q = RelationalExt.columnQuantiles(spark, sfDir)
      .as[(String, Double, Double, Double, Double)].collect()
    assert(q.nonEmpty)
    q.foreach { case (_, p25, p50, p75, p95) =>
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95)
      assert(Seq(p25, p50, p75, p95).forall(vals.contains),
        "discrete percentile must be an actual data element")
    }
  }
}
