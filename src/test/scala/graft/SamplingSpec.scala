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

  /** Driver-side twin of [[Sampling.hashUniform]]: md5 via
    * MessageDigest, same digit fold, same offset. */
  private def uniformRef(id: Long): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (1 to 8).map { j =>
      ("0123456789abcdef".indexOf(h(j - 1)).toDouble) * math.pow(16.0, -j)
    }.sum + math.pow(16.0, -8) / 2
  }

  test("hashUniform: bit-parity with the driver md5 fold, range (0,1)") {
    import org.apache.spark.sql.functions.col
    val got = Relational.table(spark, sfDir, "documents")
      .filter(col("doc_id") < 256)
      .select(col("doc_id"), Sampling.hashUniform(col("doc_id")).as("u"))
      .as[(Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, u) =>
      assert(u == uniformRef(id), s"u mismatch for id $id")
      assert(u > 0.0 && u < 1.0)
    }
  }

  test("sample_weighted: exact replay of the A-ES reference, weight-biased") {
    import org.apache.spark.sql.functions.col
    val k = 64
    val got = Sampling.sampleWeighted(spark, sfDir, k)
      .as[(Long, Long, Long)].collect()
    assert(got.length == k)
    assert(got.map(_._1).distinct.length == k, "without replacement")
    val corpus = Relational.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].collect()
    val want = corpus.map { case (id, w) =>
      (id, w, math.floor(math.log(uniformRef(id)) / w * 1e6).toLong)
    }.sortBy { case (id, _, kq) => (-kq, id) }.take(k).toSeq
    assert(got.toSeq == want, "distributed top-k must replay the reference")
    val meanSample = got.map(_._2).sum.toDouble / k
    val meanCorpus = corpus.map(_._2).sum.toDouble / corpus.length
    assert(meanSample > meanCorpus,
      s"weighted sample must over-represent long docs " +
        s"($meanSample vs $meanCorpus)")
  }

  test("sample_weighted plans as TakeOrdered — no global sort") {
    val df = Sampling.sampleWeighted(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject, got:\n${plan.take(800)}")
  }
}
