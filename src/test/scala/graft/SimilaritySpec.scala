package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("brute-force top-k: correct k, no self, rank 1 maximizes cosine") {
    val got = Similarity.bruteForceTopK(spark, sfDir, _ < 3, k = 5)
      .as[(Long, Int, Long)].collect()
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    assert(byQuery.values.forall(_.length == 5))
    assert(got.forall { case (q, _, n) => q != n })
    // recompute cosine on the driver for query 0
    val (ids, mat) = Similarity.normalized(spark, sfDir)
    def cos(i: Int, j: Int) =
      mat(i).zip(mat(j)).map { case (x, y) => x * y }.sum
    val q0 = ids.indexOf(0L)
    val best = ids.indices.filter(_ != q0).maxBy(cos(q0, _))
    val rank1 = got.filter(t => t._1 == 0L && t._2 == 1).head._3
    assert(ids(best) == rank1)
  }

  test("lsh ann reaches usable recall vs brute force") {
    val bf = Similarity.bruteForceTopK(spark, sfDir, _ < 5, k = 10)
      .as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    val lsh = Similarity.lshTopK(spark, sfDir, _ < 5, k = 10)
      .as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("lsh is deterministic across runs") {
    val a = Similarity.lshTopK(spark, sfDir, _ < 2).collect().toSeq
    val b = Similarity.lshTopK(spark, sfDir, _ < 2).collect().toSeq
    assert(a == b)
  }

  test("ivf ann reaches usable recall and is deterministic") {
    val bf = Similarity.bruteForceTopK(spark, sfDir, _ < 5, k = 10)
      .as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    val ivf = Similarity.ivfTopK(spark, sfDir, _ < 5, k = 10)
      .as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"recall=$recall")
    val again = Similarity.ivfTopK(spark, sfDir, _ < 5, k = 10)
      .as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    assert(ivf == again)
  }

  test("native cosine_sim expression: known values via SQL") {
    graft.functions.CosineSimilarity.register(spark)
    val got = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
                           array(CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE)))""")
      .head().getDouble(0)
    assert(math.abs(got - 1.0 / math.sqrt(2.0)) < 1e-12)
    val nullOut = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(CAST(1.0 AS DOUBLE)))")
      .head()
    assert(nullOut.isNullAt(0))
  }

  test("native cosine expression query equals the broadcast-scan dedup") {
    import graft.operators.Dedup
    val viaExpr = graft.functions.CosineSimilarity.pairsQuery(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val viaScan = Dedup.embeddingCosinePairs(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    assert(viaExpr == viaScan)
  }
}
