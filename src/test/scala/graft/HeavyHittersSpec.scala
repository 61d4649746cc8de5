package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HeavyHittersSketch

/** The Misra-Gries guarantee — every item with true count > n/k is in
  * the candidate set, for ANY partitioning/merge order — is the whole
  * point of the sketch; these cases drive it with skewed synthetic
  * streams where the sketch genuinely decrements (far more distinct
  * keys than counters), across several partitionings. */
class HeavyHittersSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** A skewed stream: `heavy` items with `heavyCount` occurrences each,
    * plus `light` distinct singletons. */
  private def stream(heavy: Int, heavyCount: Int, light: Int): Seq[String] = {
    val h = (0 until heavy).flatMap(i => Seq.fill(heavyCount)(s"hot_$i"))
    val l = (0 until light).map(i => s"cold_$i")
    // Deterministic interleave (worst for MG: heavy items spread out).
    val rnd = new scala.util.Random(7)
    rnd.shuffle(h ++ l)
  }

  test("every true heavy hitter survives the sketch at every partitioning") {
    val k = 16
    val data = stream(heavy = 5, heavyCount = 200, light = 2000)
    val n = data.size
    // Strict >: the MG guarantee only covers items strictly above n/k
    // (an item at exactly n/k may legitimately be evicted).
    val trueHeavy = data.groupBy(identity).filter(_._2.size * k > n).keySet
    assert(trueHeavy.size == 5, s"fixture: ${trueHeavy.size} heavy items")
    for (parts <- Seq(1, 3, 8, 32)) {
      val cands = data.toDF("s").repartition(parts)
        .agg(HeavyHittersSketch.asColumn(col("s"), k))
        .head().getSeq[String](0).toSet
      assert(cands.size <= k, s"parts=$parts: ${cands.size} counters")
      assert(trueHeavy.subsetOf(cands),
        s"parts=$parts lost ${trueHeavy -- cands}")
    }
  }

  test("driver query equals the exact group-by/having over the corpus") {
    val got = HeavyHittersSketch.heavyHittersQuery(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    val toks = graft.operators.Relational.table(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
    val n = toks.count()
    val want = toks.groupBy("token").agg(count(lit(1)).as("c"))
      .filter(col("c") * 64 > n)
      .orderBy("token")
      .as[(String, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty, "fixture should have heavy tokens at n/64")
  }
}
