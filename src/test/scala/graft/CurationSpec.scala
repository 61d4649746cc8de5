package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("decontaminate flags exactly the docs sharing a k-gram") {
    val bench = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x y alpha beta gamma z"),   // shares "alpha|beta|gamma"
      (2L, "beta gamma delta q r s"),   // shares "beta|gamma|delta"
      (3L, "totally different words here"),
      (4L, "alpha beta x gamma delta")) // no shared 3-gram
      .toDF("doc_id", "text")
    val got = Curation.decontaminate(corpus, bench, k = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("decontaminate counts distinct overlapping grams once") {
    val bench = Seq((0L, "a b c d")).toDF("doc_id", "text")
    // "a|b|c" appears twice in the doc but must count once (distinct).
    val corpus = Seq((1L, "a b c q a b c d")).toDF("doc_id", "text")
    val got = Curation.decontaminate(corpus, bench, k = 3)
      .as[(Long, Long)].collect().toMap
    // shares a|b|c, b|c|d — 2 distinct overlapping grams
    assert(got == Map(1L -> 2L))
  }

  test("decontaminate broadcasts the benchmark side (no corpus shuffle join)") {
    val d = graft.operators.Relational.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val q = Curation.decontaminate(
      d.filter(col("doc_id") % 97 =!= 0), d.filter(col("doc_id") % 97 === 0), 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark join should be broadcast:\n$plan")
  }

  test("repetition signals on a hand-computed doc") {
    // 6 tokens, 3 distinct -> dup ratio 0.5; bigrams a|b, b|a, a|b,
    // b|a, a|c -> top count 2, tie between a|b and b|a broken asc.
    val dir = graft.util.Scratch.dir("curation-rep").toString
    Seq((1L, "a b a b a c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = Curation.repetitionQuery(spark, dir).head()
    assert(row.getAs[Int]("n_tokens") == 6)
    assert(row.getAs[Double]("dup_token_ratio") == 0.5)
    assert(row.getAs[String]("top_bigram") == "a|b")
    assert(row.getAs[Double]("top_bigram_frac") == 2.0 / 5)
  }

  test("repetition dup ratio is exact on a constructed corpus") {
    // Verify the formula directly via the public query on real data:
    // recompute independently for 20 docs.
    val docs = graft.operators.Relational.table(spark, sfDir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), size(col("ws")).as("n"),
        size(array_distinct(col("ws"))).as("d"))
      .filter(col("doc_id") < 20)
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2 - r._3).toDouble / r._2)).toMap
    val got = Curation.repetitionQuery(spark, sfDir)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), col("dup_token_ratio"))
      .as[(Long, Double)].collect().toMap
    assert(got == docs)
  }

  test("mixtureKeep: rate 1.0 keeps everything, rate 0 keeps nothing") {
    val df = (0L until 200L).toDF("id")
    val keepAll = df.filter(Curation.mixtureKeep(col("id"), lit("x"),
      Map.empty, defaultRate = 1.0)).count()
    assert(keepAll == 200)
    val keepNone = df.filter(Curation.mixtureKeep(col("id"), lit("x"),
      Map("x" -> 0.0))).count()
    assert(keepNone == 0)
  }

  test("mixtureKeep is deterministic and only downsamples the named stratum") {
    val d = graft.operators.Relational.table(spark, sfDir, "documents")
    val keep = Curation.mixtureKeep(col("doc_id"), col("lang"), Map("en" -> 0.4))
    val agg = d.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(when(keep, 1).otherwise(0)).as("k"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    agg.foreach { case (lang, (n, k)) =>
      if (lang == "en") {
        // ~40% within binomial slack on 50+ docs
        assert(k < n, s"en must be downsampled: $k of $n")
      } else assert(k == n, s"$lang must be untouched: $k of $n")
    }
    // determinism: same expression evaluates to the same set twice
    val ids1 = d.filter(keep).select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = d.filter(keep).select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  test("pretrain curation is corpus curation minus decontaminated/sampled docs") {
    val base = graft.operators.Sampling.corpusCuration(spark, sfDir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val got = Curation.pretrainCuration(spark, sfDir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    // Every split shrinks (decontamination removes the benchmark family,
    // mixture sampling downsamples en) but survives non-empty.
    got.foreach { case (split, n) =>
      assert(n > 0 && n < base(split), s"$split: $n vs base ${base(split)}")
    }
  }

  test("PII redaction removes every synthetic email and phone") {
    val out = Curation.piiRedactQuery(spark, sfDir)
    val bad = out.filter(col("text_redacted").contains("@example.com") ||
      col("text_redacted").rlike("\\+\\d")).count()
    assert(bad == 0)
    val counts = out.select(sum("n_emails"), sum("n_phones"))
      .as[(Long, Long)].head()
    val n = out.count()
    assert(counts == ((n, n))) // exactly one of each was planted per doc
    assert(out.filter(col("text_redacted").contains("<EMAIL>")).count() == n)
    assert(out.filter(col("text_redacted").contains("<PHONE>")).count() == n)
  }

  test("incremental dedup drops exactly the already-known texts") {
    val existing = Seq((0L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val incoming = Seq((1L, "gamma"), (3L, "beta"), (5L, "alpha"),
      (7L, "delta")).toDF("doc_id", "text")
    val fresh = Curation.incrementalDedup(existing, incoming)
      .select("doc_id").as[Long].collect().toSet
    assert(fresh == Set(1L, 7L))
  }

  test("quality funnel stages are monotone and sum to the corpus") {
    val f = Curation.qualityFunnelQuery(spark, sfDir)
      .as[(String, Long, Long)].collect()
    val total = graft.operators.Relational.table(spark, sfDir, "documents")
      .count()
    // removed counts plus final survivors partition the corpus
    assert(f.map(_._2).sum + f.last._3 == total)
    // remaining counts never increase down the funnel
    assert(f.map(_._3).toSeq == f.map(_._3).sorted.reverse.toSeq)
  }

  test("token_length_histogram bins partition the corpus exactly") {
    val h = Curation.tokenLengthHistogram(spark, sfDir)
      .as[(Int, Long, Long)].collect()
    val d = graft.operators.Relational.table(spark, sfDir, "documents")
    assert(h.map(_._2).sum == d.count())
    val tokTotal = d.select(sum(size(split(col("text"), " ")))).as[Long].head()
    assert(h.map(_._3).sum == tokTotal)
    // bins are aligned to width 10 and strictly increasing
    assert(h.map(_._1).toSeq == h.map(_._1).sorted.toSeq)
    assert(h.forall(_._1 % 10 == 0))
  }
}
