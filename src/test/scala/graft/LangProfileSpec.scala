package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.LangProfile
import graft.operators.TextOps

/** Cavnar–Trenkle n-gram-profile language ID: kernel semantics, an
  * independent sequential reimplementation, codegen parity, and the
  * marker-word cross-check the profile path replaced. */
class LangProfileSpec extends AnyFunSuite with SparkTestBase {

  // Held-out natural-language sentences (NOT in the training text).
  private val heldOut = Seq(
    "en" -> "the children were reading their books in the garden while the sun was shining",
    "es" -> "los ninos estaban leyendo sus libros en el jardin mientras el sol brillaba",
    "de" -> "die kinder lasen ihre buecher im garten waehrend die sonne schien",
    "fr" -> "les enfants lisaient leurs livres dans le jardin pendant que le soleil brillait")

  test("held-out sentences classify to their language") {
    heldOut.foreach { case (lang, s) =>
      val (pred, dist) = LangProfile.classifyForTest(s)
      assert(pred == lang, s"$s -> $pred (dist=$dist)")
    }
  }

  test("normalization: case fold, punctuation/digits to spaces, padding") {
    assert(LangProfile.normalize("Hello, World! 42") == " hello world ")
    assert(LangProfile.normalize("  a   b  ") == " a b ")
    assert(LangProfile.normalize("") == " ")
    assert(LangProfile.normalize("123 !?") == " ")
  }

  /** Independent reimplementation with Scala-collection idioms (the
    * kernel uses java.util maps and manual loops): grams, ranking,
    * out-of-place distance, argmin. */
  private def referenceClassify(text: String): (String, Long) = {
    def grams(t: String): Map[String, Int] = {
      val n = LangProfile.normalize(t)
      (1 to 3).flatMap { len =>
        n.sliding(len).filter(_.exists(_ != ' '))
      }.groupBy(identity).map { case (g, occ) => g -> occ.size }
    }
    def top(t: String): Seq[String] =
      grams(t).toSeq.sortBy { case (g, c) => (-c, g) }
        .take(LangProfile.ProfileDepth).map(_._1)
    val profiles = LangProfile.TrainingText.map { case (l, tt) =>
      l -> top(tt).zipWithIndex.map { case (g, i) => g -> (i + 1) }.toMap
    }
    val doc = top(text).zipWithIndex
    val dists = profiles.map { case (l, prof) =>
      l -> doc.map { case (g, i) =>
        prof.get(g).fold(LangProfile.ProfileDepth.toLong)(r =>
          math.abs((i + 1).toLong - r))
      }.sum
    }
    dists.minBy { case (l, d) => (d, l) }
  }

  test("kernel equals an independent sequential reimplementation") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").limit(25).collect().map(_.getString(0))
    (docs ++ heldOut.map(_._2)).foreach { t =>
      assert(LangProfile.classifyForTest(t) == referenceClassify(t),
        s"divergence on: ${t.take(60)}")
    }
  }

  test("in-plan expression matches the driver kernel (codegen parity)") {
    val rows = TextOps.langId(spark, sfDir)
      .select("doc_id", "lang_pred", "ct_dist").limit(40).collect()
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (pred, dist) = LangProfile.classifyForTest(texts(r.getLong(0)))
      assert(r.getString(1) == pred && r.getLong(2) == dist)
    }
  }

  test("marker-word cross-check: strong single-language marker signal agrees") {
    // The retained marker path and the profile path must agree where
    // the marker evidence is unambiguous — the held-out sentences all
    // contain their language's closed-class markers.
    heldOut.foreach { case (lang, s) =>
      val words = s.split(" ").toSet
      val markerHits = TextOps.LangMarkers.map { case (l, ms) =>
        l -> ms.count(words.contains)
      }.toMap
      val markerBest = markerHits.maxBy { case (l, c) => (c, -l.head.toInt) }
      // Only assert when the marker vote is strict (no tie).
      if (markerHits.values.count(_ == markerBest._2) == 1)
        assert(LangProfile.classifyForTest(s)._1 == markerBest._1)
    }
    // And the full marker query still runs (the operator is retained).
    val m = TextOps.markerLangId(spark, sfDir).limit(5).collect()
    assert(m.nonEmpty && m.forall(r => Set("en", "es", "de", "fr")
      .contains(r.getString(1))))
  }

  test("empty and letterless text fall back deterministically") {
    // No grams -> every language distance is 0 -> lexicographically
    // first language wins. Pinned so both engines stay aligned.
    assert(LangProfile.classifyForTest("") == ("de", 0L))
    assert(LangProfile.classifyForTest("12345 !?") == ("de", 0L))
  }
}
