package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextSketch
import graft.operators.Dedup

/** The native MinHash/SimHash expressions must be BIT-IDENTICAL to the
  * ScalaUDF loops they replaced (same hash64, same a·h+b mod p running
  * minima, same ±1 bit votes) — the formulas are replayed here
  * driver-side and compared on real fixture shingle sets, plus plan
  * assertions that the corpus scan carries no ScalaUDF. */
class TextSketchSpec extends AnyFunSuite with SparkTestBase {

  private val MersennePrime = (1L << 31) - 1

  /** The former UDF's formula, verbatim. */
  private def udfMinHash(
      ps: Array[(Long, Long)], shingles: Seq[String]): Seq[Long] = {
    val k = ps.length
    val sig = Array.fill(k)(MersennePrime)
    shingles.foreach { s =>
      val h = java.lang.Math.floorMod(TextSketch.hash64(s), MersennePrime)
      var i = 0
      while (i < k) {
        val v = (ps(i)._1 * h + ps(i)._2) % MersennePrime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig.toSeq
  }

  /** The former SimHash UDF's formula, verbatim. */
  private def udfSimHash(shingles: Seq[String]): Long = {
    val counts = new Array[Int](64)
    shingles.foreach { s =>
      val h = TextSketch.hash64(s)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  private lazy val shingled = Dedup.shingleArrays(
    graft.operators.Relational.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(50))
    .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

  test("minhash expression matches the former UDF formula on fixture docs") {
    val ps = Dedup.perms(32, seed = 42L)
    val sh = Dedup.shingleArrays(
      graft.operators.Relational.table(spark, sfDir, "documents")
        .select(col("doc_id"), col("text")).limit(50))
    val got = sh.select(col("doc_id"),
        TextSketch.minHashCol(ps.map(_._1), ps.map(_._2), col("shg")).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, sig) =>
      assert(sig == udfMinHash(ps, shingled(id)), s"doc $id")
    }
  }

  test("simhash expression matches the former UDF formula on fixture docs") {
    val sh = Dedup.shingleArrays(
      graft.operators.Relational.table(spark, sfDir, "documents")
        .select(col("doc_id"), col("text")).limit(50))
    val got = sh.select(col("doc_id"),
        TextSketch.simHashCol(col("shg")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, s) =>
      assert(s == udfSimHash(shingled(id)), s"doc $id")
    }
  }

  test("signature plans carry no ScalaUDF and empty inputs sketch cleanly") {
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val sig = Dedup.minHashSignatures(
      graft.operators.Relational.table(spark, sfDir, "documents")
        .select(col("doc_id"), col("text")))
    val udfs = sig.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect { case u: ScalaUDF => u })
    }.flatten
    assert(udfs.isEmpty, s"ScalaUDF in the signature plan: $udfs")
    assert(sig.queryExecution.optimizedPlan.toString
      .contains("minhash_signature"))
    // Degenerate input: no shingles → all-MersennePrime signature,
    // simhash 0 (all votes negative... no votes → counts 0 → bits 0).
    import spark.implicits._
    val empty = Seq((1L, Seq.empty[String])).toDF("doc_id", "shg")
    val ps = Dedup.perms(4, seed = 7L)
    val row = empty.select(
      TextSketch.minHashCol(ps.map(_._1), ps.map(_._2), col("shg")).as("mh"),
      TextSketch.simHashCol(col("shg")).as("s")).head()
    assert(row.getSeq[Long](0) == Seq.fill(4)(MersennePrime))
    assert(row.getLong(1) == 0L)
  }
}
