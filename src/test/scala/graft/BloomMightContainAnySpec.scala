package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** The per-row bloom probe that keeps bloom MANIFESTS off the driver:
  * each index row carries its own serialized filter; the expression
  * tests a fixed probe-hash set against it in-plan. */
class BloomMightContainAnySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def bloomOf(keys: Seq[Long]): Array[Byte] = {
    val bf = BloomFilter.create(1000, 1 << 16)
    keys.foreach(bf.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("kernel: any-contained over a row's own filter, no false negatives") {
    val bytes = bloomOf(Seq(1L, 2L, 3L))
    assert(graft.functions.BloomMightContainAny.anyContained(
      bytes, Array(99L, 2L)))
    assert(!graft.functions.BloomMightContainAny.anyContained(
      bytes, Array(1000001L)) ||
      true) // fpp sliver allowed: a positive is never wrong, only wasteful
    assert(graft.functions.BloomMightContainAny.anyContained(
      bytes, Array(3L)))
  }

  test("in-plan filter over a serialized-bloom column selects the right rows") {
    // Three "files", disjoint key ranges; probes hit files a and c.
    val rows = Seq(
      ("a", bloomOf(0L until 100L)),
      ("b", bloomOf(100L until 200L)),
      ("c", bloomOf(200L until 300L)))
    val idx = rows.toDF("file", "bf")
    val probes = Array(42L, 250L)
    val got = idx
      .filter(graft.functions.BloomMightContainAny(col("bf"), probes))
      .select("file").as[String].collect().toSet
    assert(got.contains("a") && got.contains("c"),
      "bloom probes can never miss a file that holds a probe key")
    // b may appear only as an fpp fluke (1 Mbit over 100 keys: ~never).
    assert(got.size <= 3)
    // NULL bloom rows are skipped, not crashed on.
    val withNull = idx.unionByName(
      Seq(("d", null.asInstanceOf[Array[Byte]])).toDF("file", "bf"))
    val gotN = withNull
      .filter(graft.functions.BloomMightContainAny(col("bf"), probes))
      .select("file").as[String].collect().toSet
    assert(!gotN.contains("d"))
  }
}
