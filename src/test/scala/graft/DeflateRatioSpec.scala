package graft

import java.util.zip.{Deflater, Inflater}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.DeflateRatio
import graft.operators.{Relational, TextOps}

class DeflateRatioSpec extends AnyFunSuite with SparkTestBase {

  /** Independent reference: a fresh Deflater per call, and the
    * roundtrip proof that the counted bytes are a real DEFLATE stream. */
  private def refDeflate(s: String): Array[Byte] = {
    val in = s.getBytes("UTF-8")
    val d = new Deflater(6, true)
    d.setInput(in); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(bytes: Array[Byte], rawLen: Int): Array[Byte] = {
    val inf = new Inflater(true)
    inf.setInput(bytes)
    val out = new Array[Byte](rawLen)
    val n = inf.inflate(out)
    assert(inf.finished(), "stream must be complete")
    inf.end()
    assert(n == rawLen)
    out
  }

  test("kernel counts a real DEFLATE stream and matches a fresh deflater") {
    val samples = Seq("", "a", "spark " * 50,
      (0 until 64).map(i => f"tok$i%03d").mkString(" "),
      "mixed UNICODE émoji é世界 end")
    samples.foreach { s =>
      val ref = refDeflate(s)
      assert(DeflateRatio.deflateLenOf(s) == ref.length, s"len for '$s'")
      if (s.nonEmpty)
        assert(inflate(ref, s.getBytes("UTF-8").length)
          .sameElements(s.getBytes("UTF-8")))
    }
  }

  test("expression matches the driver kernel over corpus docs, in-plan") {
    val docs = Relational.table(spark, sfDir, "documents")
      .filter(col("doc_id") < 64)
      .select(col("doc_id"), col("text"),
        DeflateRatio.deflateLenCol(col("text")).as("clen"))
      .collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      assert(r.getInt(2) == DeflateRatio.deflateLenOf(r.getString(1)),
        s"doc ${r.getLong(0)}")
    }
  }

  test("ratio discriminates repetition from diversity at equal length") {
    val rep = "spark " * 80
    val div = (0 until 80).map(i => f"w$i%04x").mkString(" ") + " "
    assert(rep.length == div.length)
    assert(DeflateRatio.deflateLenOf(rep) < DeflateRatio.deflateLenOf(div))
  }

  test("text_compression_ratio query: witnesses hold, count independent") {
    val row = TextOps.compressionRatioQuery(spark, sfDir).collect()(0)
    val want = Relational.table(spark, sfDir, "documents")
      .filter(length(col("text")) >= 200).count()
    assert(row.getLong(0) == want)
    assert(row.getBoolean(1), "ratios_valid")
    assert(row.getBoolean(2), "all_compress")
    assert(row.getBoolean(3), "repetition_ranks_lower")
  }
}
