package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Bit parity of the native int8-quantize expression against the
  * interpreted HOF chain it replaced — the arithmetic contract that
  * keeps the embedding_quantize oracle and the quantized-index
  * witnesses valid across the rewrite. */
class Int8QuantizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** The pre-rewrite HOF chain, verbatim (the parity reference). */
  private def hofQuantize(e: DataFrame, embCol: String): DataFrame =
    e.withColumn("ed", transform(col(embCol), v => v.cast("double")))
      .withColumn("ma", array_max(transform(col("ed"), v => abs(v))))
      .withColumn("codes",
        when(col("ma") === 0d,
          transform(col("ed"), _ => lit(0).cast("tinyint")))
        .otherwise(transform(col("ed"),
          v => round(v * lit(127.0) / col("ma")).cast("tinyint"))))
      .drop(embCol, "ed")

  private def collectQ(df: DataFrame): Map[Long, (Option[Double], Seq[Byte])] =
    df.select(col("vec_id"), col("ma"), col("codes")).collect().map { r =>
      r.getLong(0) -> (Option(r.get(1)).map(_.asInstanceOf[Double]),
        r.getSeq[Byte](2))
    }.toMap

  test("native expression equals the HOF chain on the fixture corpus") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val native = collectQ(Similarity.quantizeInt8(e))
    val hof = collectQ(hofQuantize(e, "embedding"))
    assert(native.keySet == hof.keySet)
    native.foreach { case (id, got) =>
      assert(got == hof(id), s"parity break for vec $id")
    }
  }

  test("edge vectors: zero, negative, empty, half-way rounding") {
    // 63.5/127 scaled: 0.5 * 127 = 63.5 -> HALF_UP -> 64 (away from 0),
    // and -0.5 -> -64; the 0.49999999999999994 ramp must NOT round up
    // (the Math.round(x + 0.5) bug the BigDecimal path avoids).
    val rows = Seq(
      (1L, Array(0.0f, 0.0f, 0.0f)),
      (2L, Array(-1.0f, 0.5f, -0.5f, 0.25f)),
      (3L, Array.empty[Float]),
      (4L, Array(1.0f, 0.003937f))) // ~0.5/127 scaled
    val e = rows.toDF("vec_id", "embedding")
    val native = collectQ(Similarity.quantizeInt8(e))
    val hof = collectQ(hofQuantize(e, "embedding"))
    assert(native == hof)
    assert(native(1L) == (Some(0.0), Seq[Byte](0, 0, 0)))
    assert(native(2L) == (Some(1.0), Seq[Byte](-127, 64, -64, 32)))
    assert(native(3L)._1.isEmpty && native(3L)._2.isEmpty)
  }

  test("keepDouble retains the double originals alongside the codes") {
    val e = Seq((1L, Array(0.5f, -1.0f))).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(e, keepDouble = true)
    assert(q.columns.toSeq == Seq("vec_id", "ed", "ma", "codes"))
    val r = q.head()
    assert(r.getSeq[Double](1) == Seq(0.5, -1.0))
  }

  test("NaN elements fail loudly instead of emitting silent zero codes") {
    val e = Seq((1L, Array(Float.NaN, 1.0f))).toDF("vec_id", "embedding")
    val boom = intercept[Exception] {
      Similarity.quantizeInt8(e).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(boom).exists(_.contains("NaN")))
  }
}
