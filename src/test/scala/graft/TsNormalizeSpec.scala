package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** The fixture's `events.ts` physical type has ALREADY changed once
  * between testdata generations (TIMESTAMP(NANOS) → TIMESTAMP(MICROS,
  * NTZ)), silently corrupting every event-time query. These cases pin
  * the contract of [[Relational.normalizeTs]]: all three observed/legal
  * forms — epoch-nanos Long, TIMESTAMP_NTZ micros, TIMESTAMP micros —
  * normalize to the SAME TimestampType values, and any other form fails
  * loudly naming the observed type (never a silent wrong answer). */
class TsNormalizeSpec extends AnyFunSuite with SparkTestBase {

  /** One parquet fixture per physical form, derived from the same five
    * instants, written through Spark's own writer so the footers carry
    * exactly the logical types a real generation would. */
  private lazy val forms: Map[String, String] = {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tsforms")
    val micros = Seq(1704067200000000L, 1704070800123456L, 1704074400999999L,
      1704078000000001L, 1704081600500000L)
    val ids = micros.indices.map(_.toLong)
    val ltz = ids.zip(micros).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    val out = Map(
      "nanos-long" -> ltz.select(col("event_id"),
        (unix_micros(col("ts")) * 1000L).as("ts")),
      "micros-ntz" -> ltz.select(col("event_id"),
        col("ts").cast(TimestampNTZType).as("ts")),
      "micros-ltz" -> ltz)
    out.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite")
        .parquet(base.resolve(name).toString)
    }
    out.keys.map(n => n -> base.resolve(n).toString).toMap
  }

  test("all three ts physical forms normalize to identical TimestampType values") {
    val normalized = forms.map { case (name, path) =>
      val df = Relational.normalizeTs(spark.read.parquet(path))
      assert(df.schema("ts").dataType == TimestampType, s"$name schema")
      name -> df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq
    }
    val expect = normalized("micros-ltz")
    assert(expect.map(_._2) ==
      Seq(1704067200000000L, 1704070800123456L, 1704074400999999L,
        1704078000000001L, 1704081600500000L))
    normalized.foreach { case (name, vals) =>
      assert(vals == expect, s"$name disagrees with micros-ltz")
    }
  }

  test("a raw-Long ts too small for epoch-nanos fails loudly (micros/millis trap)") {
    import spark.implicits._
    // 2024-01-01 as epoch-MICROS shipped in a Long column: dividing by
    // 1000 as if nanos would silently land in 1970 — must throw instead.
    val micros = Seq((1L, 1704067200000000L)).toDF("event_id", "ts")
    val e = intercept[RuntimeException](
      Relational.normalizeTs(micros).collect())
    assert(e.getMessage.contains("too small for"), e.getMessage)
  }

  test("an unhandled ts type fails loudly naming the observed type") {
    import spark.implicits._
    val bad = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    val e = intercept[RuntimeException](Relational.normalizeTs(bad))
    assert(e.getMessage.contains("StringType"), e.getMessage)
    assert(e.getMessage.contains("unhandled"), e.getMessage)
  }

  test("the live fixture's events.ts is one of the handled forms end-to-end") {
    // Whatever form the current testdata generation carries, table()
    // must yield TimestampType with plausibly-modern instants (not the
    // near-epoch collapse a wrong unit conversion produces).
    val ev = Relational.table(spark, sfDir, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    val minYear = ev.agg(min(year(col("ts")))).head().getInt(0)
    assert(minYear >= 2000, s"ts collapsed toward epoch: min year $minYear")
  }
}
