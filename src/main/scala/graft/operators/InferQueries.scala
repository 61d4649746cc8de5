package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.infer.Infer
import graft.sinks.Sinks
import graft.sources.Sources
import graft.types.{FieldOverride, FieldSpec}
import graft.types.LogicalType._

/** Driver-contract queries for the schema-inference operators of
  * SURVEY.md §2.2. Inference results are deterministic, so the oracles
  * are either golden VALUES tables or plain aggregates over the source
  * table.
  */
object InferQueries {

  private def stringCsvRoundTrip(
      spark: SparkSession, df: DataFrame, tag: String): DataFrame = {
    val out = graft.util.Scratch.dir(s"graft_$tag").resolve("data").toString
    val asStrings = df.select(df.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)
    Sinks.csvOverwrite(asStrings, out)
    val allString = StructType(df.columns.map(c => StructField(c, StringType)))
    Sources.scanCsv(spark, out, schema = Some(allString))
  }

  /** kafka_schema_sample — the reference's message-sample inference
    * (`schema_detection.py:40-165`): render a bounded, deterministic
    * sample of events as JSON message payloads (what a Kafka consumer
    * would hand over), parse, stringify, and run the voting heuristic.
    * Emits (column, type, confidence) — a golden oracle, since the
    * clean testdata infers at confidence 1.0 for every column. */
  def kafkaSchemaSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Relational.table(spark, dir, "events")
      .orderBy("event_id").limit(50)
    val payloads = events
      .select(to_json(struct(events.columns.map(col).toSeq: _*)).as("p"))
      .as[String]
    val parsed = spark.read.json(payloads)
    Infer.sampleSourceSchema(parsed)
      .map(f => (f.name, f.tpe.name, f.confidence))
      .toDF("column_name", "inferred_type", "confidence")
      .orderBy("column_name")
  }

  /** api_schema_sample — schema inference over a REST API source: page
    * the nation table through the in-process deterministic server with
    * NO declared schema (the JSON types come from read-time inference,
    * as the reference's API sampler does), then vote. */
  def apiSchemaSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nation = Relational.table(spark, dir, "nation")
    val rows = nation.orderBy("n_nationkey").collect()
    val pageSize = 5
    val fetch: String => String = { url =>
      val page = url.split("page=").last.toInt
      val slice = rows.slice(page * pageSize, (page + 1) * pageSize)
      val recs = slice.map(r =>
        s"""{"n_nationkey":${r.getInt(0)},"n_name":"${r.getString(1)}",""" +
          s""""n_regionkey":${r.getInt(2)}}""").mkString(",")
      val next =
        if ((page + 1) * pageSize < rows.length)
          s""""http://fake/api?page=${page + 1}""""
        else "null"
      s"""{"query":{"recent":[$recs]},"next":$next}"""
    }
    val sampled = Sources.scanRestApi(spark, fetch,
      Sources.ApiConfig(url = "http://fake/api?page=0",
        dataKey = Some("query.recent"), nextKey = Some("next"),
        maxPages = 100), schema = None)
    Infer.sampleSourceSchema(sampled)
      .map(f => (f.name, f.tpe.name, f.confidence))
      .toDF("column_name", "inferred_type", "confidence")
      .orderBy("column_name")
  }

  /** infer_types — stringify `orders` through CSV (losing all type info),
    * re-infer with the voting heuristic; emits (column, type, confidence). */
  def inferTypes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Relational.table(spark, dir, "orders")
    val asStr = stringCsvRoundTrip(spark, orders, "infer")
    Infer.inferTypes(asStr)
      .map(f => (f.name, f.tpe.name, f.confidence))
      .toDF("column_name", "inferred_type", "confidence")
      .orderBy("column_name")
  }

  /** column_stats — per-column null/distinct counters and numeric
    * min/max over `customer`. */
  def columnStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Relational.table(spark, dir, "customer")
    Infer.columnStats(cust)
      .map(f => (f.name, f.nullCount, f.uniqueCount,
        f.min.map(_.toDouble), f.max.map(_.toDouble)))
      .toDF("column_name", "null_count", "unique_count", "min_val", "max_val")
      .orderBy("column_name")
  }

  /** schema_compat_check — three CSVs: the reference schema, one with a
    * missing column, one with an extra column. */
  def compatCheck(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = graft.util.Scratch.dir("graft_compat")
    val cust = Relational.table(spark, dir, "customer").limit(20)
    Sinks.csvOverwrite(cust, base.resolve("f0").toString)
    Sinks.csvOverwrite(cust.drop("c_acctbal"), base.resolve("f1").toString)
    Sinks.csvOverwrite(cust.withColumn("extra_col", lit(1)),
      base.resolve("f2").toString)
    val paths = Seq("f0", "f1", "f2").map(base.resolve(_).toString)
    Infer.compatCheck(spark, paths, p => Sources.scanCsv(spark, p))
      .zipWithIndex
      .map { case (fc, i) =>
        (i, fc.compatible, fc.missing.size, fc.extra.size) }
      .toDF("file_idx", "compatible", "n_missing", "n_extra")
      .orderBy("file_idx")
  }

  /** detect_confidence — 0.7·avg(field conf) + 0.3·compat ratio, with the
    * compat set of compatCheck (1 of 3 compatible). */
  def detectConfidence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fields = Seq(
      FieldSpec("a", TLong, confidence = 1.0),
      FieldSpec("b", TString, confidence = 1.0))
    val compat = Seq(
      Infer.FileCompat("f0", compatible = true, Nil, Nil),
      Infer.FileCompat("f1", compatible = false, Seq("c_acctbal"), Nil),
      Infer.FileCompat("f2", compatible = false, Nil, Seq("extra_col")))
    // overallConfidence already rounds to 3 decimals (reference parity).
    Seq(Infer.overallConfidence(fields, compat))
      .toDF("overall_confidence")
  }

  /** field_override — rename + re-type + exclude applied before bronze. */
  def fieldOverride(spark: SparkSession, dir: String): DataFrame = {
    val cust = Relational.table(spark, dir, "customer")
    val fields = graft.types.Schemas.fromStructType(cust.schema)
    Bronze.applyOverrides(cust, fields, Seq(
      FieldOverride("c_name", newName = Some("customer_name")),
      FieldOverride("c_nationkey", newType = Some(TLong)),
      FieldOverride("c_acctbal", exclude = true)))
      .orderBy("c_custkey")
  }

  /** sample_rows_synthesis — 10 rows cycling fixed sample values. */
  def sampleRowsSynthesis(spark: SparkSession, dir: String): DataFrame = {
    val fields = Seq(
      FieldSpec("name", TString, sampleValues = Seq("alice", "bob", "carol")),
      FieldSpec("age", TLong, sampleValues = Seq("30", "40")),
      FieldSpec("active", TBoolean, sampleValues = Seq("yes", "no")),
      FieldSpec("joined", TDate, sampleValues = Seq("2024-01-15")),
      FieldSpec("score", TDouble))
    Infer.synthesizeRows(spark, fields, 10)
      .withColumn("row_id", monotonically_increasing_id())
      .orderBy("row_id")
  }
}
