package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.infer.Infer
import graft.types._
import graft.types.LogicalType._

class TypesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("build_struct_schema honors rename, retype, nullable, exclude") {
    val fields = Seq(
      FieldSpec("a", TInteger, nullable = false),
      FieldSpec("b", TString),
      FieldSpec("c", TDouble))
    val st = Schemas.toStructType(fields, Seq(
      FieldOverride("a", newName = Some("a2"), newType = Some(TLong)),
      FieldOverride("b", nullable = Some(false)),
      FieldOverride("c", exclude = true)))
    assert(st == StructType(Seq(
      StructField("a2", LongType, nullable = false),
      StructField("b", StringType, nullable = false))))
  }

  test("logical/spark type mapping round-trips; unknown degrades to string") {
    assert(LogicalType.fromName("TIMESTAMP") == TTimestamp)
    assert(LogicalType.fromName("whatever") == TString)
    assert(LogicalType.fromSpark(DecimalType(10, 2)) == TDouble)
    assert(LogicalType.fromSpark(ShortType) == TInteger)
    LogicalType.all.foreach(t =>
      assert(LogicalType.fromName(t.name) == t))
  }

  test("source-sample inference recovers types from stringified rows") {
    // ids avoid 0/1 (valid boolean tokens per the reference's voting set)
    val df = Seq(
      (7L, "2024-01-15", 2.5, "x"),
      (8L, "2024-02-20", 3.5, "y"),
      (9L, "2024-03-25", 4.5, "z"))
      .toDF("id", "day", "score", "tag")
    val fs = Infer.sampleSourceSchema(df, maxRows = 50)
      .map(f => f.name -> f.tpe.name).toMap
    assert(fs == Map("id" -> "long", "day" -> "date",
      "score" -> "double", "tag" -> "string"))
  }
}
