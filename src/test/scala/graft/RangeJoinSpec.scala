package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{RangeJoin, Relational, RelationalExt}

class RangeJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("binned range join equals the naive range predicate") {
    val points = Seq(
      (1L, ts("2024-01-01 00:30:00")),
      (2L, ts("2024-01-01 07:59:59")),
      (3L, ts("2024-01-01 08:00:00")), // end-exclusive: outside w0
      (4L, ts("2024-01-02 13:00:00")),
      (5L, ts("2024-03-01 00:00:00"))) // outside every window
      .toDF("p_id", "t")
    val intervals = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 08:00:00")),
      (11L, ts("2024-01-01 06:00:00"), ts("2024-01-01 09:00:00")), // overlaps 10
      (12L, ts("2024-01-02 12:00:00"), ts("2024-01-02 20:00:00")))
      .toDF("i_id", "s", "e")
    val got = RangeJoin.pointInInterval(points, "t", intervals, "s", "e",
        binWidthSec = 3600)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    val want = points.join(intervals,
        col("t") >= col("s") && col("t") < col("e"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 12L)))
  }

  test("a point meets a multi-bin interval exactly once (no dup pairs)") {
    val points = Seq((1L, ts("2024-01-01 05:00:00"))).toDF("p_id", "t")
    // interval spans 10 one-hour bins
    val intervals = Seq((7L, ts("2024-01-01 00:00:00"),
      ts("2024-01-01 10:00:00"))).toDF("i_id", "s", "e")
    val got = RangeJoin.pointInInterval(points, "t", intervals, "s", "e",
      binWidthSec = 3600).count()
    assert(got == 1)
  }

  test("plan equi-joins on the bin — no nested-loop join") {
    val q = RangeJoin.rangeJoinQuery(spark, sfDir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"),
      s"range join must not be a nested-loop join:\n$plan")
  }

  test("range_join query counts match an independent filter per window") {
    val events = Relational.table(spark, sfDir, "events")
    val got = RangeJoin.rangeJoinQuery(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    // independently: window 0 is [2024-01-01 00:00, 08:00) UTC
    val w0 = events.filter(
      unix_micros(col("ts")) >= 1704067200000000L &&
      unix_micros(col("ts")) < 1704067200000000L + 8L * 3600000000L).count()
    assert(got.getOrElse(0L, 0L) == w0)
    assert(got.values.forall(_ > 0)) // emitted groups are non-empty
  }

  test("pivot_table equals conditional aggregation") {
    val li = Relational.table(spark, sfDir, "lineitem")
    val want = li.groupBy("l_returnflag")
      .agg(
        round(sum(when(col("l_linestatus") === "F", col("l_quantity"))
          .otherwise(0.0)), 2).as("qty_f"),
        round(sum(when(col("l_linestatus") === "O", col("l_quantity"))
          .otherwise(0.0)), 2).as("qty_o"))
      .orderBy("l_returnflag")
      .as[(String, Double, Double)].collect().toSeq
    val got = RelationalExt.pivotTable(spark, sfDir)
      .as[(String, Double, Double)].collect().toSeq
    assert(got == want)
  }
}
