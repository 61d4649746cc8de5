package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks the most recent right row at or before left time") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:07:00"), 200.0))
      .toDF("k", "qt", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:06:00"), "t1"), // after 10:05 quote
      (1L, ts("2024-01-01 10:05:00"), "t2"), // exactly at 10:05 (inclusive)
      (1L, ts("2024-01-01 09:59:00"), "t3"), // before any quote
      (2L, ts("2024-01-01 10:08:00"), "t4"), // key 2
      (3L, ts("2024-01-01 10:08:00"), "t5")) // key with no quotes
      .toDF("k", "tt", "trade_id")
    val out = AsOfJoin.asofJoin(trades, quotes,
      key = "k", leftTime = "tt", rightTime = "qt",
      rightPayload = Seq("price"), rightTieBreak = "price")
      .select("trade_id", "price")
      .as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "t1" -> Some(101.0), "t2" -> Some(101.0), "t3" -> None,
      "t4" -> Some(200.0), "t5" -> None))
  }

  test("left row count is preserved (no fan-out, no drops)") {
    val got = AsOfJoin.asofQuery(spark, sfDir)
    val errors = graft.operators.Relational.table(spark, sfDir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "error")
    assert(got.count() == errors.count())
  }

  test("forward as-of picks the earliest purchase at or after the error") {
    import org.apache.spark.sql.functions._
    val events = graft.operators.Relational.table(spark, sfDir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("pt"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("et"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = AsOfJoin.asofForwardQuery(spark, sfDir).collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long]))
      .toMap
    errors.foreach { case (eid, uid, et) =>
      val nexts = purchases.getOrElse(uid, Array.empty).filter(_._2 >= et)
      val want =
        if (nexts.isEmpty) None
        else {
          val minT = nexts.map(_._2).min
          Some(nexts.filter(_._2 == minT).map(_._1).min)
        }
      assert(got(eid) == want, s"error $eid user $uid")
    }
  }

  test("matched purchase is never after the error") {
    import org.apache.spark.sql.functions._
    val events = graft.operators.Relational.table(spark, sfDir, "events")
      .select(col("event_id").as("purchase_event_id"),
        col("ts").as("purchase_ts"))
    val bad = AsOfJoin.asofQuery(spark, sfDir)
      .filter(col("purchase_event_id").isNotNull)
      .join(events, Seq("purchase_event_id"))
      .join(graft.operators.Relational.table(spark, sfDir, "events")
        .select(col("event_id"), col("ts")), Seq("event_id"))
      .filter(col("purchase_ts") > col("ts"))
    assert(bad.count() == 0)
  }
}
