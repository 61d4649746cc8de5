package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-match) join — for each left row, the single right
  * row with the greatest right-time ≤ left-time within the same key;
  * left rows with no prior right row keep nulls.
  *
  * Spark has no built-in as-of join. Rather than a custom
  * LogicalPlan/SparkStrategy, this composes built-ins (preference (a)
  * of the build guidelines): tag both sides, union, and run one
  * `last(_, ignoreNulls)` window over (key, time). The physical plan is
  * exactly what a dedicated sort-merge as-of operator would do — ONE
  * hash shuffle on the key and ONE sort per partition — so it scales
  * identically, with skew handled by AQE like any other window.
  */
object AsOfJoin {

  /** Generic as-of join. `rightPayload` names the right-side columns to
    * carry; they arrive nullable (no match ⇒ null). Right rows sort
    * before left rows at equal timestamps, giving inclusive (≤)
    * semantics. Ties inside the right side at the same (key, time) are
    * broken deterministically: the MAX `rightTieBreak` payload wins
    * (ASOF-join engines leave right-side ties unspecified; pinning the
    * max makes the result reproducible and oracle-comparable — the
    * DuckDB oracle pins the same tie-break explicitly).
    *
    * Right rows with a null `rightTime` are dropped before the merge:
    * under ASOF semantics a null timestamp can never satisfy
    * right-time ≤ left-time, but a nulls-first sort would otherwise let
    * such a row be carried forward as a spurious "prior" match. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTieBreak: String,
      direction: String = "backward"): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightNn = right.filter(col(rightTime).isNotNull)
    val l = left.select(
      col(key).as("__key"), col(leftTime).as("__t"),
      lit(1).as("__is_left"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(right.select(
        struct((rightPayload :+ rightTieBreak).distinct.map(col): _*))
        .schema.fields.head.dataType).as("__r"))
    val r = rightNn.select(
      col(key).as("__key"), col(rightTime).as("__t"),
      lit(0).as("__is_left"),
      lit(null).cast(left.select(struct(leftCols.map(col): _*))
        .schema.fields.head.dataType).as("__l"),
      struct((rightPayload :+ rightTieBreak).distinct.map(col): _*).as("__r"))
    // backward: ascending time scan — last() sees the greatest right
    // time ≤ left time (MAX tie-break wins at equal right times).
    // forward: the mirror image — descending time scan, so last() sees
    // the SMALLEST right time ≥ left time (MIN tie-break wins). In both
    // scans, right rows sort before the left row at equal timestamps,
    // giving inclusive semantics.
    val w = (direction match {
      case "backward" => Window.partitionBy(col("__key"))
        .orderBy(col("__t").asc, col("__is_left").asc,
          col(s"__r.$rightTieBreak").asc_nulls_first)
      case "forward" => Window.partitionBy(col("__key"))
        .orderBy(col("__t").desc, col("__is_left").asc,
          col(s"__r.$rightTieBreak").desc_nulls_first)
      case other => throw new IllegalArgumentException(
        s"direction must be backward/forward, got '$other'")
    }).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
    val out = leftCols.map(c => col(s"__l.$c").as(c)) ++
      rightPayload.map(c => col(s"__m.$c").as(c))
    matched.select(out: _*)
  }

  /** asof_join driver query — for every 'error' event, the most recent
    * prior 'purchase' by the same user (micro-second precision; the
    * oracle casts DuckDB's nanosecond timestamps down to match). */
  def asofQuery(spark: SparkSession, dir: String): DataFrame = {
    val events = Relational.table(spark, dir, "events")
    val errors = events.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_event_id"))
    asofJoin(errors, purchases,
      key = "user_id", leftTime = "ts", rightTime = "ts",
      rightPayload = Seq("purchase_event_id"),
      rightTieBreak = "purchase_event_id")
      .select("event_id", "user_id", "purchase_event_id")
      .orderBy("event_id")
  }

  /** asof_join_forward driver query — for every 'error' event, the NEXT
    * 'purchase' by the same user (the attribution direction: which
    * conversion followed this failure). Same one-shuffle one-sort plan
    * as the backward join, scanned in mirror order. */
  def asofForwardQuery(spark: SparkSession, dir: String): DataFrame = {
    val events = Relational.table(spark, dir, "events")
    val errors = events.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("next_purchase_event_id"))
    asofJoin(errors, purchases,
      key = "user_id", leftTime = "ts", rightTime = "ts",
      rightPayload = Seq("next_purchase_event_id"),
      rightTieBreak = "next_purchase_event_id",
      direction = "forward")
      .select("event_id", "user_id", "next_purchase_event_id")
      .orderBy("event_id")
  }
}
