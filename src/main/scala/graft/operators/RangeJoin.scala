package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join. Spark's optimizer turns a pure
  * range predicate (no equi key) into a nested-loop join — O(n·m)
  * comparisons and, when neither side fits in memory, a broadcast that
  * OOMs. The scalable plan is bin bucketing: quantize time into
  * fixed-width bins, replicate each interval into the bins it overlaps,
  * give each point its single bin, then EQUI-join on the bin and
  * re-check the exact containment predicate. The join shuffles on a
  * well-distributed key, partial aggregation applies, and the
  * comparison count drops from n·m to sum-over-bins(points_in_bin ×
  * intervals_touching_bin).
  *
  * Correctness: a point lies in exactly ONE bin, so a (point, interval)
  * pair can only meet once — no dedup step is needed. Bin width trades
  * interval replication (wide intervals → many bins) against join
  * selectivity (wide bins → more false candidates); at scale set it
  * near the median interval length.
  */
object RangeJoin {

  /** Equi-joinable bin id of an epoch-microsecond value. */
  private def binOf(tsMicros: org.apache.spark.sql.Column, widthMicros: Long) =
    floor(tsMicros / widthMicros)

  /** Join `points` (timestamp column `pointTs`) to `intervals`
    * (timestamp columns `startCol` inclusive, `endCol` exclusive).
    * Returns one row per (point, containing interval) with all columns
    * of both inputs. `binWidthSec` is the quantization width. */
  def pointInInterval(
      points: DataFrame, pointTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidthSec: Long): DataFrame = {
    require(binWidthSec > 0, s"binWidthSec must be positive: $binWidthSec")
    val w = binWidthSec * 1000000L
    val p = points.withColumn("_bin",
      binOf(unix_micros(col(pointTs)), w))
    val i = intervals.withColumn("_bin",
      explode(sequence(
        binOf(unix_micros(col(startCol)), w),
        binOf(unix_micros(col(endCol)), w))))
    p.join(i, Seq("_bin"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("_bin")
  }

  /** range_join driver query — count events falling in each of 60
    * maintenance-style windows (every 12 h from 2024-01-01, 8 h long —
    * the events table spans January 2024). Windows are built from epoch
    * microseconds so an external engine derives bit-identical bounds.
    * Bin width = 6 h, so each 8 h interval replicates into at most 3
    * bins. */
  def rangeJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val events = Relational.table(spark, dir, "events")
      .select(col("event_id"), col("ts"))
    val baseMicros = 1704067200000000L // 2024-01-01T00:00:00Z
    val hourMicros = 3600000000L
    val windows = spark.range(60).select(
      col("id").as("w_id"),
      timestamp_micros(lit(baseMicros) + col("id") * (12 * hourMicros))
        .as("w_start"),
      timestamp_micros(lit(baseMicros) + col("id") * (12 * hourMicros)
        + lit(8 * hourMicros)).as("w_end"))
    pointInInterval(events, "ts", windows, "w_start", "w_end",
      binWidthSec = 6 * 3600L)
      .groupBy("w_id")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("w_id")
  }
}
