package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: key salting.
  *
  * A shuffled join hash-partitions both sides by the key, so one hot
  * key lands its entire payload on one task — the straggler that
  * dominates wall-clock at scale. Salting splits each hot key into
  * `salts` sub-keys: the fact side adds a deterministic salt column,
  * the dimension side is replicated once per salt value, and the join
  * runs on (key, salt) — the hot key's rows now spread over `salts`
  * tasks, at the cost of a `salts`× replication of the (small) build
  * side. AQE's skew-join split is the automatic runtime variant; the
  * explicit form remains the tool when the skew is known up front or
  * the optimizer's thresholds don't trigger.
  */
object Skew {

  /** Inner equi-join of `fact` to `dim` on `key`, salted `salts` ways.
    * `saltExpr` should be deterministic per fact row (e.g. a pmod of
    * some per-row attribute) so the plan stays reproducible. The salt
    * is normalized internally — `pmod(_, salts)` with nulls coalesced
    * to 0 — so an out-of-range or null salt can never silently drop
    * fact rows from the inner join; any salt expression only changes
    * the execution distribution, never the semantics. */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, saltExpr: Column): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val saltCol = "__graft_salt"
    val bounded = coalesce(pmod(saltExpr.cast("int"), lit(salts)), lit(0))
    val f = fact.withColumn(saltCol, bounded)
    val d = dim.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, Seq(key, saltCol)).drop(saltCol)
  }

  /** Write a DataFrame as a bucketed, per-bucket-sorted parquet table
    * (external location, catalog-registered — bucketing metadata lives
    * in the catalog, which is why this is saveAsTable and not a plain
    * path write). */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      key: String, buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** bucketed_join — the co-located join: both sides written bucketed
    * on the join key, so the join consumes the bucket layout and runs
    * with NO shuffle on either side (asserted in RelationalSpec). At
    * 100 TB this is the difference between re-shuffling the fact table
    * on every join and paying the partitioning once at write time.
    * Output aggregated so the oracle is the plain SQL join. */
  def bucketedJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.util.Scratch.dir("graft_bucket")
    val li = Relational.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val o = Relational.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    writeBucketed(li, "graft_li_b", base.resolve("li").toString, "l_orderkey")
    writeBucketed(o, "graft_o_b", base.resolve("o").toString, "o_orderkey")
    try {
      spark.table("graft_li_b")
        .join(spark.table("graft_o_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("o_orderstatus")
        // materialize before dropping the catalog entries
        .localCheckpoint(true)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_li_b")
      spark.sql("DROP TABLE IF EXISTS graft_o_b")
    }
  }

  /** skew_salted_join — lineitem⋈orders salted 8 ways, aggregated so
    * the oracle is the plain SQL join: proves salting changes the
    * execution distribution, never the semantics. */
  def skewSaltedJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = Relational.table(spark, dir, "lineitem")
      .withColumnRenamed("l_orderkey", "orderkey")
    val o = Relational.table(spark, dir, "orders")
      .withColumnRenamed("o_orderkey", "orderkey")
      .select(col("orderkey"), col("o_orderstatus"))
    saltedJoin(li, o, "orderkey", salts = 8,
        saltExpr = pmod(col("l_linenumber"), lit(8)))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy("o_orderstatus")
  }
}
