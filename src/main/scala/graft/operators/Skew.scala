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
      // Exact integer cents (r18 discipline): coarse-group money sums
      // double-round past ~1e12 — this one reaches that at a
      // lineitem-composited gate's magnitudes.
      .agg(count(lit(1)).as("n_lines"),
        sum(round(col("l_extendedprice") * 100).cast("bigint"))
          .as("sum_cents"))
      .orderBy("o_orderstatus")
  }

  /** skew_aqe_join — the AUTOMATIC skew mitigation: AQE observes the
    * finished shuffle's per-partition sizes at runtime and splits any
    * skewed partition across extra tasks (`isSkewJoin=true` on the
    * sort-merge join), with identical results — the runtime complement
    * to [[saltedJoin]]'s up-front salting. The fixture funnels ~every
    * fact row onto ONE join key (the straggler pattern) and lowers the
    * skew thresholds so the split triggers at local scale; production
    * keeps the defaults (256 MB). Confs are scoped and restored. The
    * engine's own plan assertion ships in the hash-checked output, so
    * a regression that silently stops splitting flips the row. */
  def aqeSkewJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      // Low enough that the hot partition qualifies at EVERY test scale
      // (sf0.001's compressed hot partition is ~50KB); production keeps
      // the 256MB default.
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      // The split trades one extra shuffle-read pass for straggler
      // elimination; at these fixture sizes Spark's cost heuristic
      // would decline, so the demonstration opts in explicitly.
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of lineitem lands on hot_key 0. Two pattern requirements,
      // both scale lessons in their own right:
      //  - the dim side must reach the join DIRECTLY from its shuffle
      //    (OptimizeSkewedJoin only matches sort-merge joins whose
      //    children are sort-over-shuffle; an aggregate in between
      //    defeats it) — hence a plain projection of the nation table;
      //  - AQE splits a skewed reducer partition at MAP-TASK
      //    granularity (a sub-partition is a range of map outputs), so
      //    a single-map-task shuffle — one input file at local scale —
      //    is UNSPLITTABLE no matter how skewed. The `repartition(16)`
      //    stands in for the many map tasks any real table has.
      val fact = Relational.table(spark, dir, "lineitem")
        .repartition(16)
        .select(
          when(col("l_orderkey") % 10 =!= 0, 0L)
            .otherwise(col("l_orderkey") % 25).as("hot_key"),
          col("l_extendedprice"))
      val dim = Relational.table(spark, dir, "nation")
        .select(col("n_nationkey").cast("bigint").as("hot_key"),
          col("n_name").as("status"))
      val joined = fact.join(dim, Seq("hot_key"))
        .groupBy("status")
        // Exact integer cents (r18 discipline): ~90% of lineitem lands
        // on one group — the sum crosses 1e12 first here.
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("l_extendedprice") * 100).cast("bigint"))
            .as("sum_cents"))
      // Plan inspection must target the SAME QueryExecution that ran:
      // .orderBy would create a fresh (never-executed) one.
      val ordered = joined.orderBy("status")
      val rows = ordered.collect()
      val planStr = ordered.queryExecution.executedPlan.toString
      val split = planStr.contains("skew=true")
      rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2), split))
        .toSeq
        .toDF("status", "n_rows", "sum_cents", "skew_split_applied")
        .orderBy("status")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
