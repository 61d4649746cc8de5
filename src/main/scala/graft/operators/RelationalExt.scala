package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operators BEYOND the reference's demonstrated surface
  * (SURVEY.md §2.4 lists them as absent) — a user switching engines
  * gets them for free from Catalyst, so they are first-class here:
  * semi/anti joins, set operations, rollup aggregation, order-by-limit
  * top-k, distinct, and approximate-distinct sketches.
  */
object RelationalExt {

  /** join_semi — customers that have at least one open order (EXISTS).
    * A semi join shuffles only the key column of the probe side and
    * stops at first match. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Relational.table(spark, dir, "customer")
    val open = Relational.table(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    cust.join(open, Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** join_anti — customers with no orders at all (NOT EXISTS). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Relational.table(spark, dir, "customer")
    val keys = Relational.table(spark, dir, "orders")
      .select(col("o_custkey").as("c_custkey"))
    cust.join(keys, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** set_ops — INTERSECT and EXCEPT of two nation-key projections,
    * disambiguated with a tag column and unioned into one result. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val custNations = Relational.table(spark, dir, "customer")
      .select(col("c_nationkey").as("nationkey")).distinct()
    val suppNations = Relational.table(spark, dir, "supplier")
      .select(col("s_nationkey").as("nationkey")).distinct()
    val both = custNations.intersect(suppNations)
      .withColumn("op", lit("both"))
    val custOnly = custNations.except(suppNations)
      .withColumn("op", lit("customer_only"))
    both.unionByName(custOnly).orderBy("op", "nationkey")
  }

  /** rollup_agg — hierarchical totals over region→nation with grand
    * total; null grouping levels rendered as sentinels so the hash
    * comparison is null-ambiguity-free. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    val cust = Relational.table(spark, dir, "customer")
    val nat = Relational.table(spark, dir, "nation")
    val reg = Relational.table(spark, dir, "region")
    cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .select(
        coalesce(col("r_name"), lit("<all>")).as("r_name"),
        coalesce(col("n_name"), lit("<all>")).as("n_name"),
        col("n_customers"))
      .orderBy("r_name", "n_name")
  }

  /** topk_orderby_limit — global top-k via ORDER BY LIMIT (Spark plans
    * this as TakeOrderedAndProject: per-partition heaps, no full sort). */
  def topKOrderByLimit(spark: SparkSession, dir: String): DataFrame =
    Relational.table(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_totalprice")

  /** distinct_rows — SELECT DISTINCT over a projection. */
  def distinctRows(spark: SparkSession, dir: String): DataFrame =
    Relational.table(spark, dir, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** approx_distinct — HLL++ sketch count with a self-asserted error
    * bound: sketch estimates differ across engines, so the emitted row
    * carries the EXACT count plus a boolean "estimate within 5% of
    * exact", which any engine can verify. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Relational.table(spark, dir, "lineitem")
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .select(
        col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts"))
          .cast("double") / col("exact_parts") < 0.05)
          .as("approx_within_5pct"))

  /** sketch_count_min — point-frequency estimation from Spark's own
    * mergeable Count-Min sketch (`count_min_sketch` aggregate — a
    * built-in exists, so no custom aggregate; one partial-aggregated
    * corpus pass, O(w·d) state per partition). Sketch BYTES are
    * engine-specific, so the driver-checked row carries the exact
    * frequencies (oracle-computable) plus the two CM guarantees as
    * engine-asserted booleans over a bounded probe-key set: estimates
    * never undercount (structural), and stay within εN above the truth
    * (holds deterministically for the fixed seed). Mergeability — THE
    * property that makes the sketch usable as a stored daily partial à
    * la [[graft.operators.Packing.hllStoreQuery]] — is witnessed by
    * building per-half sketches, merging, and asserting every probe
    * estimate equals the whole-corpus sketch's (CM merge is exact
    * cell-wise addition, so for a fixed seed the equality is exact). */
  def countMinQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    val eps = 0.001
    val conf = 0.99
    val seed = 42
    val li = Relational.table(spark, dir, "lineitem")
      .select(col("l_partkey"))
    def sketchOf(df: org.apache.spark.sql.DataFrame): CountMinSketch =
      df.stat.countMinSketch(col("l_partkey"), eps, conf, seed)
    val whole = sketchOf(li)
    val merged = sketchOf(li.filter(col("l_partkey") % 2 === 0))
    merged.mergeInPlace(sketchOf(li.filter(col("l_partkey") % 2 =!= 0)))
    val n = whole.totalCount()
    val probes = Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L)
    val exact = li.filter(col("l_partkey").isin(probes: _*))
      .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    import spark.implicits._
    probes.map { k =>
      val est = whole.estimateCount(k)
      val ex = exact.getOrElse(k, 0L)
      (k, ex,
        est >= ex,
        // ceil, not truncate: the CM guarantee is est <= ex + eps*N; a
        // floor'd bound is STRICTER than the sketch promises and could
        // flip deterministically on a data regeneration or SF change.
        est <= ex + math.ceil(eps * n).toLong,
        merged.estimateCount(k) == est)
    }.toDF("l_partkey", "exact_cnt", "no_undercount",
      "within_eps_n", "merge_exact")
      .orderBy("l_partkey")
  }

  /** approx_quantile — percentile_approx (GK sketch) with a
    * self-asserted error bound against the exact discrete median:
    * sketch internals differ across engines, so the oracle checks the
    * exact value plus the engine's own "approx within 1%" assertion
    * (the approx_distinct pattern). At 100 TB the sketch is the only
    * option — it partial-aggregates and never materializes a sort. */
  def approxQuantile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Relational.table(spark, dir, "lineitem")
    val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    val exact = li
      .select(col("l_returnflag"), col("l_extendedprice"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("l_returnflag")).as("n"))
      .filter(col("rn") === ceil(col("n") * 0.5))
      .select(col("l_returnflag"), col("l_extendedprice").as("exact_p50"))
    val approx = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
        .as("approx_p50"))
    exact.join(approx, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_p50"),
        (abs(col("approx_p50") - col("exact_p50")) /
          col("exact_p50") < 0.01).as("approx_within_1pct"))
      .orderBy("l_returnflag")
  }

  /** grouping_sets — CUBE aggregation with grouping_id: every
    * combination of the two keys plus both margins and the grand total
    * in ONE pass (Spark expands the grouping sets inside a single
    * partial+final aggregation, not one scan per set). */
  def groupingSets(spark: SparkSession, dir: String): DataFrame =
    Relational.table(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** time_resample — fixed-interval resampling with gap fill: generate
    * the complete hourly spine between the feed's min and max event
    * time and left-join the hourly aggregates, zero-filling empty
    * buckets — the normalization every sensor/metrics consumer needs
    * before windowed models. The spine derives from a single-row
    * min/max aggregate (broadcast to the join), the hourly aggregation
    * is partial+final, and the spine row count is bounded by the time
    * range, not the data volume. */
  def timeResample(spark: SparkSession, dir: String): DataFrame = {
    // Exact integer cents (the r16 sink-query discipline): per-row
    // round(value·100) is engine-stable — the 2-decimal source makes
    // every product land within float error of an integer — and the
    // BIGINT sum is order-independent at ANY corpus size, where a
    // 2dp-rounded double sum diverges across engines once accumulated
    // error reaches the half-cent boundary.
    val ev = Relational.table(spark, dir, "events")
      .select(col("ts"),
        round(col("value") * 100).cast("bigint").as("cents"))
    val bounds = ev.agg(
      date_trunc("hour", min(col("ts"))).as("lo"),
      date_trunc("hour", max(col("ts"))).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 hour")))
        .as("h"))
    val hourly = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"))
    spine.join(hourly, Seq("h"), "left")
      .select(
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_cents"), lit(0L)).as("sum_cents"))
      .orderBy("hour")
  }

  /** pivot_table — wide-format conditional aggregation
    * (groupBy().pivot().agg()). The pivot VALUES ARE PASSED EXPLICITLY:
    * without them Spark runs an extra distinct-collect job over the
    * whole table just to discover the columns — at 100 TB that is a
    * full scan before the real one, and an unbounded output schema.
    * With explicit values the plan is a single partial+final hash
    * aggregation, identical in shape to a CASE-WHEN rollup. Cells with
    * no input rows surface as 0.0 (coalesced), matching the conditional
    * -sum semantics an external engine computes. */
  def pivotTable(spark: SparkSession, dir: String): DataFrame = {
    val p = Relational.table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(col("l_quantity")), 2))
    p.select(col("l_returnflag"),
        coalesce(col("F"), lit(0.0)).as("qty_f"),
        coalesce(col("O"), lit(0.0)).as("qty_o"))
      .orderBy("l_returnflag")
  }

  /** json_flatten — extract typed fields out of a JSON payload column
    * (the universal bronze-layer chore for event streams). A scalar
    * JSON-path projection per row: no shuffle, column-prunes to just
    * the payload at scan time. */
  def jsonFlatten(spark: SparkSession, dir: String): DataFrame =
    Relational.table(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("prop_k"))
      .orderBy("event_id")

  /** upsert_latest_by_key — collapse an append-only event log to the
    * latest record per key (CDC-style upsert materialization): one
    * window per key ordered by (event-time micros, id) — the explicit
    * microsecond ordering keeps "latest" identical across engines with
    * different timestamp precisions. At scale this is one hash
    * shuffle on the key, the same as the merge any lakehouse upsert
    * performs. */
  def latestByKey(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    Relational.table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"), col("ts_us"))
      .orderBy("user_id")
  }

  /** sessionize — split each user's event stream into sessions at
    * inactivity gaps (here 30 min): a lag window marks session starts,
    * a running sum numbers them, and a final aggregate emits per-session
    * spans. Two windows plus one aggregation, all partitioned by
    * user_id — one hash shuffle total, no global sort. Ordering inside
    * a user is by explicit (event-time micros, id), engine-neutral. */
  def sessionize(
      spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val gapUs = gapMinutes * 60L * 1000000L
    Relational.table(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("is_new",
        when(col("ts_us") - lag(col("ts_us"), 1).over(byTime) > gapUs
          || lag(col("ts_us"), 1).over(byTime).isNull, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("is_new")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
      .orderBy("user_id", "session_idx")
  }

  /** column_quantiles — EXACT grouped percentiles, discrete form: the
    * data element at rank ceil(p·n) in value order (percentile_disc).
    * Discrete, not interpolated, deliberately: an interpolated midpoint
    * is fresh floating-point arithmetic whose last ulp differs between
    * engines and flips rounding at .xx5 boundaries, while a selected
    * ELEMENT is bit-identical everywhere. The exact form is the
    * correctness oracle for the sketch-based `approx_percentile` one
    * would substitute at 100 TB; the window partitions by group, so no
    * single global sort. */
  def columnQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    val part = Window.partitionBy("l_returnflag")
    val ranked = Relational.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        row_number().over(byVal).as("rn"),
        count(lit(1)).over(part).as("n"))
    def pick(p: Double) =
      min(when(col("rn") === ceil(lit(p) * col("n")), col("l_extendedprice")))
    ranked.groupBy("l_returnflag")
      .agg(pick(0.25).as("p25"), pick(0.5).as("p50"),
        pick(0.75).as("p75"), pick(0.95).as("p95"))
      .orderBy("l_returnflag")
  }

  /** unpivot_melt — wide → long reshaping with the native `unpivot`
    * (Spark's melt): per-order metric columns become (metric, value)
    * rows. The inverse of [[pivotTable]]; together they close the
    * reshaping pair. Unpivot is a zero-shuffle projection (each input
    * row expands to k output rows in place), so it composes freely
    * under any partitioning. */
  def unpivotMelt(spark: SparkSession, dir: String): DataFrame = {
    val wide = Relational.table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(sum(col("l_discount")), 2).as("sum_disc"))
      .filter(col("l_orderkey") % 100 === 0)
    wide.unpivot(Array(col("l_orderkey")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "metric", "value")
      .orderBy("l_orderkey", "metric")
  }

  /** window_moving_agg — a rolling 90-day average per customer, the
    * RANGE-frame window (value-based bounds, not row counts) that
    * every monitoring/trend surface needs and that row-frame windows
    * get subtly wrong when days are missing or duplicated. The frame
    * key is the integer day offset, so `rangeBetween(-89, 0)` means
    * "the preceding 90 calendar days, however many orders they hold".
    * Scale: the window partitions by customer — state per task is one
    * customer's frame, the shuffle is the per-key one any per-entity
    * analysis needs; the probe filter (1-in-50 customers) sits on the
    * PARTITION key, so at 100 TB it prunes the scan without touching
    * window semantics (each customer's frame is complete). */
  def windowMovingAgg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val orders = Relational.table(spark, dir, "orders")
      .filter(col("o_custkey") % 50 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"),
        datediff(to_date(col("o_orderdate")),
          to_date(lit("1995-01-01"))).as("d"))
    val w = Window.partitionBy("o_custkey").orderBy("d")
      .rangeBetween(-89, 0)
    // Rolling SUM + count in EXACT INTEGER CENTS (the r16 sink-query
    // discipline, finished here per the r16 verdict): per-row
    // round(price·100) is engine-stable on the 2-decimal source, and
    // the BIGINT window sum is exact at ANY magnitude — a 2dp-rounded
    // double sum starts flipping half-cent boundaries between engines
    // once frames accumulate past double's 2dp resolution. The mean
    // is a reader-side division.
    orders
      .withColumn("mov_sum_cents_90d", sum(col("cents")).over(w))
      .withColumn("n_in_window", count(lit(1)).over(w))
      .orderBy("o_custkey", "d", "o_orderkey")
  }

  /** window_ntile_deciles — decile banding per language group: ntile
    * needs a total order, so the tie-break (length, doc_id) makes the
    * assignment a pure function of the data, and the PARTITION BY is
    * what keeps it scalable — each language's ranking is an
    * independent per-key sort, never a global one (for a truly global
    * decile cut at 100 TB you switch to the approx-quantile operators
    * (`column_quantiles`/`approx_quantile`), which is why both exist).
    * Emits per-(lang, decile) occupancy and length bands — the
    * quality-stratification table a curation run reads before choosing
    * per-band sampling rates. */
  def windowNtileDeciles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(col("len"), col("doc_id"))
    Relational.table(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), length(col("text")).as("len"))
      .withColumn("decile", ntile(10).over(w))
      .groupBy("lang", "decile")
      .agg(count(lit(1)).as("n_docs"),
        min(col("len")).as("min_len"), max(col("len")).as("max_len"))
      .orderBy("lang", "decile")
  }
}
