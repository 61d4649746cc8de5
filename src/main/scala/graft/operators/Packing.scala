package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence/shard packing for pre-training corpora: assign documents to
  * fixed-token-budget shards in a deterministic global order. The core
  * primitive is a DISTRIBUTED PREFIX SUM — the textbook multi-level
  * scan (partial sums per block, a recursively-scanned block-total
  * relation, then a within-block scan), expressed entirely in DataFrame
  * operations so Catalyst sees the whole plan.
  *
  * Why not a plain running-total window? `sum(x) OVER (ORDER BY id)`
  * with no PARTITION BY collapses the whole corpus into ONE task — the
  * classic accidental serialization. Here the corpus-sized work is
  * partitioned by a deterministic block key (id / blockSize), and the
  * block-total relation is scanned RECURSIVELY with a bounded fan-in:
  * every window in the plan is either partitioned (parallel) or runs
  * over at most `fanIn` rows — no level is ever a single task over an
  * unbounded row count, at any corpus size up to the static capacity.
  * Reference capability: sairam030/autonomus_datapipeline has no
  * packing step; this is part of the training-data extension surface
  * (SURVEY §2 "beyond").
  */
object Packing {

  /** Exclusive running total of `valueCol` in ascending `idCol` order,
    * computed with the recursive multi-level scan. Emits the input
    * columns plus `prior` (sum of all values strictly before this row).
    *
    * - level 1: within-block exclusive cumsum — window PARTITIONED BY
    *   block, so every block scans in parallel;
    * - level 2+: per-block totals scanned by [[exclusiveScanRel]],
    *   which recurses over `fanIn`-sized super-groups until the top
    *   scan fits one bounded window.
    *
    * `capacityIds` is the PLAN-TIME bound on the id domain that fixes
    * the recursion depth, RUNTIME-ENFORCED: a row whose id falls
    * outside [0, capacityIds) raises rather than silently running the
    * base-case window over more than `fanIn` rows (ids must be
    * < capacityIds; the default 2^36
    * covers ~6.9e10 documents — comfortably past the 10^10-doc /
    * 100 TB design point). At the defaults that is exactly three
    * levels: the in-block scan, one super-block scan (parallel,
    * ≤ fanIn rows per partition), and a top window over ≤ 4096 rows;
    * a larger corpus just passes a bigger capacity and the recursion
    * adds levels. Each level is a fixed-cost stage (tiny groupBy +
    * broadcast), so depth is chosen from the stated capacity rather
    * than maxed out defensively. */
  def exclusivePrefixSum(
      df: DataFrame, idCol: String, valueCol: String,
      blockSize: Long = 4096L, fanIn: Long = 4096L,
      capacityIds: Long = 1L << 36): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(blockSize >= 2 && fanIn >= 2, "blockSize and fanIn must be >= 2")
    // The stated capacity is what FIXES the recursion depth; an id at
    // or past it would not corrupt the sum, but it would silently push
    // the base-case window past its fanIn bound — the exact accidental
    // serialization this operator exists to prevent. Fail loudly
    // instead of degrading (same convention as Dedup.pinnedDocId).
    val rawId = col(idCol).cast("bigint")
    val guardedId = when(rawId >= 0 && rawId < capacityIds, rawId)
      .otherwise(raise_error(concat(
        lit(s"prefix-sum id outside [0, $capacityIds): "),
        rawId.cast("string"))))
    val block = (guardedId / blockSize).cast("bigint")
    val withBlock = df.withColumn("_blk", block)
    val inBlock = Window.partitionBy("_blk").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val blockTotals = withBlock
      .groupBy("_blk").agg(sum(col(valueCol)).as("_blk_total"))
    val blockOffsets = exclusiveScanRel(blockTotals, "_blk", "_blk_total",
        fanIn, maxKeys = (capacityIds + blockSize - 1) / blockSize, lvl = 0)
      .withColumnRenamed("_offset", "_blk_offset")
    withBlock
      .join(broadcast(blockOffsets), Seq("_blk"))
      .withColumn("prior",
        col("_blk_offset") +
          coalesce(sum(col(valueCol)).over(inBlock), lit(0L)))
      .drop("_blk", "_blk_offset")
  }

  /** Exclusive prefix sum over a (key, total) relation → (key,
    * `_offset`): if the PLAN-TIME key bound fits one `fanIn` window,
    * scan it directly (the bounded base case); otherwise group keys
    * into `fanIn`-sized super-groups, scan within each group in
    * parallel, and recurse on the one-row-per-group totals. Column
    * names carry the recursion level so a level's synthetic columns
    * never collide with its parent's. */
  private def exclusiveScanRel(
      rel: DataFrame, keyCol: String, totalCol: String,
      fanIn: Long, maxKeys: Long, lvl: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (maxKeys <= fanIn) {
      val w = Window.orderBy(keyCol)
        .rowsBetween(Window.unboundedPreceding, -1)
      rel.select(col(keyCol),
        coalesce(sum(col(totalCol)).over(w), lit(0L)).as("_offset"))
    } else {
      val supKey = s"_sup$lvl"
      val grouped = rel.withColumn(supKey,
        (col(keyCol) / fanIn).cast("bigint"))
      val inGroup = Window.partitionBy(supKey).orderBy(keyCol)
        .rowsBetween(Window.unboundedPreceding, -1)
      val groupTotals = grouped.groupBy(supKey)
        .agg(sum(col(totalCol)).as(s"_sup_total$lvl"))
      // Exact ceiling: keys are in [0, maxKeys), so super-keys are in
      // [0, ceil(maxKeys / fanIn)). An overshooting bound (`/ fanIn + 1`)
      // would recurse one level deeper than the stated capacity needs.
      val groupOffsets = exclusiveScanRel(groupTotals, supKey,
          s"_sup_total$lvl", fanIn, (maxKeys + fanIn - 1) / fanIn, lvl + 1)
        .withColumnRenamed("_offset", s"_sup_offset$lvl")
      grouped.join(broadcast(groupOffsets), Seq(supKey))
        .select(col(keyCol),
          (col(s"_sup_offset$lvl") +
            coalesce(sum(col(totalCol)).over(inGroup), lit(0L)))
            .as("_offset"))
    }
  }

  /** sketch_hll_store — PERSISTED-SKETCH rollup (the daily-partial
    * pattern: each ingest writes a small mergeable sketch; corpus-wide
    * distinct counts come from merging STORED sketches, never from
    * rescanning raw data). Per-language Apache DataSketches HLL
    * sketches of the document digests are written to parquet (bytes,
    * not rows), read back, and merged with `hll_union_agg` for the
    * corpus total — the raw table is scanned exactly once, at sketch
    * build. Estimates are deterministic for fixed input, but
    * sketch internals are engine-specific, so the driver-checked
    * output is (exact count, estimate-within-5% flag) — the same
    * self-asserting contract as approx_distinct. */
  def hllStoreQuery(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.util.Scratch.dir("graft_hll")
    val store = base.resolve("sketches").toString
    Relational.table(spark, dir, "documents")
      .select(col("lang"),
        sha2(col("text").cast("binary"), 256).as("digest"))
      .groupBy("lang")
      .agg(expr("hll_sketch_agg(digest)").as("sketch"),
        count_distinct(col("digest")).as("n_exact"))
      .write.mode("overwrite").parquet(store)
    val sketches = spark.read.parquet(store)
    val perLang = sketches.select(col("lang"),
      col("n_exact").cast("bigint").as("n_exact"),
      (abs(expr("hll_sketch_estimate(sketch)") - col("n_exact"))
        <= col("n_exact") * 0.05).as("approx_within_5pct"))
    // The merged total's exact twin is computed independently below —
    // per-language exact counts do NOT sum to it when a text repeats
    // across languages.
    val merged = sketches
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("est"))
      .select(lit("__all__").as("lang"), col("est"))
    val exactAll = Relational.table(spark, dir, "documents")
      .select(sha2(col("text").cast("binary"), 256).as("digest"))
      .agg(count_distinct(col("digest")).as("n_exact_all"))
    val mergedRow = merged.crossJoin(exactAll)
      .select(col("lang"), col("n_exact_all").cast("bigint").as("n_exact"),
        (abs(col("est") - col("n_exact_all"))
          <= col("n_exact_all") * 0.05).as("approx_within_5pct"))
    perLang.unionByName(mergedRow).orderBy("lang")
  }

  /** pipeline_pack_release — the release-cut pipeline as ONE declarative
    * chain ending in the shard manifest a dataset release publishes:
    *
    *   quality gate → exact dedup (lowest id per text) →
    *   balanced-mixture downsample (rates computed from the deduped
    *   counts, the [[Curation.domainMixQuery]] rule) →
    *   token-budget shard packing ([[tokenBudgetPack]]'s two-level
    *   prefix sum over the kept set).
    *
    * Every stage is an existing proven operator; no stage materializes
    * — Catalyst sees the whole chain, so column pruning reaches the
    * scan (bodies are dropped after the quality/token columns are
    * derived) and the only corpus-wide shuffles are the dedup
    * hash-group and the per-block prefix-sum windows. */
  def packReleaseQuery(
      spark: SparkSession, dir: String, budget: Long = 20000L): DataFrame = {
    val ws = TextOps.tokens(col("text"))
    val (nTok, pass) = Curation.qualityGate(ws)
    val quality = Relational.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"),
        nTok.cast("bigint").as("n_tok"), pass.as("_pass"))
      .filter(col("_pass")).drop("_pass")
    val deduped = Dedup.exactDedup(quality, "doc_id", "text")
      .select(col("doc_id"), col("lang"), col("n_tok"))
    val counts = deduped.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val boundaries = counts.crossJoin(
        broadcast(counts.agg(min(col("n_docs")).as("min_docs"))))
      .select(col("lang"),
        Curation.boundary256(col("min_docs"), col("n_docs"))
          .as("boundary256"))
    val kept = deduped.join(broadcast(boundaries), Seq("lang"))
      .filter(Curation.keepBelowBoundary(col("doc_id"), col("boundary256")))
      .select(col("doc_id"), col("n_tok"))
    exclusivePrefixSum(kept, "doc_id", "n_tok")
      .select(col("doc_id"), col("n_tok"),
        floor(col("prior") / budget).cast("bigint").as("shard"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("shard")
  }

  /** pipeline_chunk_release — the CHUNK-level release cut, composing
    * the chunking operator into the release chain as ONE Catalyst
    * plan:
    *
    *   quality gate (≥ 200 chars) →
    *   non-overlapping 128-token chunking ([[TextOps.chunkRelation]],
    *   stride = chunk — training shards want disjoint windows) →
    *   exact cross-document chunk dedup (lowest global chunk id per
    *   chunk_md5 — the digest shuffles, never the tokens) →
    *   token-budget shard packing over the kept chunks
    *   ([[exclusivePrefixSum]] in global chunk order).
    *
    * The global chunk id is doc_id · 1024 + chunk_id, with a loud
    * in-plan guard on the 1024-chunks-per-doc bound (the
    * `pinnedDocId`/prefix-sum convention: fail, never silently
    * misorder). Integer arithmetic end to end, so the oracle replays
    * the whole chain with window functions. */
  def chunkReleaseQuery(
      spark: SparkSession, dir: String, budget: Long = 1000L): DataFrame = {
    val chunkCap = 1024L
    val docs = Relational.table(spark, dir, "documents")
      .filter(length(col("text")) >= 200)
    val chunks = TextOps.chunkRelation(docs, chunk = 128, stride = 128)
    val guardedChunk = when(col("chunk_id") < chunkCap, col("chunk_id"))
      .otherwise(raise_error(concat(
        lit(s"chunk_id exceeds the $chunkCap-per-doc id bound: "),
        col("chunk_id").cast("string"))))
    val gids = chunks.select(
      (col("doc_id") * chunkCap + guardedChunk).cast("bigint").as("gid"),
      col("n_tokens").cast("bigint").as("n_tok"), col("chunk_md5"))
    val deduped = Dedup.exactDedup(gids, "gid", "chunk_md5")
      .select(col("gid"), col("n_tok"))
    // gid = doc_id·1024 + chunk: at the 10^10-doc / 100 TB design
    // point gids reach ~10^13, past the prefix-sum's 2^36 default —
    // state 2^44 (1.7e10 docs' worth of slots) for one extra tiny
    // reduction level instead of a loud capacity trip at scale.
    exclusivePrefixSum(deduped, "gid", "n_tok", capacityIds = 1L << 44)
      .select(col("gid"), col("n_tok"),
        floor(col("prior") / budget).cast("bigint").as("shard"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tok")).as("sum_tokens"),
        min(col("gid")).as("first_gid"),
        max(col("gid")).as("last_gid"))
      .orderBy("shard")
  }

  /** token_budget_pack — greedy fixed-budget shard assignment: walking
    * the corpus in doc_id order, a document lands in shard
    * ⌊prior_tokens / budget⌋. Shards are contiguous doc_id ranges of
    * ≈`budget` whitespace tokens each — the shape a sequence-packing
    * or shard-writing job wants (each shard ships to one writer task;
    * `repartition(col("shard"))` downstream co-locates them). Emits the
    * per-shard manifest: doc count, token volume, id span. */
  def tokenBudgetPack(
      spark: SparkSession, dir: String, budget: Long = 20000L): DataFrame = {
    val d = Relational.table(spark, dir, "documents")
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("n_tok"))
    exclusivePrefixSum(d, "doc_id", "n_tok")
      .select(col("doc_id"), col("n_tok"),
        floor(col("prior") / budget).cast("bigint").as("shard"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("shard")
  }
}
