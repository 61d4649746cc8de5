package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence/shard packing for pre-training corpora: assign documents to
  * fixed-token-budget shards in a deterministic global order. The core
  * primitive is a DISTRIBUTED PREFIX SUM — the textbook two-level scan
  * (partial sums per block, one tiny scan over block totals, then a
  * within-block scan), expressed entirely in DataFrame operations so
  * Catalyst sees the whole plan.
  *
  * Why not a plain running-total window? `sum(x) OVER (ORDER BY id)`
  * with no PARTITION BY collapses the whole corpus into ONE task — the
  * classic accidental serialization. Here the corpus-sized work is
  * partitioned by a deterministic block key (id / blockSize); the only
  * unpartitioned step runs over ONE ROW PER BLOCK (corpus_size /
  * blockSize rows — bounded and controllable; at 100 TB you would add
  * a third level over super-blocks, same shape). Reference capability:
  * sairam030/autonomus_datapipeline has no packing step; this is part
  * of the training-data extension surface (SURVEY §2 "beyond").
  */
object Packing {

  /** Exclusive running total of `valueCol` in ascending `idCol` order,
    * computed with the two-level scan. Emits the input columns plus
    * `prior` (sum of all values strictly before this row).
    *
    * - level 1: within-block exclusive cumsum — window PARTITIONED BY
    *   block, so every block scans in parallel;
    * - level 2: per-block totals, then an exclusive cumsum over the
    *   block-total relation (1 row per block) — the only global-order
    *   window, bounded by the block count, never by the corpus.
    */
  def exclusivePrefixSum(
      df: DataFrame, idCol: String, valueCol: String,
      blockSize: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val block = (col(idCol).cast("bigint") / blockSize).cast("bigint")
    val withBlock = df.withColumn("_blk", block)
    val inBlock = Window.partitionBy("_blk").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val overBlocks = Window.orderBy("_blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blockOffsets = withBlock
      .groupBy("_blk").agg(sum(col(valueCol)).as("_blk_total"))
      .select(col("_blk"),
        coalesce(sum(col("_blk_total")).over(overBlocks), lit(0L))
          .as("_blk_offset"))
    withBlock
      .join(broadcast(blockOffsets), Seq("_blk"))
      .withColumn("prior",
        col("_blk_offset") +
          coalesce(sum(col(valueCol)).over(inBlock), lit(0L)))
      .drop("_blk", "_blk_offset")
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
