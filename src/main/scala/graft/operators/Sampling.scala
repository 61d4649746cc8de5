package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus partitioning/sampling operators a training-data pipeline
  * needs that the reference has no equivalent for: deterministic
  * train/holdout splitting and per-stratum sampling.
  *
  * Scale design: splits are pure per-row hash expressions — no shuffle,
  * no state, reproducible across runs and engines (the split of a doc
  * depends only on its id, so adding data never reassigns existing
  * docs — the property that keeps holdout sets uncontaminated as a
  * corpus grows).
  */
object Sampling {

  /** Split assignment from a stable id: md5 of the decimal id string,
    * first two hex digits compared against the fraction boundary.
    * 'e6' = 230/256 ≈ 0.898 → ~90% train. Engine-neutral (md5 hex is
    * identical everywhere), unlike xxhash64 whose seed/mix differs
    * between engines. */
  def splitCol(id: org.apache.spark.sql.Column, boundaryHex: String = "e6")
      : org.apache.spark.sql.Column =
    when(substring(md5(id.cast("string")), 1, 2) < boundaryHex, "train")
      .otherwise("holdout")

  /** split_train_holdout — deterministic ~90/10 split of the documents
    * corpus with per-split volume accounting (doc and token sums), the
    * numbers a dataset card reports. */
  def trainHoldout(spark: SparkSession, dir: String): DataFrame =
    Relational.table(spark, dir, "documents")
      .select(splitCol(col("doc_id")).as("split"),
        size(TextOps.tokens(col("text"))).as("n_tokens"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("sum_tokens"))
      .orderBy("split")
}
