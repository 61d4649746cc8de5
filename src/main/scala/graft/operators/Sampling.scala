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

  /** pipeline_corpus_curation — the canonical training-data curation
    * flow, end to end in ONE Catalyst plan: corpus ∪ re-keyed copy
    * (simulated crawl overlap) → quality filter (length + stopword
    * ratio) → exact dedup (hash-grouped: the shuffle carries sha2
    * digests, not bodies; originals win by min id) → deterministic
    * train/holdout split → per-split volume stats. Every stage is an
    * existing operator — the query proves they compose without
    * materialization barriers between stages. */
  def corpusCuration(spark: SparkSession, dir: String): DataFrame = {
    val d = Relational.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val u = d.union(d.withColumn("doc_id", col("doc_id") + 10000))
    val toks = TextOps.tokens(col("text"))
    val quality = u.select(col("doc_id"), col("text"),
        size(toks).as("n_tok"),
        (size(filter(toks, w => w.isin(TextOps.StopWords: _*)))
          .cast("double") / size(toks)).as("stop_ratio"))
      .filter(col("n_tok") >= 15 && col("stop_ratio") >= 0.02)
    Dedup.exactDedup(quality, "doc_id", "text")
      .select(splitCol(col("doc_id")).as("split"), col("n_tok"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("bigint").as("sum_tokens"))
      .orderBy("split")
  }
}
