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

  /** Deterministic uniform in (0, 1) from a stable id: the first 8 hex
    * digits of md5, folded digit-by-digit as an EXPLICIT fixed-order
    * sum — every term is exact in binary (digit · 16^-j), so the value
    * is bit-identical in any engine that evaluates the same expression
    * tree, with none of `conv`'s portability problems. Range
    * [2^-33, 1): the +0.5 offset keeps u strictly positive so ln(u) is
    * finite. */
  private[graft] def hashUniform(id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val h = md5(id.cast("string"))
    val digits = (1 to 8).map { j =>
      (instr(lit("0123456789abcdef"), substring(h, j, 1)) - 1)
        .cast("double") * math.pow(16.0, -j)
    }
    digits.reduce(_ + _) + math.pow(16.0, -8) / 2
  }

  /** sample_weighted — weighted sampling WITHOUT replacement as one
    * top-k pass (Efraimidis–Spirakis A-ES, 2006): each row draws a
    * deterministic uniform u from its id and keys itself with
    * ln(u)/w — taking the k LARGEST keys samples without replacement
    * with inclusion probability increasing in the weight w (here
    * document length: a token-budget-shaped mixture draw). The whole
    * operator is a scan + TakeOrdered: per-partition heaps of k, a
    * driver merge of k·P rows, NO corpus shuffle or global sort — the
    * sampling pattern that holds at any corpus size.
    *
    * Engine-neutrality: u is an exact fixed-order binary sum
    * ([[hashUniform]]), but ln() is libm-dependent in the last ulp, so
    * the emitted key is QUANTIZED to integer micro-units (the
    * unigram-logprob millinat trick applied to an ordering key): a
    * cross-engine mismatch now needs two candidates within 1e-6 of
    * each other AND of the k-th boundary, and ties resolve by doc_id.
    * The spec checks the sample's mean weight sits above the corpus
    * mean — the property that makes it a WEIGHTED sample. */
  def sampleWeighted(
      spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val docs = Relational.table(spark, dir, "documents")
    val keyQ = floor(log(hashUniform(col("doc_id"))) / col("n_chars")
      * 1e6).cast("bigint")
    docs.select(col("doc_id"), col("n_chars").as("weight"),
        keyQ.as("key_q"))
      .orderBy(col("key_q").desc, col("doc_id").asc)
      .limit(k)
  }

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
    val u = d.union(d.withColumn("doc_id", col("doc_id") + graft.operators.Dedup.ReKeyOffset))
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

  /** split_leakage_check — MEASURE eval contamination through
    * near-duplicates: a per-doc hash split is growth-stable but
    * near-dup-blind, so a holdout document whose near-twin sits in
    * train leaks the eval signal exactly the way benchmark
    * decontamination ([[Curation]]) exists to prevent. The check is
    * the composition of two existing exact operators — the
    * prefix-filtered threshold-Jaccard pair set joined against the
    * split assignment — and counts pairs whose endpoints land on
    * opposite sides. At 100 TB the cost is the dedup pass the corpus
    * already runs; the split join adds two broadcast-sized lookups of
    * the pair list. The companion [[splitGroupAware]] is the FIX. */
  def splitLeakageCheck(
      spark: SparkSession, dir: String,
      threshold: Double = 0.8): DataFrame = {
    val d = Relational.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val pairs = Dedup.prefixJaccardPairs(d, threshold)
      .select("doc_a", "doc_b").localCheckpoint(true)
    val s = d.select(col("doc_id"), splitCol(col("doc_id")).as("split"))
      .localCheckpoint(true) // feeds the totals AND both pair lookups
    val leaks = pairs
      .join(s.select(col("doc_id").as("doc_a"), col("split").as("sa")),
        Seq("doc_a"))
      .join(s.select(col("doc_id").as("doc_b"), col("split").as("sb")),
        Seq("doc_b"))
      .agg(count(lit(1)).as("n_near_pairs"),
        coalesce(sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)),
          lit(0L)).as("n_leaking_pairs"))
    s.agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "holdout", 1L).otherwise(0L))
          .as("n_holdout"))
      .crossJoin(leaks)
      .select(col("n_train"), col("n_holdout"),
        col("n_near_pairs"), col("n_leaking_pairs"))
  }

  /** split_group_aware — the leakage-free split BY CONSTRUCTION: the
    * unit of assignment is the near-dup CLUSTER (connected components
    * over the exact threshold-Jaccard pair graph), keyed by the
    * cluster's canonical id, so two near-twins can never straddle the
    * boundary — the zero-leak witness is computed the same way the
    * check query counts leaks, and replayed by the oracle's recursive
    * components. Singleton docs hash on their own id, which keeps the
    * assignment growth-stable (adding data never reassigns an
    * existing cluster unless the cluster itself grows — the
    * unavoidable semantic). */
  def splitGroupAware(
      spark: SparkSession, dir: String,
      threshold: Double = 0.8): DataFrame = {
    val d = Relational.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val pairs = Dedup.prefixJaccardPairs(d, threshold)
      .select("doc_a", "doc_b").localCheckpoint(true)
    // releaseInput must stay false: the pair list is re-read below for
    // the zero-leak witness after components are built.
    val cc = Dedup.connectedComponents(pairs)
    val assigned = d.select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("grp"))
      .select(col("doc_id"), splitCol(col("grp")).as("split"))
      .localCheckpoint(true)
    val leaks = pairs
      .join(assigned.select(col("doc_id").as("doc_a"),
        col("split").as("sa")), Seq("doc_a"))
      .join(assigned.select(col("doc_id").as("doc_b"),
        col("split").as("sb")), Seq("doc_b"))
      .agg(coalesce(sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)),
        lit(0L)).as("n_leaking_pairs"))
    assigned.groupBy("split")
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(leaks)
      .select(col("split"), col("n_docs"), col("n_leaking_pairs"),
        (col("n_leaking_pairs") === 0L).as("leak_free"))
      .orderBy("split")
  }
}
