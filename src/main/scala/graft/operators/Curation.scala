package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingestion and tokenization: benchmark decontamination, repetition
  * quality signals, domain-mixture sampling, and sequence-length
  * profiling. (No reference-system equivalent — these extend the
  * engine's LLM-data surface; cf. SURVEY.md §2 scope note.)
  *
  * Scale design notes per operator are on the methods; the common
  * principles: benchmark sets are broadcast (they are small by nature),
  * repetition signals shuffle (doc_id, ngram-hash) pairs rather than
  * document bodies, and mixture sampling is a pure per-row hash
  * predicate with no shuffle at all.
  */
object Curation {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Relational.table(spark, dir, "documents")

  // ------------------------------------------------------------------
  // Benchmark decontamination
  // ------------------------------------------------------------------

  /** Training docs that share at least one word k-gram with a
    * benchmark/eval set — the overlap check every training corpus runs
    * before release (the "13-gram decontamination" of GPT-3/PaLM
    * lineage; k is a parameter because the right value depends on
    * document length).
    *
    * Plan shape at 100 TB: the benchmark side (eval suites are at most
    * ~10⁶ short rows) collapses to a distinct n-gram set that is
    * explicitly `broadcast` — the corpus side streams through a
    * broadcast hash join with NO shuffle of corpus n-grams; only the
    * surviving (doc_id) groups aggregate, with map-side partial
    * counts. Corpus n-grams never leave their scan partition.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, k: Int)
      : DataFrame = {
    // NOT Dedup.shingleRel: its global `.distinct()` would shuffle every
    // corpus n-gram just to deduplicate WITHIN documents — the shingle
    // arrays are already per-doc distinct, so a plain explode gives the
    // same relation with zero corpus-side shuffle.
    val corpusGrams = corpus
      .select(col("doc_id"), col("text"))
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .select(col("doc_id"),
        explode(TextOps.shinglesOfTokens(col("ws"), k)).as("shingle"))
    val benchGrams = Dedup.shingleRel(benchmark, k)
      .select(col("shingle")).distinct()
    corpusGrams
      .join(broadcast(benchGrams), Seq("shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** text_decontaminate driver query — benchmark = every doc_id
    * divisible by `benchMod` (standing in for an eval suite), k=3 to
    * suit the short synthetic docs. Emits the contaminated doc ids with
    * their distinct-overlapping-n-gram counts. */
  def decontaminateQuery(
      spark: SparkSession, dir: String,
      k: Int = 3, benchMod: Int = 97): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("text"))
    val bench = d.filter(col("doc_id") % benchMod === 0)
    val train = d.filter(col("doc_id") % benchMod =!= 0)
    decontaminate(train, bench, k).orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // Repetition quality signals
  // ------------------------------------------------------------------

  /** Non-distinct word bigrams of a token-array column (repetition
    * counting needs multiplicity, so this deliberately does NOT reuse
    * the distinct `TextOps.shinglesOfTokens`). `ws` must be a
    * materialized attribute (see TextOps.shingles perf note). */
  private def bigramsOfTokens(ws: Column): Column =
    when(size(ws) >= 2,
      transform(sequence(lit(0), size(ws) - 2), i =>
        concat_ws("|", element_at(ws, i + 1), element_at(ws, i + 2))))
      .otherwise(array())

  /** text_repetition — per-doc repetition signals in the
    * Gopher/MassiveText family: duplicate-token fraction and the
    * fraction of the doc covered by its most frequent bigram. Docs
    * that score high are boilerplate/spam candidates.
    *
    * Scale: the only shuffle carries (doc_id, bigram) pairs for the
    * per-doc mode computation — partial-aggregated map-side, keyed by
    * doc so it partitions evenly; token-level ratios are pure
    * codegen'd array expressions on the scan side. The window that
    * picks each doc's top bigram partitions by doc_id (no global
    * sort). Tie-break (count desc, bigram asc) is deterministic.
    *
    * CONTRACT: docs with fewer than 2 tokens have no bigrams and no
    * repetition signal — they are omitted from the output (the inner
    * join against the per-doc top bigram is intentional; the oracle
    * mirrors it).
    */
  def repetitionQuery(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
    val stats = toks.select(
      col("doc_id"),
      size(col("ws")).as("n_tokens"),
      size(array_distinct(col("ws"))).as("n_distinct"))
    val topBigram = toks
      .select(col("doc_id"), explode(bigramsOfTokens(col("ws"))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("cnt").desc, col("bg").asc)))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("bg").as("top_bigram"),
        col("cnt").as("top_bigram_n"))
    stats.join(topBigram, Seq("doc_id"))
      .select(
        col("doc_id"), col("n_tokens"),
        ((col("n_tokens") - col("n_distinct")).cast("double") /
          col("n_tokens")).as("dup_token_ratio"),
        col("top_bigram"),
        (col("top_bigram_n").cast("double") / (col("n_tokens") - 1))
          .as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // Incremental (cross-corpus) dedup
  // ------------------------------------------------------------------

  /** dedup_incremental — dedup a NEW batch against an EXISTING corpus
    * (the steady-state shape of corpus growth: each crawl lands against
    * everything already kept, not against itself alone). Anti-join on
    * sha2(text): the shuffle carries 32-byte digests, never bodies, and
    * at 100 TB the existing side's digest set is a compact table that
    * co-partitions with the incoming batch. Emits the audit row a
    * growth report needs: batch size, how many were already present,
    * how many are genuinely new. */
  def incrementalDedup(existing: DataFrame, incoming: DataFrame,
      textCol: String = "text"): DataFrame = {
    val fp = sha2(col(textCol).cast("binary"), 256)
    val known = existing.select(fp.as("_fp")).distinct()
    incoming.withColumn("_fp", fp)
      .join(known, Seq("_fp"), "left_anti")
      .drop("_fp")
  }

  /** Driver query — existing corpus = even doc_ids; the incoming batch
    * = odd doc_ids PLUS re-keyed copies of 50 existing docs (the crawl
    * overlap). The dedup must drop exactly the copies. */
  def incrementalDedupQuery(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(Dedup.pinnedDocId(col("doc_id")).as("doc_id"), col("text"))
    val existing = d.filter(col("doc_id") % 2 === 0)
    val incoming = d.filter(col("doc_id") % 2 === 1)
      .union(d.filter(col("doc_id") % 2 === 0 && col("doc_id") < 100)
        .withColumn("doc_id", col("doc_id") + Dedup.ReKeyOffset))
    val fresh = incrementalDedup(existing, incoming)
    incoming.agg(count(lit(1)).as("n_incoming"))
      .crossJoin(fresh.agg(count(lit(1)).as("n_new")))
      .select(col("n_incoming"), col("n_new"),
        (col("n_incoming") - col("n_new")).as("n_already_known"))
  }

  // ------------------------------------------------------------------
  // Quality-filter funnel
  // ------------------------------------------------------------------

  /** quality_funnel — per-stage removal accounting: how many docs each
    * quality rule removes when applied in order (min length → stopword
    * ratio → repetition), and how many survive the whole funnel —
    * the dataset-card table every corpus release publishes. One scan;
    * each stage is a boolean column and the funnel is a single
    * aggregation over cumulative conjunctions (no per-stage jobs). */
  def qualityFunnelQuery(spark: SparkSession, dir: String): DataFrame = {
    val ws = TextOps.tokens(col("text"))
    val nTok = size(ws)
    val stopRatio = size(filter(ws, w => w.isin(TextOps.StopWords: _*)))
      .cast("double") / nTok
    val dupRatio = (nTok - size(array_distinct(ws))).cast("double") / nTok
    val pass1 = nTok >= 20                 // min length
    val pass2 = pass1 && stopRatio >= 0.02 // language-ish confidence
    val pass3 = pass2 && dupRatio <= 0.8   // repetition cap
    // One aggregation row pivoted to per-stage rows INSIDE the plan
    // (explode over a struct array) — no driver round-trip, so the
    // funnel composes like any other DataFrame and the pattern is safe
    // to copy for unbounded outputs.
    def stage(name: String, removed: Column, remaining: Column) =
      struct(lit(name).as("stage"), removed.as("n_removed"),
        remaining.as("n_remaining"))
    docs(spark, dir).agg(
        count(lit(1)).as("n0"),
        sum(when(pass1, 1L).otherwise(0L)).as("n1"),
        sum(when(pass2, 1L).otherwise(0L)).as("n2"),
        sum(when(pass3, 1L).otherwise(0L)).as("n3"))
      .select(explode(array(
        stage("1_min_length", col("n0") - col("n1"), col("n1")),
        stage("2_stopword_ratio", col("n1") - col("n2"), col("n2")),
        stage("3_repetition", col("n2") - col("n3"), col("n3")))).as("s"))
      .select(col("s.*"))
      .orderBy("stage")
  }

  // ------------------------------------------------------------------
  // PII redaction
  // ------------------------------------------------------------------

  /** Email/phone redaction over a text column: placeholder-substitute
    * every match and count what was removed (the audit number a
    * curation report carries). Pure codegen'd regexp expressions — runs
    * at scan speed, no shuffle, column-prunes to `text`. Patterns stay
    * within the regex subset whose semantics agree across engines
    * (character classes, bounded repetition — no lookaround). */
  def redactPii(text: Column): (Column, Column, Column) = {
    val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phonePat = "\\+\\d[\\d-]{5,}"
    val noEmail = regexp_replace(text, emailPat, "<EMAIL>")
    val redacted = regexp_replace(noEmail, phonePat, "<PHONE>")
    (redacted,
      regexp_count(text, lit(emailPat)).cast("int"),
      regexp_count(noEmail, lit(phonePat)).cast("int"))
  }

  /** text_pii_redact driver query — the corpus carries no real PII, so
    * each doc is deterministically decorated with one synthetic email
    * and phone (a fixture both engines construct identically), then
    * redacted; emits the redacted text and per-kind removal counts. */
  def piiRedactQuery(spark: SparkSession, dir: String): DataFrame = {
    val decorated = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    val (redacted, nEmails, nPhones) = redactPii(decorated)
    docs(spark, dir).select(
        col("doc_id"),
        redacted.as("text_redacted"),
        nEmails.as("n_emails"),
        nPhones.as("n_phones"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // Domain-mixture sampling
  // ------------------------------------------------------------------

  /** Keep-predicate for deterministic per-stratum downsampling: a doc
    * survives iff the first two hex digits of md5(id) fall below its
    * stratum's boundary (resolution 1/256). Same engine-neutral hash
    * contract as [[Sampling.splitCol]]: membership depends only on the
    * id, so re-running over a grown corpus never flips prior decisions,
    * and no RNG state is involved — a pure per-row expression, zero
    * shuffle, fully codegen'd. */
  def mixtureKeep(id: Column, stratum: Column, rates: Map[String, Double],
      defaultRate: Double = 1.0): Column = {
    // "g0" sorts above every hex pair ("00".."ff"), so rate >= 1 keeps
    // all rows; a 3-char "100" would compare LOWER than most pairs.
    def hex2(rate: Double): String =
      if (rate >= 1.0) "g0"
      else f"${math.max(0L, (rate * 256).round).toInt}%02x"
    val boundary = rates.foldLeft(lit(hex2(defaultRate))) {
      case (acc, (s, r)) => when(stratum === s, lit(hex2(r))).otherwise(acc)
    }
    substring(md5(id.cast("string")), 1, 2) < boundary
  }

  /** sample_stratified — rebalance the corpus toward a target language
    * mixture by deterministically downsampling the dominant stratum
    * (here: keep ~40% of `en`, all of the rest — the classic
    * "don't let the crawl drown the low-resource languages" step).
    * Emits per-language totals, kept counts, and kept token volume —
    * the numbers a mixture card reports. */
  def stratifiedSampleQuery(spark: SparkSession, dir: String): DataFrame = {
    val rates = Map("en" -> 0.4)
    val d = docs(spark, dir).select(
      col("lang"),
      size(TextOps.tokens(col("text"))).as("n_tokens"),
      mixtureKeep(col("doc_id"), col("lang"), rates).as("keep"))
    d.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L))
          .cast("bigint").as("kept_tokens"))
      .orderBy("lang")
  }

  // ------------------------------------------------------------------
  // End-to-end pre-training curation
  // ------------------------------------------------------------------

  /** pipeline_pretrain_curation — the complete pre-training data
    * pipeline in ONE Catalyst plan: corpus ∪ re-keyed copy (crawl
    * overlap) → quality filter → exact dedup → benchmark
    * decontamination (anti-join against contaminated ids; benchmark
    * docs themselves are removed too, as they share all their grams) →
    * language-mixture downsampling → deterministic split → per-split
    * volume stats. Extends [[Sampling.corpusCuration]] with the
    * decontaminate and mixture stages; every stage is an existing
    * operator, and no stage materializes — the optimizer sees the whole
    * chain. */
  def pretrainCuration(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("text"), col("lang"))
    val u = d.union(d.withColumn("doc_id", col("doc_id") + Dedup.ReKeyOffset))
    val toks = TextOps.tokens(col("text"))
    val quality = u.select(col("doc_id"), col("text"), col("lang"),
        size(toks).as("n_tok"),
        (size(filter(toks, w => w.isin(TextOps.StopWords: _*)))
          .cast("double") / size(toks)).as("stop_ratio"))
      .filter(col("n_tok") >= 15 && col("stop_ratio") >= 0.02)
    val deduped = Dedup.exactDedup(quality, "doc_id", "text")
    val benchGrams = Dedup.shingleRel(
        d.filter(col("doc_id") % 97 === 0), 3)
      .select(col("shingle")).distinct()
    val contaminated = deduped
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .select(col("doc_id"),
        explode(TextOps.shinglesOfTokens(col("ws"), 3)).as("shingle"))
      .join(broadcast(benchGrams), Seq("shingle"))
      .select("doc_id").distinct()
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    val sampled = clean.filter(
      mixtureKeep(col("doc_id"), col("lang"), Map("en" -> 0.4)))
    sampled.select(Sampling.splitCol(col("doc_id")).as("split"),
        col("n_tok"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("bigint").as("sum_tokens"))
      .orderBy("split")
  }

  // ------------------------------------------------------------------
  // Sequence-length profiling
  // ------------------------------------------------------------------

  /** token_length_histogram — doc counts and token volume per
    * token-count bin (width `binWidth`), the length profile that sizes
    * sequence-packing and max-length truncation decisions. One
    * map-side-combined aggregation over a scan that prunes to `text`
    * only; bin count is bounded by max doc length, so the result is
    * driver-safe at any corpus size. */
  def tokenLengthHistogram(
      spark: SparkSession, dir: String, binWidth: Int = 10): DataFrame = {
    val n = size(TextOps.tokens(col("text")))
    docs(spark, dir)
      .select((floor(n / binWidth) * binWidth).cast("int").as("bin_lo"),
        n.as("n_tokens"))
      .groupBy("bin_lo")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("sum_tokens"))
      .orderBy("bin_lo")
  }

  // ------------------------------------------------------------------
  // Bloom-prefiltered incremental dedup
  // ------------------------------------------------------------------

  /** Cross-corpus exact dedup with a BLOOM-FILTER PREFILTER: a Bloom
    * filter over the existing corpus's content digests is broadcast to
    * every incoming-batch task, and only bloom-POSITIVE rows (true
    * matches + the fpp sliver of false positives) continue to the
    * exact anti-join; bloom-negative rows are DEFINITELY new and pass
    * through with no shuffle at all. The output is exactly the plain
    * anti-join (the Bloom filter has no false negatives), but at
    * 100 TB the shuffle carries `dup_rate + fpp` of the batch instead
    * of all of it — the standard way to make incremental ingest cheap
    * when duplicates are rare. Built with Spark's own
    * `BloomFilterAggregate` / `BloomFilterMightContain` expressions
    * (the machinery behind its runtime join filters — not in the
    * public function registry, so bridged into Columns directly), so
    * both building and probing the filter stay distributed Catalyst
    * aggregates/expressions — no UDF, no driver-side filter object. */
  def bloomPrefilterDedup(existing: DataFrame, incoming: DataFrame,
      textCol: String = "text", expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    // The Bloom filter wants a LONG input, so the 256-bit content
    // digest is narrowed through xxhash64 for the PROBE only; the
    // exact anti-join below matches on the full sha2 hex digest, so a
    // 64-bit collision can cost at most a wasted trip through the
    // exact check — never a silently dropped document (the failure
    // mode a billions-of-docs corpus would otherwise hit).
    val digest = sha2(col(textCol).cast("binary"), 256)
    val fp = xxhash64(digest)
    val bloomAgg = ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(col("_h")),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    val bloom = existing.select(fp.as("_h")).agg(bloomAgg.as("_bf"))
    // `might_contain` demands a constant or scalar-subquery filter side
    // (the whole filter must reach every task as one value — the same
    // contract Spark's injected runtime join filters satisfy), so the
    // one-row bloom aggregate is attached as a ScalarSubquery rather
    // than a join.
    // An EMPTY existing corpus aggregates to a NULL bloom filter and
    // might_contain(NULL, h) is NULL — which a bare filter would treat
    // as "drop", silently deleting the whole first batch. NULL means
    // "no filter exists", i.e. nothing can match: coalesce to false.
    val probed = incoming.withColumn("_h", fp)
      .withColumn("_maybe", coalesce(
        ColumnBridge.column(BloomFilterMightContain(
          ScalarSubquery(bloom.queryExecution.logical),
          ColumnBridge.expression(col("_h")))), lit(false)))
    val definiteNew = probed.filter(!col("_maybe"))
    val needsCheck = probed.filter(col("_maybe")).withColumn("_fp", digest)
    val known = existing.select(digest.as("_fp2")).distinct()
    val survived = needsCheck
      .join(known, col("_fp") === col("_fp2"), "left_anti")
    definiteNew.unionByName(survived.drop("_fp2", "_fp"))
      .drop("_h", "_maybe")
  }

  /** dedup_bloom_prefilter driver query — same split fixture as
    * [[incrementalDedupQuery]] (even ids = existing, odd + 50 re-keyed
    * copies = incoming). Emits the audit row PLUS the prefilter's own
    * effectiveness numbers: how many rows the Bloom filter cleared
    * without any shuffle, and how many it sent to the exact check. The
    * result set must equal the plain anti-join's (oracle-checked). */
  def bloomPrefilterQuery(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(Dedup.pinnedDocId(col("doc_id")).as("doc_id"), col("text"))
    val existing = d.filter(col("doc_id") % 2 === 0)
    val incoming = d.filter(col("doc_id") % 2 === 1)
      .union(d.filter(col("doc_id") % 2 === 0 && col("doc_id") < 100)
        .withColumn("doc_id", col("doc_id") + Dedup.ReKeyOffset))
    val fresh = bloomPrefilterDedup(existing, incoming)
    fresh.agg(count(lit(1)).as("n_new"),
        min(col("doc_id")).as("min_new_id"),
        max(col("doc_id")).as("max_new_id"))
      .crossJoin(incoming.agg(count(lit(1)).as("n_incoming")))
      .select(col("n_incoming"), col("n_new"),
        (col("n_incoming") - col("n_new")).as("n_already_known"),
        col("min_new_id"), col("max_new_id"))
  }

  // ------------------------------------------------------------------
  // Target-mixture calibration (computed rates, not hand-set)
  // ------------------------------------------------------------------

  /** Whitespace-token quality gate shared by the curation surfaces
    * (batch, streaming, and the release pipeline): returns
    * (n_tok, pass) for `pass = n_tok ≥ minTokens ∧ stop_ratio ≥
    * minStopRatio`. One definition, one oracle translation. */
  private[graft] def qualityGate(ws: Column, minTokens: Int = 15,
      minStopRatio: Double = 0.02): (Column, Column) = {
    val nTok = size(ws)
    val stopRatio = size(filter(ws, w => w.isin(TextOps.StopWords: _*)))
      .cast("double") / nTok
    (nTok, nTok >= minTokens && stopRatio >= minStopRatio)
  }

  /** Balanced-mixture boundary: the keep rate min_docs/n_docs quantized
    * to 1/256 — integer arithmetic only, engine-neutral. */
  private[graft] def boundary256(minDocs: Column, nDocs: Column): Column =
    floor(minDocs * 256 / nDocs).cast("int")

  /** The md5-prefix keep predicate at a quantized boundary column —
    * the computed-rate sibling of [[mixtureKeep]]'s hand-set rates. */
  private[graft] def keepBelowBoundary(id: Column, boundary: Column): Column =
    substring(md5(id.cast("string")), 1, 2) <
      when(boundary >= 256, lit("g0"))
        .otherwise(lpad(lower(conv(boundary.cast("string"), 10, 16)),
          2, "0"))

  /** sample_domain_mix — downsample toward an EQUAL-SHARE language
    * mixture computed FROM THE DATA: the per-language keep rate is
    * min_lang_count / lang_count, so every language is sampled down to
    * the size of the smallest one (the balanced-mixture special case
    * of mixture calibration). Two passes: a counts aggregate (tiny —
    * one row per language) whose result parameterizes the same
    * deterministic md5-prefix keep-predicate as [[mixtureKeep]], then
    * one filtered scan. Rates are quantized to 1/256 EXACTLY like
    * mixtureKeep (floor at the same resolution), so the decision is a
    * pure function of (doc_id, lang, counts) — engine-neutral and
    * replayable. The counts join is a broadcast of n_langs rows; the
    * keep decision itself is zero-shuffle codegen. */
  /** sample_repeat_factor — the UPSAMPLING half of mixture calibration
    * (domainMixQuery downsamples the dominant strata; this replicates
    * the scarce ones): each language gets an integer repeat factor
    * r = min(cap, ⌈max_lang_count / lang_count⌉) — the "epochs over
    * low-resource data" multiplier a training mix specifies — and every
    * document is emitted once per epoch 1..r. Zero shuffle on the
    * corpus: the factor table (one row per language) broadcasts, and
    * the replication is a per-row `explode(sequence(1, r))` at scan
    * speed; downstream writers see the epoch column and can salt or
    * shard by it. The cap bounds worst-case blowup on a pathologically
    * rare stratum. Emits per-(lang, epoch) counts. */
  def repeatFactorQuery(
      spark: SparkSession, dir: String, cap: Int = 4): DataFrame = {
    val counts = docs(spark, dir).groupBy("lang")
      .agg(count(lit(1)).as("n"))
    val mx = counts.agg(max(col("n")).as("mx"))
    val factors = counts.crossJoin(broadcast(mx))
      .select(col("lang"), col("n"),
        least(lit(cap),
          ceil(col("mx").cast("double") / col("n")).cast("int")).as("r"))
    docs(spark, dir).select(col("doc_id"), col("lang"))
      .join(broadcast(factors), Seq("lang"))
      .select(col("lang"), col("r"),
        explode(sequence(lit(1), col("r"))).as("epoch"))
      .groupBy("lang", "epoch")
      .agg(max(col("r")).as("repeat_factor"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang", "epoch")
  }

  def domainMixQuery(spark: SparkSession, dir: String): DataFrame = {
    val counts = docs(spark, dir).groupBy("lang")
      .agg(count(lit(1)).as("n_docs"))
    val withMin = counts.crossJoin(
      broadcast(counts.agg(min(col("n_docs")).as("min_docs"))))
    // Quantized boundary in [0,256]: 256 ⇔ keep-all (md5 prefix is
    // always < "g0"-equivalent).
    val boundaries = withMin.select(col("lang"), col("n_docs"),
      boundary256(col("min_docs"), col("n_docs")).as("boundary256"))
    val keep = keepBelowBoundary(col("doc_id"), col("boundary256"))
    docs(spark, dir).select(col("doc_id"), col("lang"))
      .join(broadcast(boundaries), Seq("lang"))
      .groupBy("lang")
      .agg(max(col("n_docs")).as("n_total"),
        max(col("boundary256")).as("boundary256"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"))
      .orderBy("lang")
  }
}
