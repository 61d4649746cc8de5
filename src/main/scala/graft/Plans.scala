package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of headline queries
  * so plan-shape regressions (lost pushdown, broadcast→SMJ flips,
  * codegen breaks) are visible in review, not just in runtime numbers.
  * Usage: runMain graft.Plans [sfDir] > PLANS.txt
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val headline = Seq(
      "q1_agg", "filter_predicate", "lookup_join", "window_topk",
      "asof_join", "join_semi", "rollup_agg", "similarity_cosine_expr",
      "dedup_exact", "dedup_embedding_cosine", "similarity_topk_cosine",
      "scan_db", "sessionize", "upsert_latest_by_key", "skew_salted_join",
      "range_join", "pivot_table", "text_decontaminate", "text_repetition",
      "sample_stratified", "token_length_histogram",
      "pipeline_pretrain_curation", "sketch_bottomk", "embedding_centroid",
      "time_resample", "text_pii_redact", "text_token_count",
      "dedup_incremental", "quality_funnel", "grouping_sets",
      "approx_quantile", "token_budget_pack", "dedup_bloom_prefilter",
      "sample_domain_mix", "dedup_semantic", "text_unigram_logprob",
      "dedup_span_exact", "custom_topk_exec", "optimizer_cosine_rewrite",
      "optimizer_cosine_rewrite_residual",
      "pipeline_pack_release", "sketch_hll_store",
      "sink_partition_backfill", "observe_quality_metrics",
      "embedding_quantize",
      // round-10 additions with an auditable plan shape
      "text_chunk_windows", "pipeline_chunk_release", "sample_weighted",
      "text_compression_ratio",
      // round-11 additions with an auditable plan shape (the
      // write/stream-effect queries — merge, CDC apply, vacuum, bloom
      // index, late-drop — execute their effects at construction time,
      // so their read-back plans are audited via the bench instead)
      "dedup_cdc_chunks", "window_moving_agg", "window_ntile_deciles",
      "dedup_edit_distance", "unpivot_melt", "json_variant",
      "similarity_matryoshka",
      // round-13: DataSourceV2 connector reads — the BatchScan lines
      // show the manifest-pruned graft scans (file skipping, column
      // mapping, incremental diffs); the commit-effect table queries
      // (write/torture/feed) audit via the bench, like r11's writes
      "table_connector_read", "table_connector_skipping",
      "table_column_mapping", "table_incremental_read")
    headline.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir)
        .explain("formatted")
    }
    spark.stop()
  }
}
