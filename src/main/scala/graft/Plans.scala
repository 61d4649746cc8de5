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
    writeDeltaWitnesses(spark)
    spark.stop()
  }

  /** Executed-plan witnesses for the SupportsDelta (WriteDelta) SQL
    * row-level paths — r16 verdict task 4. These commands execute
    * eagerly, so the witness prints the EXECUTED command plan
    * captured from the CommandResult wrapper: it shows the WriteDelta
    * node, the GraftMoR group scan (one inner parquet scan per
    * delete-applicability GROUP, never per file), and the UPDATE
    * condition inside the inner scan's PushedFilters — the contrast
    * with the copy-on-write scan, which must never push the condition
    * (it owes every row of every planned file). Scratch table, same
    * shape as GraftConnectorSpec's "WriteDelta plan witness" test. */
  private def writeDeltaWitnesses(spark: SparkSession): Unit = {
    import java.nio.file.Files
    import org.apache.spark.sql.catalyst.plans.logical.CommandResult
    import org.apache.spark.sql.functions.col
    import graft.operators.TxnLog
    import spark.implicits._
    val tbl = graft.util.Scratch.dir("graft_plans")
      .resolve(s"wd${System.nanoTime()}")
    Files.createDirectories(tbl)
    val rows = (1L to 100L).map(i => (i, i * 10L)).toDF("id", "v")
    for (q <- 0 until 4)
      rows.filter(col("id").between(q * 25 + 1, (q + 1) * 25))
        .coalesce(1).write.parquet(tbl.resolve(s"q$q").toString)
    val files = (0 until 4).flatMap(q => TxnLog.parquetsUnder(tbl, s"q$q"))
    TxnLog.commitRetry(tbl, "create", _ => files,
      statsFor = _ => TxnLog.keyStats(spark, tbl, files, "id"),
      statsKey = Some("id"))
    graft.sources.GraftTables.registerCatalog(spark)
    def witness(name: String, sqlText: String): Unit = {
      println(s"\n===== $name (executed WriteDelta command plan) =====")
      spark.sql(sqlText).queryExecution.commandExecuted match {
        case cr: CommandResult => println(cr.commandPhysicalPlan.toString)
        case o => println(s"NOT A COMMAND: $o")
      }
    }
    spark.conf.set("spark.graft.rowlevel.mode", "mor")
    try {
      witness("table_update_mor_sql",
        s"UPDATE graft.`$tbl` SET v = v + 1 WHERE id >= 30")
      Seq((60L, 7L), (300L, 8L)).toDF("id", "v")
        .createOrReplaceTempView("plans_merge_src")
      witness("table_merge_mor",
        s"MERGE INTO graft.`$tbl` t USING plans_merge_src s " +
          "ON t.id = s.id " +
          "WHEN MATCHED THEN UPDATE SET v = s.v " +
          "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)")
      witness("table_delete_mor_sql",
        s"DELETE FROM graft.`$tbl` WHERE id % 10 = 7")
    } finally spark.conf.unset("spark.graft.rowlevel.mode")
  }
}
