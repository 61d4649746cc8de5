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
    streamingSourceWitnesses(spark)
    statsWitness(spark)
    spark.stop()
  }

  /** Planning witnesses for the table-as-stream paths (r17 verdict
    * task 4): offsets are LOG VERSIONS (the checkpoint's offsets log
    * is printed verbatim), and each micro-batch plans a MANIFEST DIFF
    * — witnessed by the distinct `input_file_name()`s each batch
    * actually read, asserted O(new files): a batch over (v, v+1] may
    * touch only the files v+1 added, never the base snapshot. Covers
    * stream_table_feed (snapshot batch 0 + per-commit batches under
    * maxVersionsPerTrigger=1, the stream_batched_cap admission path)
    * and stream_cdf_feed (change-feed rows per version). */
  private def streamingSourceWitnesses(spark: SparkSession): Unit = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions.{col, input_file_name}
    import graft.operators.TxnLog
    import spark.implicits._
    val root = graft.util.Scratch.dir("graft_plans")
      .resolve(s"sw${System.nanoTime()}")
    val tbl = root.resolve("t")
    Files.createDirectories(tbl)
    def commit(sub: String, lo: Long, hi: Long): Unit = {
      (lo to hi).map(i => (i, i * 2L)).toDF("id", "v")
        .coalesce(1).write.parquet(tbl.resolve(sub).toString)
      TxnLog.commitRetry(tbl,
        if (sub == "b0") "create" else "append",
        t => t.files ++ TxnLog.parquetsUnder(tbl, sub))
    }
    commit("b0", 1L, 4L)   // v0: the base snapshot
    commit("b1", 5L, 8L)   // v1
    commit("b2", 9L, 12L)  // v2
    println("\n===== stream_table_feed / stream_batched_cap " +
      "(micro-batch source planning witness) =====")
    val ckpt = root.resolve("ckpt")
    val batches = scala.collection.mutable
      .ArrayBuffer.empty[(Long, Long, Seq[String])]
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1") // the admission cap
      .load(tbl.toString)
      .select(col("id"), input_file_name().as("f"))
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.collect()
        val dirs = rows.map(_.getString(1)
          .replaceFirst(".*/(b\\d+)/.*", "$1")).distinct.sorted.toSeq
        batches.synchronized { batches += ((id, rows.length.toLong, dirs)) }
        ()
      }.start()
    q.awaitTermination()
    batches.sortBy(_._1).foreach { case (id, n, dirs) =>
      println(s"batch $id: rows=$n sourceDirs=${dirs.mkString(",")}")
    }
    val offsetsDir = ckpt.resolve("offsets")
    val offs = Files.list(offsetsDir).iterator()
    val offSeq = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (offs.hasNext) {
      val p = offs.next()
      // Skip Hadoop's binary .crc siblings: only the numeric batch
      // files are the offsets log.
      if (p.getFileName.toString.matches("\\d+")) {
        val v = scala.io.Source.fromFile(p.toFile).getLines().toSeq.last
        offSeq += ((p.getFileName.toString, v))
      }
    }
    offSeq.sortBy(_._1.toLong).foreach { case (b, v) =>
      println(s"offsets/$b -> log version $v")
    }
    // The witness ASSERTS the O(new-files) contract so PLANS.txt
    // generation fails loudly on a planning regression: batch 0 is
    // the pinned base snapshot, every later batch exactly one
    // commit's added files — never the base again.
    val byId = batches.sortBy(_._1).toSeq
    require(byId.map(_._3) == Seq(Seq("b0"), Seq("b1"), Seq("b2")) &&
      byId.map(_._2) == Seq(4L, 4L, 4L),
      s"micro-batch planning regression: $byId")
    require(offSeq.sortBy(_._1.toLong).map(_._2) == Seq("0", "1", "2"),
      s"offsets must be log versions 0,1,2: $offSeq")

    println("\n===== stream_cdf_feed (change-feed source planning " +
      "witness) =====")
    val ckpt2 = root.resolve("ckpt2")
    val feed = scala.collection.mutable
      .ArrayBuffer.empty[(Long, Seq[(Long, String, Long)])]
    def drainCdf(): Unit = {
      val q2 = spark.readStream.format("graft")
        .option("readChangeFeed", "true")
        .option("changeFeedKey", "id") // the table declares no statsKey
        .load(tbl.toString)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt2.toString)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val rows = df.select(col("_commit_version"),
            col("_change_type"), col("id")).collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
            .sortBy(r => (r._1, r._3)).toSeq
          feed.synchronized { feed += ((id, rows)) }
          ()
        }.start()
      q2.awaitTermination()
    }
    drainCdf() // batch 0: snapshot-as-inserts up to the pinned tip
    TxnLog.deleteByKeyMor(spark, tbl,          // v3: MoR delete, zero
      Seq(5L, 9L).toDF("id"), "id", "d3")      // data files change
    drainCdf() // resumed: ONLY v3's delete rows
    feed.sortBy(_._1).foreach { case (id, rows) =>
      val byV = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (v, rs) =>
        s"v$v:{${rs.map(r => s"${r._2}(id=${r._3})").mkString(",")}}"
      }
      println(s"cdf batch $id: ${byV.mkString(" ")}")
    }
    val resumed = feed.sortBy(_._1).last._2
    require(resumed == Seq((3L, "delete", 5L), (3L, "delete", 9L)),
      s"resumed CDF batch must carry exactly v3's deletes: $resumed")
  }

  /** Optimizer-statistics witness (r17 verdict task 5): the graft
    * scan reports exact rowCount + min/max/NDV column stats from
    * manifest metadata, and the BROADCAST decision flips with table
    * size — including back again when a pushed key filter prunes the
    * big table to one small file. */
  private def statsWitness(spark: SparkSession): Unit = {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    import graft.operators.TxnLog
    import spark.implicits._
    println("\n===== graft scan statistics -> broadcast flip =====")
    val tbl = graft.util.Scratch.dir("graft_plans")
      .resolve(s"stats${System.nanoTime()}")
    Files.createDirectories(tbl)
    val n = 400000L
    val rows = spark.range(1L, n + 1L)
      .select(col("id"), (col("id") * 10L).as("v"))
    for (q <- 0 until 4)
      rows.filter(col("id").between(q * (n / 4) + 1, (q + 1) * (n / 4)))
        .coalesce(1).write.parquet(tbl.resolve(s"q$q").toString)
    val files = (0 until 4).flatMap(q => TxnLog.parquetsUnder(tbl, s"q$q"))
    TxnLog.commitRetry(tbl, "create", _ => files,
      statsFor = _ => TxnLog.keyStats(spark, tbl, files, "id"),
      statsKey = Some("id"))
    val read = graft.sources.GraftTables.read(spark, tbl)
    val stats = read.queryExecution.optimizedPlan.stats
    println(s"reported: rowCount=${stats.rowCount} " +
      s"sizeInBytes=${stats.sizeInBytes} " +
      s"colStats=${stats.attributeStats.map { case (a, cs) =>
        s"${a.name}:[${cs.min.getOrElse("?")},${cs.max.getOrElse("?")}]" +
          s" ndv<=${cs.distinctCount.getOrElse("?")}" }.mkString(" ")}")
    val sizes = TxnLog.tip(tbl).sizes.values
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (sizes.max * 3 / 2).toString)
      val probe = spark.range(1L, 1000000L).toDF("id")
      def joinKind(df: org.apache.spark.sql.DataFrame): String =
        if (df.queryExecution.sparkPlan.exists(_.isInstanceOf[
          org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]))
          "BroadcastHashJoin" else "no broadcast"
      val whole = joinKind(probe.join(read, "id"))
      val pruned = joinKind(probe.join(
        read.filter(col("id") <= 1000L), "id"))
      println(s"whole table (${sizes.sum} B over threshold): $whole")
      println(s"pruned to one file (<= threshold): $pruned")
      require(whole == "no broadcast" && pruned == "BroadcastHashJoin",
        s"broadcast flip regression: whole=$whole pruned=$pruned")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    ndvWitness(spark)
  }

  /** r19: the KMV-sketch NDV witness — a STRING join key (no min/max
    * bounds possible) gets a distinct count from the manifest's
    * merged per-file sketches, and with the CBO on, a probe joined to
    * a GROUP BY on that key broadcasts exactly when the sketch is
    * declared: the aggregate estimates at the true distinct count
    * instead of the input cardinality. */
  private def ndvWitness(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    import graft.operators.TxnLog
    import spark.implicits._
    println("\n===== string-key KMV NDV -> grouped-join broadcast flip =====")
    def mk(): java.nio.file.Path = {
      val t = graft.util.Scratch.dir("graft_plans")
        .resolve(s"ndv${System.nanoTime()}")
      graft.sources.GraftTables.createFrom(t,
        (1L to 40000L).map(i => (s"name${i % 20}", i)).toDF("name", "v"))
      t
    }
    // r20: write paths AUTO-sketch string/integral columns (conf
    // spark.graft.ndv.auto, default on) — the sketched table here gets
    // NO declare call; the negative control opts out, restoring the
    // old declaration-only world.
    val sketched = mk()
    val bare =
      try {
        spark.conf.set(TxnLog.NdvAutoConfKey, "false")
        mk()
      } finally spark.conf.unset(TxnLog.NdvAutoConfKey)
    def nameNdv(t: java.nio.file.Path): String =
      graft.sources.GraftTables.read(spark, t)
        .queryExecution.optimizedPlan.stats.attributeStats.collectFirst {
          case (a, cs) if a.name == "name" =>
            s"ndv=${cs.distinctCount.getOrElse("?")} " +
              s"nulls=${cs.nullCount.getOrElse("?")}"
        }.getOrElse("none")
    println(s"sketched table name stats: ${nameNdv(sketched)}")
    println(s"bare table name stats:     ${nameNdv(bare)}")
    val confs = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (64L << 10).toString)
    val olds = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val probe = (1L to 200000L).map(i => s"name${i % 4000}").toDF("name")
      def joinKind(t: java.nio.file.Path): String = {
        val agg = graft.sources.GraftTables.read(spark, t)
          .groupBy("name").agg(fsum(col("v")).as("sv"))
        if (probe.join(agg, "name").queryExecution.sparkPlan.exists(
          _.isInstanceOf[
            org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]))
          "BroadcastHashJoin" else "no broadcast"
      }
      val s = joinKind(sketched)
      val b = joinKind(bare)
      println(s"probe JOIN (sketched GROUP BY name): $s")
      println(s"probe JOIN (bare     GROUP BY name): $b")
      require(s == "BroadcastHashJoin" && b == "no broadcast",
        s"NDV broadcast flip regression: sketched=$s bare=$b")
    } finally
      olds.foreach { case (k, v) => spark.conf.set(k, v) }
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
