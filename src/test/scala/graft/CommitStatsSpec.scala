package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxnLog

/** Pins the r21 fused commit-stats pass ([[TxnLog.commitStatsFor]]) to
  * the three primitives it replaced: for any file set / declaration
  * set, the fused single-scan result must equal keyStats +
  * colStatsFor + ndvSketchFor computed separately — including the
  * EmptyRange convention for all-NULL columns, the no-entry
  * convention for zero-row files, the auto-NDV column expansion, and
  * the integral-type refusal. The manifests commits write from the
  * fused pass are therefore byte-identical to the three-scan form. */
class CommitStatsSpec extends AnyFunSuite with SparkTestBase {

  private def freshTable(): Path = {
    val p = graft.util.Scratch.dir("graft_cstats")
      .resolve(s"t${System.nanoTime()}")
    Files.createDirectories(p)
    p
  }

  /** Two data files with nulls in the value columns + one file whose
    * string column is entirely NULL (EmptyRange arm). */
  private def fixture(): (Path, Seq[String]) = {
    val t = freshTable()
    import spark.implicits._
    val a = Seq((1L, 10, "x"), (2L, 20, "y"), (3L, 30, null: String))
      .toDF("k", "v", "s")
    val b = Seq((40L, 5, "x"), (50L, 7, "z")).toDF("k", "v", "s")
    val c = Seq((60L, 9, null: String), (61L, 11, null: String))
      .toDF("k", "v", "s")
    a.coalesce(1).write.parquet(t.resolve("fa").toString)
    b.coalesce(1).write.parquet(t.resolve("fb").toString)
    c.coalesce(1).write.parquet(t.resolve("fc").toString)
    val files = Seq("fa", "fb", "fc").flatMap(d =>
      TxnLog.parquetsUnder(t, d))
    (t, files)
  }

  test("fused pass equals the three primitives, auto-NDV on") {
    val (t, files) = fixture()
    val key = Some("k")
    val colCols = Seq("v")
    val ndvCols = Seq("s")
    val fused = TxnLog.commitStatsFor(spark, t, files, key, colCols, ndvCols)
    val sep = (
      TxnLog.keyStats(spark, t, files, "k"),
      TxnLog.colStatsFor(spark, t, files, colCols),
      TxnLog.ndvSketchFor(spark, t, files, ndvCols, auto = true))
    assert(fused.key == sep._1)
    assert(fused.colStats == sep._2)
    assert(fused.ndv == sep._3)
    // Auto mode expanded beyond the declared column (k, v eligible).
    assert(fused.ndv.keySet == Set("k", "v", "s"))
  }

  test("fused pass equals the primitives with auto-NDV off") {
    val (t, files) = fixture()
    spark.conf.set(TxnLog.NdvAutoConfKey, "false")
    try {
      val fused = TxnLog.commitStatsFor(spark, t, files,
        Some("k"), Seq("v"), Seq("s"))
      assert(fused.key == TxnLog.keyStats(spark, t, files, "k"))
      assert(fused.colStats == TxnLog.colStatsFor(spark, t, files, Seq("v")))
      assert(fused.ndv ==
        TxnLog.ndvSketchFor(spark, t, files, Seq("s"), auto = true))
      assert(fused.ndv.keySet == Set("s"))
    } finally spark.conf.unset(TxnLog.NdvAutoConfKey)
  }

  test("all-NULL string file carries EmptyRange-convention ndv and bounds") {
    val (t, files) = fixture()
    val fused = TxnLog.commitStatsFor(spark, t, files,
      Some("k"), Seq("v"), Seq("s"))
    val fc = files.find(_.startsWith("fc")).get
    // fc's s column is entirely NULL: nullCount 2, empty sketch tail.
    assert(fused.ndv("s")(fc) == Seq(2L))
    // Key/col bounds for fc exist (k, v are non-null there).
    assert(fused.key(fc) == (60L, 61L))
    assert(fused.colStats("v")(fc) == (9L, 11L))
  }

  test("empty file list and empty declaration sets return empties, no scan") {
    val (t, files) = fixture()
    val noFiles = TxnLog.commitStatsFor(spark, t, Seq.empty,
      Some("k"), Seq("v"), Seq("s"))
    assert(noFiles.key.isEmpty)
    assert(noFiles.colStats == Map("v" -> Map.empty))
    assert(noFiles.ndv == Map("s" -> Map.empty))
    spark.conf.set(TxnLog.NdvAutoConfKey, "false")
    try {
      val nothing = TxnLog.commitStatsFor(spark, t, files,
        None, Seq.empty, Seq.empty)
      assert(nothing == TxnLog.CommitStats.empty)
    } finally spark.conf.unset(TxnLog.NdvAutoConfKey)
  }

  test("non-integral colStats declaration refuses loudly") {
    val (t, files) = fixture()
    val e = intercept[RuntimeException] {
      TxnLog.commitStatsFor(spark, t, files, None, Seq("s"), Seq.empty)
    }
    assert(e.getMessage.contains("non-integral"))
    val missing = intercept[RuntimeException] {
      TxnLog.commitStatsFor(spark, t, files, None, Seq("nope"), Seq.empty)
    }
    assert(missing.getMessage.contains("does not exist"))
  }

  test("fused pass runs ONE job where the primitives ran three") {
    val (t, files) = fixture()
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      TxnLog.commitStatsFor(spark, t, files, Some("k"), Seq("v"), Seq("s"))
      Thread.sleep(300) // let listener events drain
      val fusedJobs = counter.get()
      counter.set(0)
      TxnLog.keyStats(spark, t, files, "k")
      TxnLog.colStatsFor(spark, t, files, Seq("v"))
      TxnLog.ndvSketchFor(spark, t, files, Seq("s"), auto = true)
      Thread.sleep(300) // let listener events drain
      val separateJobs = counter.get()
      assert(fusedJobs * 3 <= separateJobs,
        s"fused=$fusedJobs separate=$separateJobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
