// In package graft.sources (file lives with the other specs) so the
// tests can drive the write's package-private configured-scan state.
package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.connector.write.{RowLevelOperation, WriterCommitMessage}
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TxnLog

/** The row-level (UPDATE/MERGE/complex-DELETE) conflict discipline:
  * a lost commit race REBASES automatically when every intervening
  * commit is disjoint from the rewrite's planned groups, and refuses
  * loudly only when a concurrent commit rewrote a scanned file —
  * Delta's WriteSerializable conflict check, staged here as a
  * deterministic two-writer interleaving. */
class RowLevelConflictSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** A two-file table (keys 1–50 / 51–100) with key stats. */
  private def twoFileTable(): (Path, Seq[String], Seq[String]) = {
    val tbl = graft.util.Scratch.dir("graft_rlconflict")
      .resolve(s"t${System.nanoTime()}")
    Files.createDirectories(tbl)
    (1L to 50L).map(i => (i, i * 10L)).toDF("id", "v")
      .coalesce(1).write.parquet(tbl.resolve("lo").toString)
    (51L to 100L).map(i => (i, i * 10L)).toDF("id", "v")
      .coalesce(1).write.parquet(tbl.resolve("hi").toString)
    val lo = TxnLog.parquetsUnder(tbl, "lo")
    val hi = TxnLog.parquetsUnder(tbl, "hi")
    TxnLog.commitRetry(tbl, "create", _ => lo ++ hi,
      statsFor = _ => TxnLog.keyStats(spark, tbl, lo ++ hi, "id"),
      statsKey = Some("id"))
    (tbl, lo, hi)
  }

  /** Stage a replacement file (v = id*10 + 1) and its commit message. */
  private def stage(tbl: Path, sub: String, lo: Long, hi: Long): GraftWrittenFile = {
    (lo to hi).map(i => (i, i * 10L + 1L)).toDF("id", "v")
      .coalesce(1).write.parquet(tbl.resolve(sub).toString)
    GraftWrittenFile(TxnLog.parquetsUnder(tbl, sub).head, hi - lo + 1L)
  }

  test("a row-level commit REBASES over a concurrent disjoint append") {
    val (tbl, loFiles, hiFiles) = twoFileTable()
    val snap = GraftTables.resolve(Map("path" -> tbl.toString))
    val op = new GraftRowLevelOperation(snap, RowLevelOperation.Command.UPDATE)
    op.scannedFiles = loFiles // the statement's scan planned the low group
    val write = new GraftReplaceDataWrite(snap, op)
    val msg = stage(tbl, "rw0", 1L, 50L)
    // A concurrent writer APPENDS a disjoint file between this
    // statement's snapshot read and its commit.
    (200L to 210L).map(i => (i, 7L)).toDF("id", "v")
      .coalesce(1).write.parquet(tbl.resolve("app0").toString)
    val appended = TxnLog.parquetsUnder(tbl, "app0")
    TxnLog.commitRetry(tbl, "append", t => t.files ++ appended)
    // The rewrite still lands — rebased onto the appended tip.
    write.commit(Array[WriterCommitMessage](msg))
    assert(TxnLog.latest(tbl).contains(2L))
    val tip = TxnLog.readManifest(tbl, 2L)
    assert(tip.action == "replace")
    assert(!tip.files.exists(loFiles.contains), "scanned group replaced")
    assert(hiFiles.forall(tip.files.contains), "unscanned file survives")
    assert(appended.forall(tip.files.contains),
      "the concurrent append must NOT be clobbered by the rebase")
    val rows = GraftTables.read(spark, tbl)
    assert(rows.count() == 111L)
    assert(rows.filter($"id" <= 50L).agg(sum($"v")).head.getLong(0) ==
      (1L to 50L).map(_ * 10L + 1L).sum, "the rewrite's rows landed")
    assert(rows.filter($"id" >= 200L).count() == 11L)
  }

  test("a row-level commit REFUSES when a concurrent commit rewrote a scanned file") {
    val (tbl, _, hiFiles) = twoFileTable()
    val snap = GraftTables.resolve(Map("path" -> tbl.toString))
    val op = new GraftRowLevelOperation(snap, RowLevelOperation.Command.UPDATE)
    op.scannedFiles = hiFiles
    val write = new GraftReplaceDataWrite(snap, op)
    val msg = stage(tbl, "rw1", 51L, 100L)
    // A concurrent writer REWRITES the same high file (a compaction,
    // a delete — anything removing a scanned group).
    (51L to 100L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.parquet(tbl.resolve("cc").toString)
    TxnLog.commitRetry(tbl, "cow",
      t => t.files.filterNot(hiFiles.contains) ++
        TxnLog.parquetsUnder(tbl, "cc"))
    val e = intercept[RuntimeException](
      write.commit(Array[WriterCommitMessage](msg)))
    assert(e.getMessage.contains("does not commute"))
    // The refused statement committed nothing; the concurrent
    // rewrite's data is intact.
    assert(TxnLog.latest(tbl).contains(1L))
    assert(GraftTables.read(spark, tbl)
      .filter($"id" === 60L).select($"v").head.getLong(0) == 60L)
  }

  /** Stage a delta task output: a data file of rewritten rows plus a
    * position-delete file naming `target` ordinals 0..n-1. */
  private def stageDelta(tbl: Path, sub: String, target: String,
      lo: Long, hi: Long): GraftDeltaFiles = {
    (lo to hi).map(i => (i, i * 10L + 1L)).toDF("id", "v")
      .coalesce(1).write.parquet(tbl.resolve(s"$sub-d").toString)
    (0L to (hi - lo)).map(p => (target, p)).toDF("file_path", "pos")
      .coalesce(1).write.parquet(tbl.resolve(s"$sub-p").toString)
    GraftDeltaFiles(
      Some(TxnLog.parquetsUnder(tbl, s"$sub-d").head), hi - lo + 1L,
      Some(TxnLog.parquetsUnder(tbl, s"$sub-p").head), hi - lo + 1L)
  }

  test("a DELTA commit rebases over a disjoint append; refuses when a " +
      "position-targeted file was rewritten or a MoR delete raced in") {
    val (tbl, loFiles, hiFiles) = twoFileTable()
    val snap = GraftTables.resolve(Map("path" -> tbl.toString))
    val write = new GraftDeltaBatchWrite(snap,
      RowLevelOperation.Command.UPDATE)
    val msg = stageDelta(tbl, "dl0", loFiles.head, 1L, 50L)
    // Concurrent DISJOINT append: commutes, commit rebases onto it.
    (200L to 210L).map(i => (i, 7L)).toDF("id", "v")
      .coalesce(1).write.parquet(tbl.resolve("app0").toString)
    val appended = TxnLog.parquetsUnder(tbl, "app0")
    TxnLog.commitRetry(tbl, "append", t => t.files ++ appended)
    write.commit(Array[WriterCommitMessage](msg))
    val tip = TxnLog.tip(tbl)
    assert(tip.version == 2L && tip.action == "update-mor")
    assert((loFiles ++ hiFiles ++ appended).forall(tip.files.contains),
      "delta appends; nothing removed, the append not clobbered")
    assert(tip.deletes.map(_.kind) == Seq("pos"))
    val rows = GraftTables.read(spark, tbl)
    assert(rows.count() == 111L)
    assert(rows.filter($"id" <= 50L).agg(sum($"v")).head.getLong(0) ==
      (1L to 50L).map(_ * 10L + 1L).sum)
    // Refusal 1: a concurrent commit REWRITES a position-targeted
    // file — the recorded ordinals would delete the wrong rows.
    val snap2 = GraftTables.resolve(Map("path" -> tbl.toString))
    val write2 = new GraftDeltaBatchWrite(snap2,
      RowLevelOperation.Command.UPDATE)
    val msg2 = stageDelta(tbl, "dl1", hiFiles.head, 51L, 100L)
    (51L to 100L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.parquet(tbl.resolve("cc").toString)
    TxnLog.commitRetry(tbl, "cow",
      t => t.files.filterNot(hiFiles.contains) ++
        TxnLog.parquetsUnder(tbl, "cc"))
    val e1 = intercept[RuntimeException](
      write2.commit(Array[WriterCommitMessage](msg2)))
    assert(e1.getMessage.contains("does not commute"))
    // Refusal 2: a concurrent NEW equality delete — this statement's
    // fresh-seq output would escape it, resurrecting deleted rows.
    val snap3 = GraftTables.resolve(Map("path" -> tbl.toString))
    val write3 = new GraftDeltaBatchWrite(snap3,
      RowLevelOperation.Command.UPDATE)
    val msg3 = stageDelta(tbl, "dl2", loFiles.head, 1L, 10L)
    TxnLog.deleteByKeyMor(spark, tbl, Seq(5L).toDF("id"), "id", "ed")
    val e2 = intercept[RuntimeException](
      write3.commit(Array[WriterCommitMessage](msg3)))
    assert(e2.getMessage.contains("merge-on-read delete"))
  }
}
