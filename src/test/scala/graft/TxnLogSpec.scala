package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TxnLog

/** The commit protocol in isolation: put-if-absent atomicity, rebase-
  * and-retry under a real two-thread race, version pinning, and
  * log-derived liveness. Pure filesystem — no SparkSession needed. */
class TxnLogSpec extends AnyFunSuite {

  private def freshTable(): Path = {
    val p = graft.util.Scratch.dir("graft_txnlog")
      .resolve(s"t${System.nanoTime()}")
    Files.createDirectories(p)
    p
  }

  test("render/parse round-trips, including empty file lists") {
    val m = TxnLog.Manifest(3L, 2L, "compact", Seq("a.parquet", "d/b.parquet"))
    assert(TxnLog.parse(TxnLog.render(m)) == m)
    val empty = TxnLog.Manifest(0L, -1L, "create", Seq.empty)
    assert(TxnLog.parse(TxnLog.render(empty)) == empty)
  }

  test("per-file key stats round-trip in the manifest; absent stats parse empty") {
    val m = TxnLog.Manifest(1L, 0L, "merge",
      Seq("a.parquet", "d/b.parquet"),
      Map("a.parquet" -> (-5L, 100L), "d/b.parquet" -> (101L, 900L)))
    assert(TxnLog.parse(TxnLog.render(m)) == m)
    // A pre-stats manifest (round-12 v1 format) still parses.
    val legacy = """{"version":0,"parent":-1,"action":"create","files":["f0"]}"""
    assert(TxnLog.parse(legacy) ==
      TxnLog.Manifest(0L, -1L, "create", Seq("f0")))
  }

  test("stats survive a commit chain through tryCommit") {
    val t = freshTable()
    TxnLog.tryCommit(t, -1L, "create", Seq("f0"),
      Map("f0" -> (1L, 10L)))
    val m = TxnLog.readManifest(t, 0L)
    assert(m.stats == Map("f0" -> (1L, 10L)))
  }

  test("commit chain is contiguous and the loser of a stale commit is refused") {
    val t = freshTable()
    assert(TxnLog.latest(t).isEmpty)
    assert(TxnLog.tryCommit(t, -1L, "create", Seq("f0")) == Some(0L))
    assert(TxnLog.tryCommit(t, 0L, "append", Seq("f0", "f1")) == Some(1L))
    // A writer that read version 0 and missed the append must NOT be
    // able to publish version 1 again — put-if-absent refuses.
    assert(TxnLog.tryCommit(t, 0L, "append", Seq("f0", "f2")).isEmpty)
    assert(TxnLog.versions(t) == Seq(0L, 1L))
    assert(TxnLog.readManifest(t, 1L).files == Seq("f0", "f1"))
    assert(TxnLog.readManifest(t, 1L).parent == 0L)
  }

  test("two genuinely concurrent committers: one conflict, both land, contiguous log") {
    val t = freshTable()
    TxnLog.tryCommit(t, -1L, "create", Seq("base"))
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentHashMap[String, TxnLog.Committed]()
    def writer(name: String, newFile: String): Thread = new Thread(() => {
      gate.await()
      val c = TxnLog.commitRetry(t, "append",
        tip => tip.files :+ newFile)
      results.put(name, c)
    })
    val (a, b) = (writer("a", "fa"), writer("b", "fb"))
    a.start(); b.start(); gate.countDown(); a.join(); b.join()
    val (ca, cb) = (results.get("a"), results.get("b"))
    // Exactly versions 1 and 2 exist, one each; total conflicts is
    // exactly 1 (the loser of the race for version 1 retried once).
    assert(Set(ca.version, cb.version) == Set(1L, 2L))
    assert(ca.conflicts + cb.conflicts == 1)
    assert(TxnLog.versions(t) == Seq(0L, 1L, 2L))
    // The rebase means the final tip carries BOTH writers' files.
    val tip = TxnLog.readManifest(t, 2L)
    assert(tip.files.toSet == Set("base", "fa", "fb"))
    assert(tip.parent == 1L)
  }

  test("liveness derives from retained manifests only") {
    val t = freshTable()
    TxnLog.tryCommit(t, -1L, "create", Seq("f0", "f1"))
    TxnLog.tryCommit(t, 0L, "cow", Seq("f0", "f2")) // f1 rewritten as f2
    assert(TxnLog.liveFiles(t, Seq(0L, 1L)) == Set("f0", "f1", "f2"))
    // Expiring version 0 frees exactly the file only it referenced.
    assert(TxnLog.liveFiles(t, Seq(1L)) == Set("f0", "f2"))
  }
}
