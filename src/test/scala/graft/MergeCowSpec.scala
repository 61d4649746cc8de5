package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SourceSinkQueries

/** Copy-on-write MERGE core: row semantics (update / insert / delete /
  * keep / tombstone-miss) and the partition-scoped rewrite witnesses,
  * on a table small enough to enumerate exactly. */
class MergeCowSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def freshTable(): String = {
    val tbl = graft.util.Scratch.dir("graft_mergespec")
      .resolve(s"t${System.nanoTime()}").toString
    Seq((1L, 10.0, 1), (2L, 20.0, 1), (5L, 50.0, 2), (6L, 60.0, 2),
      (9L, 90.0, 3))
      .toDF("id", "v", "p").write.partitionBy("p").parquet(tbl)
    tbl
  }

  test("update, insert, delete, keep, and tombstone-miss all land") {
    val tbl = freshTable()
    val source = Seq(
      (1L, 111.0, 1, "upsert"),  // matched -> update
      (7L, 77.0, 2, "upsert"),   // unmatched -> insert
      (5L, 0.0, 2, "delete"),    // matched tombstone -> delete
      (8L, 0.0, 2, "delete"))    // unmatched tombstone -> no-op
      .toDF("id", "v", "p", "op")
    val (intact, rewritten) =
      SourceSinkQueries.mergeCow(spark, tbl, source, "id", "p")
    assert(intact, "partition p=3 had no changes and must keep its files")
    assert(rewritten, "partitions p=1 and p=2 must be rewritten")
    val got = spark.read.parquet(tbl).select("id", "v", "p")
      .as[(Long, Double, Int)].collect().toSet
    assert(got == Set(
      (1L, 111.0, 1),  // updated
      (2L, 20.0, 1),   // kept (same partition as an update)
      (6L, 60.0, 2),   // kept
      (7L, 77.0, 2),   // inserted
      (9L, 90.0, 3)))  // untouched partition
  }

  test("an upsert can restate a value column to NULL") {
    // The contract-mismatch trap from round 11's ADVICE: coalesce-based
    // merging silently kept the target's old value whenever an upsert
    // carried a legitimate NULL. Provenance-based selection (s.op
    // non-null = the source side matched) must let NULL overwrite.
    val tbl = freshTable()
    val source = Seq((1L, Option.empty[Double], 1, "upsert"))
      .toDF("id", "v", "p", "op")
    SourceSinkQueries.mergeCow(spark, tbl, source, "id", "p")
    val got = spark.read.parquet(tbl).filter($"id" === 1L)
      .select("v").collect()
    assert(got.length == 1 && got.head.isNullAt(0),
      "upsert carrying NULL must overwrite, not resurrect the old value")
  }

  test("log merge: update/insert/delete/NULL-restate land; stats heal and carry") {
    val tbl = graft.util.Scratch.dir("graft_logmerge")
      .resolve(s"t${System.nanoTime()}")
    java.nio.file.Files.createDirectories(tbl)
    Seq((1L, Some(10L)), (2L, Some(20L)), (50L, Some(500L)),
      (60L, Some(600L)))
      .toDF("id", "v").repartitionByRange(2, $"id")
      .sortWithinPartitions("id")
      .write.parquet(tbl.resolve("d0").toString)
    // Create WITHOUT stats: the first merge must bootstrap via scan...
    graft.operators.TxnLog.commitRetry(tbl, "create",
      _ => graft.operators.TxnLog.parquetsUnder(tbl, "d0"))
    val batch = Seq(
      (1L, Some(111L), "upsert"),                // update
      (2L, Option.empty[Long], "upsert"),        // restate to NULL
      (3L, Some(33L), "upsert"),                 // insert (low range)
      (50L, Option.empty[Long], "delete"))       // delete
      .toDF("id", "v", "op")
    graft.operators.TxnLog.mergeCowByKey(spark, tbl, batch, "id", "m0")
    val tip = graft.operators.TxnLog.readManifest(tbl,
      graft.operators.TxnLog.latest(tbl).get)
    // ...and every surviving + new file carries stats afterwards.
    assert(tip.files.forall(tip.stats.contains),
      s"merge commit must leave a fully stats-bearing tip: $tip")
    val got = graft.operators.TxnLog
      .readVersion(spark, tbl, tip.version)
      .as[(Long, Option[Long])].collect().toSet
    assert(got == Set((1L, Some(111L)), (2L, None), (3L, Some(33L)),
      (60L, Some(600L))))
  }

  test("log merge plans its affected set from manifest stats, not the data") {
    // The sharp witness: a manifest whose stats DISAGREE with the file
    // contents. File f0 actually holds keys 1-2, but its committed
    // stats claim [1000, 2000]. A batch at key 1 must then MISS f0 —
    // wrong result by construction — proving the planner read the
    // metadata. (A scan-based planner would find and rewrite f0.)
    val tbl = graft.util.Scratch.dir("graft_logmerge")
      .resolve(s"s${System.nanoTime()}")
    java.nio.file.Files.createDirectories(tbl)
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v").coalesce(1)
      .write.parquet(tbl.resolve("d0").toString)
    val f0 = graft.operators.TxnLog.parquetsUnder(tbl, "d0")
    graft.operators.TxnLog.commitRetry(tbl, "create", _ => f0,
      statsFor = _ => Map(f0.head -> (1000L, 2000L)))
    val batch = Seq((1L, 111L, "upsert")).toDF("id", "v", "op")
    graft.operators.TxnLog.mergeCowByKey(spark, tbl, batch, "id", "m0")
    val tip = graft.operators.TxnLog.readManifest(tbl,
      graft.operators.TxnLog.latest(tbl).get)
    assert(tip.files.contains(f0.head),
      "f0 must survive untouched: its (false) stats exclude the batch range")
    // Key 1 now exists twice (the stale f0 copy and the insert-path
    // m0 copy) — exactly the corruption wrong stats produce, which is
    // the proof the stats were trusted.
    val n = graft.operators.TxnLog
      .readVersion(spark, tbl, tip.version)
      .filter($"id" === 1L).count()
    assert(n == 2L)
  }

  test("concurrent overlapping merges serialize: replan on conflict, no duplicate keys") {
    // The COW-vs-append distinction: appends commute under rebase, but
    // two writers rewriting the SAME file must not both land their
    // rewrites — a naive file-set union would leave the contested key
    // twice (once in each rewrite). The loser must abandon its files
    // and REPLAN against the new tip, so the two merges serialize.
    val tbl = graft.util.Scratch.dir("graft_logmerge")
      .resolve(s"c${System.nanoTime()}")
    java.nio.file.Files.createDirectories(tbl)
    Seq((1L, 0L), (2L, 20L), (3L, 30L)).toDF("id", "v").coalesce(1)
      .write.parquet(tbl.resolve("d0").toString)
    val f0 = graft.operators.TxnLog.parquetsUnder(tbl, "d0")
    graft.operators.TxnLog.commitRetry(tbl, "create", _ => f0,
      statsFor = _ => Map(f0.head -> (1L, 3L)))
    val batchA = Seq((1L, 100L, "upsert")).toDF("id", "v", "op")
    val batchB = Seq((1L, 200L, "upsert")).toDF("id", "v", "op")
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentHashMap[
      String, graft.operators.TxnLog.Committed]()
    def writer(name: String, b: org.apache.spark.sql.DataFrame): Thread =
      new Thread(() => {
        gate.await()
        results.put(name,
          graft.operators.TxnLog.mergeCowByKey(spark, tbl, b, "id", name))
      })
    val (wa, wb) = (writer("wa", batchA), writer("wb", batchB))
    wa.start(); wb.start(); gate.countDown(); wa.join(); wb.join()
    val (ca, cb) = (results.get("wa"), results.get("wb"))
    assert(Set(ca.version, cb.version) == Set(1L, 2L))
    assert(ca.conflicts + cb.conflicts == 1,
      s"exactly one lost race expected, got $ca / $cb")
    val tipV = graft.operators.TxnLog.latest(tbl).get
    val rows = graft.operators.TxnLog.readVersion(spark, tbl, tipV)
      .as[(Long, Long)].collect().toMap
    // No duplicate key 1 (the naive-union corruption), untouched keys
    // survive, and the surviving value is the SECOND committer's — the
    // serial order the log chose.
    assert(graft.operators.TxnLog.readVersion(spark, tbl, tipV)
      .filter($"id" === 1L).count() == 1L)
    assert(rows(2L) == 20L && rows(3L) == 30L)
    val lastWriter = if (ca.version == 2L) "wa" else "wb"
    val expected = if (lastWriter == "wa") 100L else 200L
    assert(rows(1L) == expected,
      s"tip must reflect the serially-last merge ($lastWriter)")
  }

  test("a one-partition change batch leaves every other partition's files alone") {
    val tbl = freshTable()
    def sig(p: Int): Seq[String] =
      new java.io.File(s"$tbl/p=$p").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq.sorted
    val before2 = sig(2); val before3 = sig(3)
    val source = Seq((2L, 222.0, 1, "upsert")).toDF("id", "v", "p", "op")
    val (intact, rewritten) =
      SourceSinkQueries.mergeCow(spark, tbl, source, "id", "p")
    assert(intact && rewritten)
    assert(sig(2) == before2 && sig(3) == before3,
      "only p=1 may be rewritten by a p=1 change batch")
  }
}
