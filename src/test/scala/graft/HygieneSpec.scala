package graft

import org.scalatest.funsuite.AnyFunSuite

/** Session hygiene: a long-lived session running many queries must not
  * accumulate catalog entries. (Cached blocks from localCheckpoint are
  * released on DataFrame GC and are asserted per-operator in the specs
  * that persist; the catalog is the resource that leaked historically —
  * memory-sink tables, `__input__` rebind views, sql-function fixture
  * views.) */
class HygieneSpec extends AnyFunSuite with SparkTestBase {

  test("leak-prone queries leave no temp views or tables behind") {
    val before = spark.catalog.listTables().collect().map(_.name).toSet
    Seq(
      "scan_kafka_batch",      // memory-sink table per micro-batch run
      "stream_dedup",          // memory sink, append mode
      "stream_curation",       // memory sink + dedup state
      "sql_functions",         // fixture temp views
      "transform_chain",       // SQL-step rebind views
      "pipeline_medallion",    // full chain of SQL steps
      "code_validate"
    ).foreach { q =>
      SparkEntry.queries(q)(spark, sfDir).count()
    }
    val after = spark.catalog.listTables().collect().map(_.name).toSet
    assert(after == before,
      s"catalog entries leaked: ${(after -- before).toSeq.sorted}")
  }

  test("persist-heavy queries do not accumulate persisted RDD blocks") {
    // Queries that persist intermediates (shared shingle relations,
    // candidate sets, prefix relations, signatures) must unpersist them
    // before returning — a long-lived session sweeping queries must not
    // pin executor storage without bound. Measured behavior (and what
    // this asserts): all explicit persists drain to zero after GC via
    // the ContextCleaner; a FEW of the most recent eager-localCheckpoint
    // blocks linger until later scheduler activity replaces them (a
    // bounded, last-run-only residue — verified non-accumulating by
    // running the sweep twice and asserting the steady state does not
    // grow).
    def persisted: Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet
    def sweep(): Unit = Seq(
      "dedup_minhash_lsh",
      "dedup_simhash",
      "dedup_ngram_jaccard",
      "dedup_cluster_collapse",
      "dedup_minhash_incremental",
      "text_decontaminate"
    ).foreach { q => SparkEntry.queries(q)(spark, sfDir).count() }
    def drainTo(before: Set[Int], tolerance: Int): Set[Int] = {
      val deadline = System.currentTimeMillis + 30000
      var leftover = persisted -- before
      while (leftover.size > tolerance &&
          System.currentTimeMillis < deadline) {
        System.gc()
        Thread.sleep(500)
        leftover = persisted -- before
      }
      leftover
    }
    val residueBudget = 6
    val base = persisted
    sweep()
    val afterOne = drainTo(base, residueBudget)
    sweep()
    val afterTwo = drainTo(base, residueBudget)
    assert(afterOne.size <= residueBudget,
      s"first sweep left ${afterOne.size} persisted blocks: $afterOne")
    assert(afterTwo.size <= residueBudget,
      s"second sweep grew the residue to ${afterTwo.size}: $afterTwo " +
        "— persisted blocks are accumulating across runs")
  }
}
