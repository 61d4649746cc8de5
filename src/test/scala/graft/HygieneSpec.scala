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

  test("persist-heavy queries leave no persisted RDD blocks behind") {
    // Queries that persist intermediates (shared shingle relations,
    // candidate sets, prefix relations, signatures) must unpersist them
    // before returning: a long-lived session sweeping all queries would
    // otherwise pin executor storage. localCheckpoint blocks owned by
    // LIVE results are exempt — they are released when the DataFrame is
    // collected and dropped — so the sweep collects each result first
    // and only then asserts the persistent-RDD map is back to baseline.
    def persisted: Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet
    System.gc() // drop blocks owned by earlier suites' dead DataFrames
    Seq(
      "dedup_minhash_lsh",
      "dedup_simhash",
      "dedup_ngram_jaccard",
      "dedup_cluster_collapse",
      "text_decontaminate"
    ).foreach { q =>
      val before = persisted
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.count()
      val leaked = persisted -- before
      // the query's own eager localCheckpoint result may still be
      // referenced by `df`; everything else must be gone
      assert(leaked.size <= 2,
        s"$q leaked persisted RDDs beyond its live result: $leaked")
    }
  }
}
