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
}
