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
