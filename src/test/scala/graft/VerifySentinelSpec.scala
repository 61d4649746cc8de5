package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Round 8 lesson: a query that THROWS during Verify must still leave a
  * keyed, loudly-wrong output — six analysis-time failures produced no
  * output directory and silently vanished from the round's correctness
  * JSON. This pins the sentinel contract with a deliberately-broken
  * query next to a healthy one. */
class VerifySentinelSpec extends AnyFunSuite with SparkTestBase {

  test("a throwing query yields a keyed sentinel parquet and an error entry") {
    val out = Files.createTempDirectory("graft_vsentinel").toString
    val errors = Verify.runQueries(spark, Map(
      "healthy" -> ((s, dir) =>
        graft.operators.Relational.table(s, dir, "region")),
      "broken" -> ((_, _) =>
        sys.error("deliberate analysis-time failure"))),
      sfDir, out)
    // Healthy query: real output, no error entry.
    assert(spark.read.parquet(s"$out/healthy").count() > 0)
    assert(!errors.contains("healthy"))
    // Broken query: still a readable keyed output whose schema no oracle
    // can match, carrying the error text; plus an errors.json entry.
    val sentinel = spark.read.parquet(s"$out/broken")
    assert(sentinel.columns.toSeq == Seq("__graft_query_error__"))
    assert(sentinel.head().getString(0).contains("deliberate"))
    assert(errors("broken").contains("deliberate"))
  }
}
