package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants for SparkEntry. */
class ContractSpec extends AnyFunSuite with SparkTestBase {

  test("every oracle refers to a declared query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query ids are snake_case") {
    assert(SparkEntry.queries.keys.forall(_.matches("[a-z0-9_]+")))
  }

  test("every query has an oracle (no weaker rows-only checks)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracles: $missing")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
