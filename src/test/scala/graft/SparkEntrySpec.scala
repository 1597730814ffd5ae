package graft

class SparkEntrySpec extends SparkSpec {

  test("driver contract: every registered query has a DuckDB oracle twin") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without oracleSql (would downgrade to rows-only): $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without a query: $orphans")
  }

  test("driver contract: bench set is a subset of registered queries") {
    val unknown = SparkEntry.benchQueries.toSet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"benchQueries not in queries: $unknown")
    assert(SparkEntry.benchQueries.distinct.size == SparkEntry.benchQueries.size,
      "duplicate bench entries")
    // the intentionally quadratic exact variant must never be benched
    assert(!SparkEntry.benchQueries.contains("embedding_near_dup"))
  }

  test("driver contract: flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
