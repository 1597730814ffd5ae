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

  test("ascent termination: ivf_refined_autocal reaches its target at " +
      "EVERY fixture scale the driver runs (round-19 trap: the grid " +
      "accepted at sf0.01 and threw at sf0.1 after the sf0.01 gate " +
      "was already green)") {
    // Density bound behind the pin: at nlist=16 the sf0.1 fixture puts
    // ~125 vectors in a cell (2000/16); with m=4/kcent=16 residual
    // codes the depth-64 ADC shortlist plateaus near 0.625 recall at
    // that density, so the shortlist grid must extend past the plateau
    // (512 = 4x the deepest cell this fixture family produces) for the
    // 0.95 ascent to terminate by deepening instead of throwing. A new
    // ascent-style headliner must repeat this probe at sf0.1 BEFORE
    // entering benchQueries — the bench marks a thrown ascent `failed`
    // while the sf0.01 CORRECTNESS gate stays green.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val curve = SparkEntry.queries("ivf_refined_autocal")(
        spark, s"/root/testdata/$sf").collect()
      val chosen = curve.count(_.getLong(3) == 1L)
      assert(chosen == 1,
        s"$sf: expected exactly one accepted (nprobe, shortlist) row, " +
          s"got $chosen over ${curve.length} curve rows")
    }
  }
}
