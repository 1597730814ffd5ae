package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pure-function drill of [[Bench]]'s drift calibration (round 17 —
 * VERDICT r16 #1): four consecutive rounds of ambient host drift were
 * hand-adjudicated by re-timing untouched controls; the bench now does
 * that arithmetic itself. These tests pin the estimator on synthetic
 * sample matrices shaped like the observed episodes.
 */
class BenchSpec extends AnyFunSuite {

  test("passFactors ~1.0 on a clean run") {
    // 4 queries x 5 passes, flat times
    val samples = Array(
      Vector(1.0, 1.0, 1.0, 1.0, 1.0),
      Vector(2.0, 2.0, 2.0, 2.0, 2.0),
      Vector(0.5, 0.5, 0.5, 0.5, 0.5),
      Vector(3.0, 3.0, 3.0, 3.0, 3.0))
    val f = Bench.passFactors(samples)
    assert(f.length == 5)
    assert(f.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("passFactors isolates a loaded pass: every query inflated 1.5x " +
      "in pass 3 reads as factor 1.5 there, ~1.0 elsewhere") {
    // the r14-r16 ambient-drift signature: query-INDEPENDENT inflation
    val base = Array(1.0, 2.0, 0.5, 3.0, 4.0, 0.8)
    val samples = base.map(b =>
      Vector(b, b, b * 1.5, b, b))
    val f = Bench.passFactors(samples)
    assert(math.abs(f(2) - 1.5) < 0.01, f.mkString(","))
    assert(Seq(0, 1, 3, 4).forall(p => math.abs(f(p) - 1.0) < 0.01))
  }

  test("passFactors is robust to a single-query regression: one query " +
      "10x slower in every pass does not move any pass factor") {
    // a real plan regression moves one ratio of many — the median
    // factor must stay at 1.0, so the regression still shows up in the
    // query's own (normalized) time instead of being calibrated away
    val samples = Array(
      Vector(10.0, 10.0, 10.0, 10.0, 10.0), // regressed query: flat 10x
      Vector(1.0, 1.0, 1.0, 1.0, 1.0),
      Vector(2.0, 2.0, 2.0, 2.0, 2.0),
      Vector(0.5, 0.5, 0.5, 0.5, 0.5),
      Vector(3.0, 3.0, 3.0, 3.0, 3.0))
    val f = Bench.passFactors(samples)
    assert(f.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("passFactors floor: a degenerate estimate never inflates a " +
      "sample more than 4x (factor >= 0.25)") {
    // two queries, pass 1 absurdly fast relative to their medians —
    // the factor is floored rather than multiplying times by >4
    val samples = Array(
      Vector(0.01, 1.0, 1.0, 1.0, 1.0),
      Vector(0.02, 2.0, 2.0, 2.0, 2.0))
    val f = Bench.passFactors(samples)
    assert(f(0) >= 0.25)
  }

  test("controls carry positive pins and exist in benchQueries") {
    assert(Bench.Controls.nonEmpty && Bench.Controls.size >= 4)
    assert(Bench.Controls.forall(_._2 > 0))
    val names = SparkEntry.benchQueries.toSet
    val missing = Bench.Controls.map(_._1).filterNot(names.contains)
    assert(missing.isEmpty,
      s"pinned controls missing from benchQueries: $missing")
  }
}
