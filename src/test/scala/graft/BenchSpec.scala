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

  // ==== sample-level local factors (round 18): the pass factor's blind
  // spot is an episode SHORTER than a pass — these pin the estimator on
  // the r17 driver-run shape (sub-pass stall, pass factors ~1.1 while
  // samples spike 5x).

  /** Synthetic interleaved schedule: nQ queries per pass, 1 s apart. */
  private def grid(nQ: Int, passes: Int): Array[Vector[Double]] =
    Array.tabulate(nQ)(i =>
      Vector.tabulate(passes)(p => (p * nQ + i).toDouble))

  test("localFactors ~1.0 on a clean run (dense windows, no fallback)") {
    val samples = Array.fill(50)(Vector(1.0, 1.0, 1.0, 1.0, 1.0))
    val times = grid(50, 5)
    val f = Bench.localFactors(samples, times, Array.fill(5)(1.0))
    assert(f.forall(_.forall(v => math.abs(v - 1.0) < 1e-9)))
  }

  test("localFactors scrubs recurring sub-pass episodes the pass factor " +
      "dilutes: the r17 driver-run shape (110 s episodes inside 150 s " +
      "passes, recurring) raw-flags ~111 queries, normalized flags 0") {
    // 150 queries x 5 passes (1 s spacing => 150 s passes); two 3.5x
    // load episodes at wall-clock [180,290) (inside pass 2) and
    // [630,740) (inside pass 5) hit queries 30-140 TWICE — past the
    // trim, so the raw spread stat flags all of them, exactly the
    // round-17 13-flag signature scaled up
    val nQ = 150
    val times = grid(nQ, 5)
    val samples = Array.tabulate(nQ) { i =>
      Vector.tabulate(5) { p =>
        val t = times(i)(p)
        if ((t >= 180 && t < 290) || (t >= 630 && t < 740)) 3.5 else 1.0
      }
    }
    def trimmedSpread(v: Vector[Double]): Double = {
      val s = v.sorted.tail.init
      s.last / s.head
    }
    val rawFlags = samples.count(trimmedSpread(_) > 3.0)
    assert(rawFlags > 80, s"scenario should raw-flag heavily: $rawFlags")
    // the pass factor is diluted: 110 of 150 pass-2 ratios loaded, so
    // it reads ~3.5 only when the episode covers most of the pass —
    // here it reads the episode but UNDER-corrects edge samples; the
    // r17 real runs had <50% coverage and factors ~1.1. Either way the
    // LOCAL factor must fully scrub the flags:
    val f = Bench.localFactors(samples, times, Bench.passFactors(samples))
    val normFlags = samples.indices.count { i =>
      trimmedSpread(samples(i).indices.toVector.map(p =>
        samples(i)(p) / f(i)(p))) > 3.0
    }
    assert(normFlags == 0, s"$normFlags spurious flags survived")
  }

  test("localFactors excludes the query's own samples: a genuine 10x " +
      "single-query regression is NOT calibrated away") {
    val nQ = 30
    val times = grid(nQ, 5)
    val samples = Array.tabulate(nQ)(i =>
      Vector.fill(5)(if (i == 7) 10.0 else 1.0))
    val f = Bench.localFactors(samples, times, Array.fill(5)(1.0))
    // its own factor stays ~1 (its neighbors are clean), so its
    // normalized time keeps the regression visible
    assert(f(7).forall(v => math.abs(v - 1.0) < 0.05))
  }

  test("localFactors falls back to the pass factor on sparse windows " +
      "(isolation micro-runs)") {
    // 2 queries, samples 100 s apart: no window ever holds >= 5 foreign
    // samples, so the supplied pass fallback is used verbatim
    val samples = Array(Vector(1.0, 2.0), Vector(1.0, 2.0))
    val times = Array(Vector(0.0, 200.0), Vector(100.0, 300.0))
    val fallback = Array(1.0, 2.0)
    val f = Bench.localFactors(samples, times, fallback)
    assert(f(0) == Vector(1.0, 2.0) && f(1) == Vector(1.0, 2.0))
  }

  test("controls carry positive pins and exist in benchQueries") {
    assert(Bench.Controls.nonEmpty && Bench.Controls.size >= 4)
    assert(Bench.Controls.forall(_._2 > 0))
    val names = SparkEntry.benchQueries.toSet
    val missing = Bench.Controls.map(_._1).filterNot(names.contains)
    assert(missing.isEmpty,
      s"pinned controls missing from benchQueries: $missing")
  }

  test("retimeClears: quiet reproducing samples clear; a retime pass " +
      "that THREW never clears even with fast quiet samples (a failing " +
      "query must keep its flag); noisy or slow retimes keep the flag") {
    val quiet = Seq(1.0, 1.1, 0.9)
    assert(Bench.retimeClears(quiet, runMed = 1.0, threw = false))
    // the ADVICE r18 hazard: a throwing pass records a fast elapsed
    // time — identical samples must NOT clear when any pass failed
    assert(!Bench.retimeClears(quiet, runMed = 1.0, threw = true))
    assert(!Bench.retimeClears(Seq(0.01, 0.01, 0.01), runMed = 1.0,
      threw = true))
    // spread > 2x (bimodal plan or a fresh episode): keep the flag
    assert(!Bench.retimeClears(Seq(1.0, 2.5, 1.0), runMed = 1.0,
      threw = false))
    // median above 1.5x the run's own: the regression is real
    assert(!Bench.retimeClears(Seq(2.0, 2.1, 1.9), runMed = 1.0,
      threw = false))
  }
}
