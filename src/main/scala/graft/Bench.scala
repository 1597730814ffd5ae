package graft

import org.apache.spark.sql.SparkSession

/**
 * Per-round benchmark main: times each headline query at
 * `SPARK_GRAFT_SF_DIR` (default sf0.1) and prints ONE JSON line.
 *
 * Results are forced through the `noop` sink so every output column is
 * fully materialized (a bare `count()` lets Spark skip column evaluation
 * on scan-shaped queries). Session config matches Verify exactly (UTC,
 * nanosAsLong) so both harnesses see identical plans.
 *
 * Noise protocol (round 7, tightened round 11): one untimed warmup pass
 * over the FULL query set (round 10 — per-query first-touch codegen/IO
 * otherwise lands in pass 1 and inflates spreads to 10-20x), then FIVE
 * INTERLEAVED timed passes (pass 1 of every query, then pass 2, ...),
 * reporting the per-query TRIMMED median: drop each query's single best
 * and single worst sample, median of the middle three. Interleaving
 * spaces a query's repeats minutes apart, so a transient JVM/GC/
 * compilation stall hits at most one of its samples — and the trim
 * discards that one outright (round-10: a mid-pass full-heap GC swept
 * 31 consecutive queries into the >3x-spread flag and put a 12.3x
 * singleton spike on rollup_agg; with 3 samples the median survived
 * but the spread stat could not distinguish one stall from real
 * variance). The reported `spread` is likewise over the TRIMMED
 * samples; raw per-pass samples persist unjudged in the full record.
 * The JVM is also settled (GC + pause) between timed passes, not just
 * after warmup, so one pass's garbage is never the next pass's stall.
 * The full per-query JSON is persisted to `SPARK_GRAFT_BENCH_OUT`
 * (default `BENCH_full.json` in the cwd) so the harness's bounded
 * output tail can never truncate the record.
 *
 * ==Drift calibration (round 17)==
 *
 * Four consecutive rounds (r14-r16) burned builder and judge cycles
 * hand-adjudicating ambient HOST drift — an otherwise-idle box running
 * 1.1-1.3x slow for hours, inflating totals and sweeping unrelated
 * queries into the spread flag, always resolved as noise by isolation
 * re-times of untouched control queries. The bench now self-calibrates
 * at two levels:
 *
 * '''Within-run (per-pass) normalization''' — for each timed pass p,
 * `passFactor(p)` = median over ALL queries of
 * `sample(q,p) / trimmedMedian(q)`. A pass that ran while the host was
 * loaded shows a factor > 1 across the board (the signature of ambient
 * drift: it is query-INDEPENDENT, unlike a plan regression which moves
 * one query in every pass). Samples are divided by their pass factor
 * before the flag stat is computed, so a mid-run load episode can no
 * longer manufacture >3x spreads on queries whose plan never changed.
 * The median-over-190-queries estimator is robust (a real single-query
 * regression shifts one of 190 ratios — the factor does not move) and
 * needs no pinned history, so it works at any SF.
 *
 * '''Cross-run drift vs pinned controls''' — six UNTOUCHED control
 * queries ([[Controls]]) carry their clean-host sf0.1 trimmed medians
 * (pin provenance on the Controls val: r15/r16 clean runs for the
 * original three, the drift-1.004 round-20 driver run for the round-22
 * replacements).
 * When every control is present in the run (i.e. the full sf0.1
 * headliner set), `drift` = median over controls of
 * `normalizedMedian(c) / pin(c)` is emitted in the summary, alongside
 * `value_normalized = value / drift` — the host-independent total a
 * judge should compare across rounds. On a clean host drift ≈ 1.0;
 * the r16-final 191.8 s episode would have read drift ≈ 1.3,
 * value_normalized ≈ 148 s. Controls are never normalized away for
 * their OWN flag (a control regression still flags); the pin table
 * must be refreshed if a control's operator is ever deliberately
 * changed — CI for that is PlanShapeSpec pinning their plan shapes.
 *
 * Both raw and normalized stats are emitted (`flagged_raw`/`value_raw`
 * keep the old semantics) so the two protocols stay A/B-comparable;
 * the headline `flagged`/`value` are the normalized ones.
 *
 * ==Sample-level calibration + auto-retime (round 18)==
 *
 * The round-17 driver run exposed the pass-granular factor's blind
 * spot: a load episode SHORTER than one pass (1-2 min inside a ~3 min
 * pass) inflates a contiguous wall-clock STRETCH of samples, not a
 * whole pass — the pass factor tops out well under the episode's real
 * magnitude (r17: factors <= 1.17 while individual samples spiked
 * 5-7x) and 13 spurious flags survived to hand adjudication (the
 * isolation re-time then cleared all 13). Two additions close it:
 *
 * '''Per-sample local factors''' — every sample records its wall-clock
 * midpoint; its factor is the median ratio (sample/trimmedMedian) over
 * OTHER queries' samples timed within ±[[LocalWindowSec]] of it. An
 * episode is by definition a wall-clock neighborhood, so the samples
 * inside it calibrate against each other regardless of pass
 * boundaries. Same robustness argument as the pass factor: a real
 * single-query regression is excluded from its own window (same-query
 * samples never contribute), and shifts only 1-of-many ratios in its
 * neighbors' windows. Windows with fewer than [[LocalMinEvents]]
 * foreign samples fall back to the pass factor (filtered micro-runs).
 *
 * '''Auto-retime''' — any query still flagged after local
 * normalization gets [[RetimePasses]] fresh spaced samples at the END
 * of the run (the protocol every round ran by hand via
 * `SPARK_GRAFT_BENCH_QUERIES`). The flag CLEARS if the retime is
 * internally quiet (spread <= 2) and reproduces the run's own
 * normalized median (<= 1.5x) — i.e. the spread was environmental,
 * not plan variance. A genuinely bimodal plan keeps its spread in the
 * retime and the flag stands; a retime that itself lands in an episode
 * also stands (conservative). Cleared queries are reported in
 * `flagged_cleared` with their retime medians in `retimed`, so the
 * judge sees the adjudication instead of re-running it.
 */
object Bench {
  private val Passes = 5
  /** Half-width (wall seconds) of a sample's calibration neighborhood.
   * Sized at half the shortest episode worth catching (~1 min): a
   * 40 s window inside a 1-2 min episode sees only loaded peers, and
   * at the full-set rate of ~1 query/s holds ~40 foreign samples —
   * plenty for a robust median. */
  private[graft] val LocalWindowSec = 20.0
  /** Below this many foreign samples in the window, fall back to the
   * pass factor (isolation micro-runs where one query IS the window). */
  private[graft] val LocalMinEvents = 5
  private[graft] val RetimePasses = 3

  /**
   * Untouched control queries with pinned clean-host sf0.1 trimmed
   * medians (seconds). A drift control must stay UNTOUCHED by the
   * optimizer for its pin to mean anything, so round 22 swapped out the
   * three former controls whose operators were (ppjoin, round 21) or
   * are planned to be (minhash_lsh, pagerank) optimization targets.
   * Replacements are queries on the round-21 "deliberately left alone"
   * list (lm_score, mad_outliers, source_overlap — OPTIMIZATION_r21.md)
   * spanning distinct plan shapes: text-scoring scan, rank-window
   * chain, set-overlap aggregate. Pins for the survivors (q1_agg,
   * q3_top_revenue, q5_region_revenue) are the original r15/r16
   * clean-host medians; pins for the replacements come from the
   * round-20 DRIVER bench (BENCH_r20.json), whose measured drift vs
   * the surviving pins was 1.004 — i.e. a clean host — divided by that
   * 1.004 so all six pins share one scale. Frozen for the remaining
   * optimization round.
   */
  private[graft] val Controls: Seq[(String, Double)] = Seq(
    "q1_agg"            -> 1.20,
    "q3_top_revenue"    -> 0.75,
    "q5_region_revenue" -> 1.03,
    "lm_score"          -> 1.49,
    "mad_outliers"      -> 1.99,
    "source_overlap"    -> 1.95
  )

  private def median(v: Seq[Double]): Double = {
    val s = v.sorted
    if (s.isEmpty) Double.NaN
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** Trimmed samples: drop the single best and worst when n >= 3. */
  private def trim(v: Seq[Double]): Seq[Double] = {
    val s = v.sorted
    if (s.size >= 3) s.tail.init else s
  }

  /**
   * Per-pass ambient-load factors: for pass p, the median over queries
   * of sample(q,p)/trimmedMedian(q). Queries with a non-positive
   * median (shouldn't happen — wall times) are skipped. Factors are
   * floored at 0.25 so a pathological estimate can never inflate a
   * sample 4x+; a clean pass sits at ~1.0 by construction.
   */
  /** Whether an end-of-run retime clears a flag: every retime pass
   * must have SUCCEEDED (a pass that threw records a fast, quiet
   * elapsed time that would otherwise satisfy the criteria and
   * silently clear a genuine failure — ADVICE r18), the spread must be
   * quiet (≤ 2×), and the median must reproduce the run's own
   * normalized median (≤ 1.5×). */
  private[graft] def retimeClears(rs: Seq[Double], runMed: Double,
                                  threw: Boolean): Boolean =
    !threw && rs.nonEmpty && rs.max / rs.min <= 2.0 &&
      median(rs) <= 1.5 * runMed

  private[graft] def passFactors(samples: Array[Vector[Double]]): Array[Double] = {
    val meds = samples.map(v => median(trim(v)))
    val nPasses = samples.map(_.size).max
    Array.tabulate(nPasses) { p =>
      val ratios = samples.indices.collect {
        case i if p < samples(i).size && meds(i) > 0 => samples(i)(p) / meds(i)
      }
      val f = median(ratios.toSeq)
      if (f.isNaN || f <= 0) 1.0 else math.max(f, 0.25)
    }
  }

  /**
   * Per-sample local ambient-load factors. `times(i)(p)` is the
   * wall-clock midpoint (seconds since run start) of query i's pass-p
   * sample. The factor for (i, p) is the median of
   * `sample(j,q)/trimmedMedian(j)` over every OTHER query's sample
   * whose midpoint lies within ±[[LocalWindowSec]]; with fewer than
   * [[LocalMinEvents]] such peers it falls back to `passFallback(p)`.
   * Floored at 0.25 like the pass factor.
   */
  private[graft] def localFactors(samples: Array[Vector[Double]],
                                  times: Array[Vector[Double]],
                                  passFallback: Array[Double]): Array[Vector[Double]] = {
    val meds = samples.map(v => median(trim(v)))
    // flat time-ordered event list: (midpoint, queryIdx, ratio)
    val events = (for {
      j <- samples.indices.iterator
      q <- samples(j).indices.iterator
      if meds(j) > 0 && q < times(j).size
    } yield (times(j)(q), j, samples(j)(q) / meds(j))).toArray.sortBy(_._1)
    val evTimes = events.map(_._1)
    samples.indices.toArray.map { i =>
      Vector.tabulate(samples(i).size) { p =>
        if (p >= times(i).size) 1.0
        else {
          val t = times(i)(p)
          // binary-search the window bounds, then filter out own-query
          var lo = java.util.Arrays.binarySearch(evTimes, t - LocalWindowSec)
          if (lo < 0) lo = -lo - 1
          var hi = java.util.Arrays.binarySearch(evTimes, t + LocalWindowSec)
          if (hi < 0) hi = -hi - 1 else hi += 1
          val ratios = events.view.slice(lo, hi)
            .collect { case (_, j, r) if j != i => r }.toSeq
          val f =
            if (ratios.size < LocalMinEvents)
              passFallback(math.min(p, passFallback.length - 1))
            else median(ratios)
          if (f.isNaN || f <= 0) 1.0 else math.max(f, 0.25)
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // Optional isolation filter (comma-separated query names): the tool
    // for re-timing flagged queries ALONE, the protocol every round has
    // hand-run to separate a memory-pressure stall from a plan
    // regression. A filtered run keeps the same warmup + interleaved
    // passes; cross-run drift is emitted only when all six Controls are
    // present (i.e. never on a filtered run unless the filter includes
    // them), so a nonsense drift can't be quoted from an isolation run.
    val filter = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = filter match {
      case None => SparkEntry.benchQueries
      case Some(f) =>
        val unknown = f -- SparkEntry.benchQueries.toSet
        require(unknown.isEmpty,
          s"SPARK_GRAFT_BENCH_QUERIES names unknown queries: " +
            unknown.toSeq.sorted.mkString(", "))
        SparkEntry.benchQueries.filter(f)
    }
    // Warmup: one UNTIMED pass over the FULL query set, not just one
    // query — first-touch costs (codegen compilation, parquet footer
    // reads, JVM JIT of each operator's generated classes) are per-QUERY,
    // and with a single-query warmup they all landed in pass 1 of the
    // timed loop (round-9: hybrid_topk pass-1 sample 68.9 s vs 3.5 s
    // median — a 19x spread from warmup cost, not plan cost). Failures
    // are swallowed here; the timed loop still fails loudly.
    for (name <- names)
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    // settle the JVM between phases: the warmup pass leaves a heap of
    // short-lived garbage, and without a collection here the FIRST timed
    // query absorbs the full-heap GC (observed as a 6x pass-1 spike on
    // q1_agg — position-, not plan-dependent)
    System.gc()
    Thread.sleep(1000)
    // Failures are NOT swallowed: a failed query records ok=false and the
    // run exits non-zero, so a broken plan can never masquerade as a fast
    // time in an rc=0 bench.
    val failedSet = scala.collection.mutable.LinkedHashSet.empty[String]
    val samples = Array.fill(names.size)(Vector.empty[Double])
    // wall-clock midpoint of each sample, seconds since this anchor —
    // the input to sample-level calibration
    val runStart = System.nanoTime()
    val midpoints = Array.fill(names.size)(Vector.empty[Double])
    for (pass <- 1 to Passes) {
      // progress marker (stderr, like the failure lines): lets a reader
      // correlate an ambient-load episode with pass boundaries, and
      // lets the loaded-host calibration drill align its interference
      // with whole passes
      System.err.println(s"[bench] pass $pass start")
      for ((name, i) <- names.zipWithIndex) {
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          failedSet += name
          System.err.println(s"[bench] $name FAILED (pass $pass): ${e.getMessage}")
        }
        val t1 = System.nanoTime()
        samples(i) :+= (t1 - t0) / 1e9
        midpoints(i) :+= ((t0 + t1) / 2.0 - runStart) / 1e9
      }
      // settle between passes too: a pass over the full set leaves a
      // heap of garbage, and a full-heap collection mid-NEXT-pass stalls
      // whatever query it lands on (round-10: 31 consecutive flagged
      // queries from one such sweep)
      if (pass < Passes) { System.gc(); Thread.sleep(500) }
    }
    // RAW per-query stats over the TRIMMED samples (best and worst
    // dropped): median (headline), min (best raw sample — immune to
    // session noise), spread = trimmed max/min. A singleton stall lands
    // in the dropped max, so raw spread > 3x means a query was slow in
    // at least TWO of five spaced samples.
    val rawResults = names.zipWithIndex.map { case (name, i) =>
      val trimmed = trim(samples(i))
      val spread = if (trimmed.head > 0) trimmed.last / trimmed.head else 1.0
      (name, trimmed(trimmed.size / 2), samples(i).min, spread)
    }
    // NORMALIZED stats: divide each sample by its LOCAL ambient-load
    // factor (wall-clock-neighborhood median; round 18 — the pass
    // factor is the sparse-window fallback), then re-trim. A host-load
    // episode — pass-aligned OR sub-pass — inflates a wall-clock
    // stretch of samples by a common factor; after normalization those
    // samples rejoin the clean ones and the spread flag measures PLAN
    // variance only.
    val factors = passFactors(samples)
    val local = localFactors(samples, midpoints, factors)
    val normResults = names.zipWithIndex.map { case (name, i) =>
      val norm = samples(i).zipWithIndex.map { case (v, p) => v / local(i)(p) }
      val trimmed = trim(norm)
      val spread = if (trimmed.head > 0) trimmed.last / trimmed.head else 1.0
      (name, trimmed(trimmed.size / 2), spread)
    }
    val normMed = normResults.map { case (k, m, _) => k -> m }.toMap
    // Cross-run drift vs pinned controls: only meaningful at the SF the
    // pins were measured at (sf0.1) AND with every control present —
    // an sf0.01 iteration run would otherwise "drift" to ~0.1 and its
    // value_normalized would be nonsense.
    val pinsApply = sfDir.replaceAll("/+$", "").endsWith("sf0.1")
    val driftOpt: Option[Double] =
      if (pinsApply && Controls.forall { case (c, _) => normMed.contains(c) })
        Some(median(Controls.map { case (c, pin) => normMed(c) / pin }))
      else None
    val qs = normResults.sortBy(_._2)
      .map { case (k, med, _) => "\"" + k + "\":" + f"$med%.2f" }
      .mkString("{", ",", "}")
    val failed = failedSet.toSeq.map("\"" + _ + "\"").mkString("[", ",", "]")
    val flaggedNorm = normResults.collect { case (k, _, s) if s > 3.0 => k }
    val flaggedRawAll = rawResults.collect { case (k, _, _, s) if s > 3.0 => k }
    // AUTO-RETIME (round 18): fresh spaced samples for each residual
    // flag, at the end of the run — the isolation protocol, inline. A
    // flag clears when the retime is quiet (spread <= 2) AND reproduces
    // the run's normalized median (<= 1.5x): the in-run spread was
    // environmental. Bimodal plans and retimes that land in a fresh
    // episode keep their flag.
    val retimed = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val cleared = scala.collection.mutable.LinkedHashSet.empty[String]
    if (flaggedNorm.nonEmpty) {
      System.err.println(
        s"[bench] auto-retime of ${flaggedNorm.size} flagged: " +
          flaggedNorm.mkString(", "))
      System.gc(); Thread.sleep(1000)
      val idx = names.zipWithIndex.toMap
      for (q <- flaggedNorm) {
        // a pass that THROWS records a fast, quiet elapsed time that
        // could satisfy the clear criteria — a failing query must keep
        // its flag (ADVICE r18): every retime pass must succeed to clear
        var threw = false
        val rs = (1 to RetimePasses).map { _ =>
          val t0 = System.nanoTime()
          try SparkEntry.queries(q)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            threw = true
            System.err.println(s"[bench] retime pass of $q FAILED: " +
              e.getClass.getSimpleName)
          }
          (System.nanoTime() - t0) / 1e9
        }
        // a threw pass keeps the flag (retimeClears) AND suppresses the
        // published retime figure — a median over failed passes is a
        // bogus fast time, not a measurement (ADVICE r19)
        if (!threw) retimed(q) = median(rs)
        if (retimeClears(rs, normResults(idx(q))._2, threw)) cleared += q
      }
    }
    val flaggedAll = flaggedNorm.filterNot(cleared)
    // the FULL flagged list — truncating it to a prefix while flagged_n
    // said more was a round-10 bookkeeping bug; it is bounded by the
    // query count and the summary line stays well under the driver's
    // stdout tail at any plausible flag rate
    val flagged = flaggedAll.map("\"" + _ + "\"").mkString("[", ",", "]")
    val flaggedRaw = flaggedRawAll.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = normResults.map(_._2).sum
    val totalRaw = rawResults.map(_._2).sum
    val totalMin = rawResults.map(_._3).sum
    val driftJson = driftOpt.map(d => f"$d%.3f").getOrElse("null")
    val valueNorm = driftOpt.map(d => f"${total / d}%.3f").getOrElse("null")
    val factorsJson = factors.map(f => f"$f%.3f").mkString("[", ",", "]")
    val clearedJson = cleared.toSeq.map("\"" + _ + "\"").mkString("[", ",", "]")
    val retimedJson = retimed.toSeq
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val summary = f"""{"queries":$qs,"n":${normResults.size},"failed":$failed,"passes":$Passes,"stat":"trimmed-median","flagged":$flagged,"flagged_n":${flaggedAll.size},"flagged_cleared":$clearedJson,"retimed":$retimedJson,"flagged_raw_n":${flaggedRawAll.size},"drift":$driftJson,"value_normalized":$valueNorm,"value_raw":$totalRaw%.3f,"value_min":$totalMin%.3f,"unit":"sec","sf":"$sfDir","metric":"total","value":$total%.3f}"""
    // Durable full record: per-query medians + the raw per-pass samples.
    val raw = names.zipWithIndex
      .map { case (k, i) =>
        "\"" + k + "\":[" + samples(i).map(v => f"$v%.3f").mkString(",") + "]"
      }
      .mkString("{", ",", "}")
    // midpoints persist in the full record so a reader can reconstruct
    // the wall-clock layout of any disputed sample
    val mids = names.zipWithIndex
      .map { case (k, i) =>
        "\"" + k + "\":[" + midpoints(i).map(v => f"$v%.1f").mkString(",") + "]"
      }
      .mkString("{", ",", "}")
    val full = f"""{"queries":$qs,"samples":$raw,"midpoints":$mids,"pass_factors":$factorsJson,"unit":"sec","sf":"$sfDir","n":${normResults.size},"failed":$failed,"passes":$Passes,"stat":"trimmed-median","flagged":$flagged,"flagged_n":${flaggedAll.size},"flagged_cleared":$clearedJson,"retimed":$retimedJson,"flagged_raw":$flaggedRaw,"flagged_raw_n":${flaggedRawAll.size},"drift":$driftJson,"value_normalized":$valueNorm,"value_raw":$totalRaw%.3f,"value_min":$totalMin%.3f,"metric":"total","value":$total%.3f}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not persist $outPath: ${e.getMessage}")
    }
    // ONE JSON line (round 22): earlier rounds printed a bare
    // per-query line followed by a compact summary line, and the
    // driver's parser latched onto DIFFERENT lines in different rounds
    // (r20: summary, r21: queries) — PERF_r21 joined zero queries
    // across rounds (n_common: 0). The scaladoc contract ("prints ONE
    // JSON line") is now literal: the final stdout line carries the
    // per-query map AND every summary field, so any line the driver
    // parses has both. The raw per-pass samples stay durable in
    // BENCH_full.json.
    println(summary)
    spark.stop()
    if (failedSet.nonEmpty) sys.exit(1)
  }
}
