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
 */
object Bench {
  private val Passes = 5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.benchQueries
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
    for (pass <- 1 to Passes) {
      for ((name, i) <- names.zipWithIndex) {
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          failedSet += name
          System.err.println(s"[bench] $name FAILED (pass $pass): ${e.getMessage}")
        }
        samples(i) :+= (System.nanoTime() - t0) / 1e9
      }
      // settle between passes too: a pass over the full set leaves a
      // heap of garbage, and a full-heap collection mid-NEXT-pass stalls
      // whatever query it lands on (round-10: 31 consecutive flagged
      // queries from one such sweep)
      if (pass < Passes) { System.gc(); Thread.sleep(500) }
    }
    // Per-query stats over the TRIMMED samples (best and worst dropped):
    // median (headline), min (best raw sample — immune to session
    // noise), spread = trimmed max/min. A singleton stall lands in the
    // dropped max, so spread > 3x now means a query was slow in at
    // least TWO of five spaced samples — real variance, not one GC; the
    // round-8/round-10 verdicts traced every apparent "regression"
    // (heavy_hitters 5.02 s median vs 0.89 s best; rollup_agg 9.47 s
    // pass-3 singleton) to exactly the noise class the trim removes.
    val results = names.zipWithIndex.map { case (name, i) =>
      val sorted = samples(i).sorted
      val trimmed = if (sorted.size >= 3) sorted.tail.init else sorted
      val spread = if (trimmed.head > 0) trimmed.last / trimmed.head else 1.0
      (name, trimmed(trimmed.size / 2), sorted.head, spread)
    }
    val qs = results.sortBy(_._2)
      .map { case (k, med, _, _) => "\"" + k + "\":" + f"$med%.2f" }
      .mkString("{", ",", "}")
    val failed = failedSet.toSeq.map("\"" + _ + "\"").mkString("[", ",", "]")
    val flaggedAll = results.collect { case (k, _, _, s) if s > 3.0 => k }
    // the FULL flagged list — truncating it to a prefix while flagged_n
    // said more was a round-10 bookkeeping bug; it is bounded by the
    // query count and the summary line stays well under the driver's
    // stdout tail at any plausible flag rate
    val flagged = flaggedAll.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val totalMin = results.map(_._3).sum
    val summary = f"""{"n":${results.size},"failed":$failed,"passes":$Passes,"stat":"trimmed-median","flagged":$flagged,"flagged_n":${flaggedAll.size},"value_min":$totalMin%.3f,"unit":"sec","sf":"$sfDir","metric":"total","value":$total%.3f}"""
    // Durable full record: per-query medians + the raw per-pass samples.
    val raw = names.zipWithIndex
      .map { case (k, i) =>
        "\"" + k + "\":[" + samples(i).map(v => f"$v%.3f").mkString(",") + "]"
      }
      .mkString("{", ",", "}")
    val full = f"""{"queries":$qs,"samples":$raw,"unit":"sec","sf":"$sfDir","n":${results.size},"failed":$failed,"passes":$Passes,"stat":"trimmed-median","flagged":$flagged,"flagged_n":${flaggedAll.size},"value_min":$totalMin%.3f,"metric":"total","value":$total%.3f}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not persist $outPath: ${e.getMessage}")
    }
    // The driver keeps only a bounded (~2 KB) stdout tail; the full
    // per-query map (~6 KB at 140+ queries) overflowed it every round and
    // left the parse at `parsed: null`. So: per-query detail goes to stdout
    // EARLY (for humans reading the log) and to BENCH_full.json (durable),
    // and the VERY LAST line is a compact summary guaranteed to fit.
    println(f"""{"queries":$qs}""")
    println(summary)
    spark.stop()
    if (failedSet.nonEmpty) sys.exit(1)
  }
}
