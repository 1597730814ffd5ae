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
 * Noise protocol (round 7): one untimed warmup pass over the FULL query
 * set (round 10 — per-query first-touch codegen/IO otherwise lands in
 * pass 1 and inflates spreads to 10-20x), then three INTERLEAVED timed
 * passes (pass 1 of every query, then pass 2, then pass 3), reporting the
 * per-query MEDIAN. Interleaving spaces a query's repeats minutes apart,
 * so a transient JVM/GC/compilation stall hits at most one of its three
 * samples and the median discards it — min-of-2 back-to-back runs shared
 * whatever state stalled the first run and produced ±20%/query session
 * noise (round-6 false alarms). The full per-query JSON is also persisted
 * to `SPARK_GRAFT_BENCH_OUT` (default `BENCH_full.json` in the cwd) so the
 * harness's bounded output tail can never truncate the record.
 */
object Bench {
  private val Passes = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
    for (pass <- 1 to Passes; (name, i) <- names.zipWithIndex) {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failedSet += name
        System.err.println(s"[bench] $name FAILED (pass $pass): ${e.getMessage}")
      }
      samples(i) :+= (System.nanoTime() - t0) / 1e9
    }
    // Per-query stats: median (headline), min (best sample — immune to
    // session noise), and spread = max/min. A spread > 3x means at least
    // one sample hit a transient stall and the median may misreport; the
    // round-8 verdict traced every apparent "regression" (heavy_hitters
    // 5.02 s median vs 0.89 s best) to exactly this, so the flag ships in
    // the record rather than being re-derived by hand each round.
    val results = names.zipWithIndex.map { case (name, i) =>
      val sorted = samples(i).sorted
      val spread = if (sorted.head > 0) sorted.last / sorted.head else 1.0
      (name, sorted(sorted.size / 2), sorted.head, spread)
    }
    val qs = results.sortBy(_._2)
      .map { case (k, med, _, _) => "\"" + k + "\":" + f"$med%.2f" }
      .mkString("{", ",", "}")
    val failed = failedSet.toSeq.map("\"" + _ + "\"").mkString("[", ",", "]")
    val flaggedAll = results.collect { case (k, _, _, s) if s > 3.0 => k }
    val flagged = flaggedAll.take(15).map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val totalMin = results.map(_._3).sum
    val summary = f"""{"n":${results.size},"failed":$failed,"passes":$Passes,"stat":"median","flagged":$flagged,"flagged_n":${flaggedAll.size},"value_min":$totalMin%.3f,"unit":"sec","sf":"$sfDir","metric":"total","value":$total%.3f}"""
    // Durable full record: per-query medians + the raw per-pass samples.
    val raw = names.zipWithIndex
      .map { case (k, i) =>
        "\"" + k + "\":[" + samples(i).map(v => f"$v%.3f").mkString(",") + "]"
      }
      .mkString("{", ",", "}")
    val full = f"""{"queries":$qs,"samples":$raw,"unit":"sec","sf":"$sfDir","n":${results.size},"failed":$failed,"passes":$Passes,"stat":"median","flagged":$flagged,"flagged_n":${flaggedAll.size},"value_min":$totalMin%.3f,"metric":"total","value":$total%.3f}"""
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
