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
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside the timed loop
    try SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // two timed runs per query, report the min: AQE stat-dependent plans
    // (notably the skewed simhash candidate join) vary up to 2x between
    // runs, and the minimum is the stable, reproducible cost signal.
    // Failures are NOT swallowed: a failed query records ok=false and the
    // run exits non-zero, so a broken plan can never masquerade as a fast
    // time in an rc=0 bench.
    val results = SparkEntry.benchQueries.map { name =>
      val fn = SparkEntry.queries(name)
      var ok = true
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          ok = false
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      (name, times.min, ok)
    }
    // The harness that collects this line keeps only a bounded tail of the
    // run's output, so truncation (if the query set keeps growing) eats the
    // FRONT of the line. Order the payload so the cheapest facts go first:
    // per-query times sorted ascending (a cut loses the fastest queries,
    // never the slow ones worth reading), and the headline total + failure
    // list at the very end where they always survive.
    val qs = results.sortBy(_._2)
      .map { case (k, v, _) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
    val total = results.map(_._2).sum
    println(f"""{"queries":$qs,"unit":"sec","sf":"$sfDir","n":${results.size},"failed":${failed.mkString("[", ",", "]")},"metric":"total","value":$total%.3f}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
