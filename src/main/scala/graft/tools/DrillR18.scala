package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/**
 * Round-18 scale drills (scratch main — deleted before round close):
 *   autoprobe — recall-targeted auto-nprobe at 1M, adversarial midpoint
 *               query set (VERDICT #3 done-criterion)
 *   kmeans    — centroid-training s/iteration at 1M/4M/10M, nlist=√n,
 *               and the iters 0→2 recall delta (VERDICT #4)
 *   adc       — small-batch ADC query floor decomposition (VERDICT #6)
 *   spanfull  — dedupSpansFull intra-gate on the all-distinct and
 *               boilerplate 2x10M pairs at 8g (VERDICT #2)
 */
object DrillR18 {

  /** Planted-cluster corpus: vector = cluster base + 2% jitter, same
   * family as the round-17 drills. Deterministic (id-derived trig). */
  def corpus(spark: SparkSession, n: Long, dim: Int, nBases: Int): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      expr(s"""transform(sequence(0, ${dim - 1}), p ->
        CAST(sin((id % $nBases + 1) * (p + 1) * 0.7)
           + 0.02 * sin((id * 37 + p * 101) * 0.13) AS FLOAT))""")
        .as("embedding"))

  /** Adversarial queries: midpoints between two cluster bases + 2%
   * jitter — each query's true top-k straddles cells. `salt` varies the
   * base pairing so calibration and evaluation sets are disjoint. */
  def midQueries(spark: SparkSession, nQ: Int, dim: Int, nBases: Int,
                 idOffset: Long, salt: Int): DataFrame =
    spark.range(nQ).select((col("id") + idOffset).as("vec_id"),
      expr(s"""transform(sequence(0, ${dim - 1}), p ->
        CAST(0.5 * (sin(((id * 3 + $salt) % $nBases + 1) * (p + 1) * 0.7)
                  + sin(((id * 7 + $salt * 11 + 1) % $nBases + 1) * (p + 1) * 0.7))
           + 0.02 * sin((id * 53 + p * 97 + $salt) * 0.11) AS FLOAT))""")
        .as("embedding"))

  /** Near-dup-group corpus for the PQ drills: `nGroups` groups of 11
   * mutual near-duplicates; group center = cluster base (g % 1000) +
   * a 0.3-scale personal direction; members add 0.01-scale noise. A
   * member's true top-10 = its 10 siblings, with margins far above
   * noise — a realistic retrieval structure (dedup / near-dup search)
   * instead of the pure-jitter cloud whose top-10 margins sit below
   * any quantizer's noise floor. Flat id = slot * nGroups + g, so the
   * first `nlist` ids span `nlist` DISTINCT groups/clusters (centroid
   * seeds) and the next `ksub` are 256 further distinct groups
   * (residual codebook seeds). */
  def groupedCorpus(spark: SparkSession, nGroups: Long, dim: Int,
                    nBases: Int): DataFrame =
    spark.range(nGroups * 11).select(col("id").as("vec_id"),
      expr(s"""transform(sequence(0, ${dim - 1}), p ->
        CAST(sin(((id % $nGroups) % $nBases + 1) * (p + 1) * 0.7)
           + 0.0375 * sin(((id % $nGroups) * 131 + p * 17) * 0.19)
           + 0.00125 * sin((id * 37 + p * 101) * 0.13) AS FLOAT))""")
        .as("embedding"))

  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"MARKER $label | ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  private def recallOf(got: DataFrame, truth: DataFrame): Double = {
    val denom = truth.count().toDouble
    val hits = got.select("query_id", "neighbor_id")
      .join(truth.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count()
    hits / denom
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    args.headOption.getOrElse("autoprobe") match {
      case "autoprobe" => autoprobe(spark)
      case "autoprobe-pq" => autoprobePq(spark, residual = false)
      case "autoprobe-pq-res" => autoprobePq(spark, residual = true)
      case "kmeans"    => kmeans(spark, args.lift(1).map(_.toLong))
      case "adc"       => adc(spark)
      case "spanfull"  => spanfull(spark, args.lift(1).getOrElse("distinct"))
      case other       => sys.error(s"unknown drill: $other")
    }
    spark.stop()
  }

  def autoprobe(spark: SparkSession): Unit = {
    val n = 1000000L; val dim = 64; val nlist = 1000
    val c = corpus(spark, n, dim, nlist).localCheckpoint(true)
    println(s"MARKER corpus ready n=$n")
    val cal = midQueries(spark, 64, dim, nlist, 2000000000L, salt = 1)
      .localCheckpoint(true)
    val eval = midQueries(spark, 256, dim, nlist, 3000000000L, salt = 2)
      .localCheckpoint(true)
    val cents = time("train seeds") {
      Similarity.trainIvfCentroids(c, nlist, dim)
    }
    // what the SELF-sample would choose (the happy-path trap, for the
    // record) vs the workload-sample choice
    val (npSelf, curveSelf) = time("calibrate self-sample") {
      Similarity.calibrateNprobe(c, cents, 0.95, k = 10, sample = 64,
        maxNprobe = 64)
    }
    println(s"MARKER self-cal nprobe=$npSelf curve=" +
      curveSelf.map { case (a, b) => f"$a->$b%.3f" }.mkString(","))
    val (npWork, curveWork) = time("calibrate workload-sample") {
      Similarity.calibrateNprobe(c, cents, 0.95, k = 10, sample = 64,
        maxNprobe = 64, queries = Some(cal))
    }
    println(s"MARKER workload-cal nprobe=$npWork curve=" +
      curveWork.map { case (a, b) => f"$a->$b%.3f" }.mkString(","))
    val base = "drill_r18_ivf"
    Seq(s"${base}_cells", s"${base}_centroids")
      .foreach(graft.tables.Tables.dropTable(spark, _))
    time("writeIvfIndex calibrated") {
      Similarity.writeIvfIndex(c, base, nlist, dim, numBuckets = 8,
        targetRecall = Some(0.95), recallK = 10, recallSample = 64,
        maxNprobe = 64, calibrationQueries = Some(cal))
    }
    println(s"MARKER persisted cal_nprobe=" +
      Similarity.calibratedNprobe(spark, base))
    val truth = time("brute ground truth 256q") {
      Similarity.bruteForceTopK(c, eval, k = 10).localCheckpoint(true)
    }
    val got = time("ivf auto-nprobe 256q") {
      Similarity.ivfTopKAgainstIndex(eval, base, k = 10, dim = dim,
        autoNprobe = true).localCheckpoint(true)
    }
    println(f"MARKER eval recall=${recallOf(got, truth)}%.4f target=0.95")
    Seq(s"${base}_cells", s"${base}_centroids")
      .foreach(graft.tables.Tables.dropTable(spark, _))
  }

  def autoprobePq(spark: SparkSession, residual: Boolean): Unit = {
    val dim = 64; val nlist = 1000; val nGroups = 90909L
    val n = nGroups * 11
    val c = groupedCorpus(spark, nGroups, dim, nlist).localCheckpoint(true)
    println(s"MARKER corpus ready n=$n residual=$residual (grouped near-dup)")
    // calibration sample: slot-1 members of groups 3000..3063;
    // evaluation: slot-1 members of groups 5000..5255 — disjoint,
    // both real corpus members whose true top-10 are their siblings
    val cal = c.filter(col("vec_id").between(nGroups + 3000, nGroups + 3063))
      .localCheckpoint(true)
    val eval = c.filter(col("vec_id").between(nGroups + 5000, nGroups + 5255))
      .localCheckpoint(true)
    val base = "drill_r18_pqcal"
    Seq(s"${base}_pqcodes", s"${base}_pqmeta")
      .foreach(graft.tables.Tables.dropTable(spark, _))
    time(s"writePqIndex calibrated m=8 ksub=256 target=0.7 residual=$residual") {
      Similarity.writePqIndex(c, base, nlist = nlist, m = 8, kcent = 256,
        dim = dim, targetRecall = Some(0.7), recallK = 10,
        recallSample = 64, maxNprobe = 64,
        calibrationQueries = Some(cal), residual = residual)
    }
    println(s"MARKER persisted cal_nprobe=" +
      Similarity.calibratedPqNprobe(spark, base))
    val truth = time("brute ground truth 256q") {
      Similarity.bruteForceTopK(c, eval, k = 10).localCheckpoint(true)
    }
    val got = time("ivfPq auto-nprobe 256q") {
      Similarity.ivfPqTopKIndexed(eval, base, k = 10, dim = dim,
        autoNprobe = true).localCheckpoint(true)
    }
    println(f"MARKER eval ADC recall=${recallOf(got, truth)}%.4f target=0.70")
    // stage 2: exact re-rank of a 4x shortlist against the companion
    // IVF index's raw vectors — the code-flip recovery
    if (residual) {
      val ivfBase = "drill_r18_refivf"
      Seq(s"${ivfBase}_cells", s"${ivfBase}_centroids")
        .foreach(graft.tables.Tables.dropTable(spark, _))
      time("writeIvfIndex companion") {
        Similarity.writeIvfIndex(c, ivfBase, nlist = nlist, dim = dim)
      }
      val refined = time("ivfPqTopKRefined 256q shortlist=40") {
        Similarity.ivfPqTopKRefined(eval, base, ivfBase, k = 10,
          shortlist = 40, nprobe = 1, dim = dim).localCheckpoint(true)
      }
      println(f"MARKER refined recall=${recallOf(refined, truth)}%.4f")
      Seq(s"${ivfBase}_cells", s"${ivfBase}_centroids")
        .foreach(graft.tables.Tables.dropTable(spark, _))
    }
    Seq(s"${base}_pqcodes", s"${base}_pqmeta")
      .foreach(graft.tables.Tables.dropTable(spark, _))
  }

  def kmeans(spark: SparkSession, only: Option[Long]): Unit = {
    val dim = 64
    val sizes = only.map(Seq(_)).getOrElse(Seq(1000000L, 4000000L, 10000000L))
    for (n <- sizes) {
      val nlist = math.sqrt(n.toDouble).toInt
      val c = corpus(spark, n, dim, nlist).localCheckpoint(true)
      println(s"MARKER corpus ready n=$n nlist=$nlist")
      time(s"kmeans n=$n iters=1") {
        Similarity.kmeansCentroids(c, nlist, iters = 1)
      }
      time(s"kmeans n=$n iters=2") {
        Similarity.kmeansCentroids(c, nlist, iters = 2)
      }
      c.unpersist()
    }
    // recall delta at 1M: seed-only vs 2 Lloyd rounds, adversarial set
    val n = 1000000L; val nlist = 1000
    val c = corpus(spark, n, dim, nlist).localCheckpoint(true)
    val eval = midQueries(spark, 256, dim, nlist, 3000000000L, salt = 2)
      .localCheckpoint(true)
    val truth = Similarity.bruteForceTopK(c, eval, k = 10)
      .localCheckpoint(true)
    for (iters <- Seq(0, 2)) {
      val base = s"drill_r18_km$iters"
      Seq(s"${base}_cells", s"${base}_centroids")
        .foreach(graft.tables.Tables.dropTable(spark, _))
      time(s"writeIvfIndex iters=$iters") {
        Similarity.writeIvfIndex(c, base, nlist, dim, iters = iters)
      }
      for (np <- Seq(1, 2, 4)) {
        val got = Similarity.ivfTopKAgainstIndex(eval, base, k = 10,
          nprobe = np, dim = dim)
        println(f"MARKER iters=$iters nprobe=$np recall=${recallOf(got, truth)}%.4f")
      }
      Seq(s"${base}_cells", s"${base}_centroids")
        .foreach(graft.tables.Tables.dropTable(spark, _))
    }
  }

  def adc(spark: SparkSession): Unit = {
    val n = 1000000L; val dim = 64; val nlist = 1000
    val c = corpus(spark, n, dim, nlist).localCheckpoint(true)
    println(s"MARKER corpus ready n=$n")
    val base = "drill_r18_pq"
    Seq(s"${base}_pqcodes", s"${base}_pqmeta")
      .foreach(graft.tables.Tables.dropTable(spark, _))
    time("writePqIndex m=8 ksub=256") {
      Similarity.writePqIndex(c, base, nlist = nlist, m = 8, kcent = 256,
        dim = dim)
    }
    for (nQ <- Seq(16, 64, 256, 1024); rep <- 1 to 2) {
      val q = midQueries(spark, nQ, dim, nlist, 3000000000L, salt = 2)
      time(s"ivfPqTopKIndexed nQ=$nQ nprobe=8 rep=$rep") {
        Similarity.ivfPqTopKIndexed(q, base, k = 10, nprobe = 8, dim = dim)
          .write.format("noop").mode("overwrite").save()
      }
    }
    Seq(s"${base}_pqcodes", s"${base}_pqmeta")
      .foreach(graft.tables.Tables.dropTable(spark, _))
  }

  def spanfull(spark: SparkSession, shape: String): Unit = {
    val tokens = 10000000L
    val text = shape match {
      case "distinct" =>
        expr(s"array_join(transform(sequence(1, $tokens), i -> concat('w', i)), ' ')")
      case "boiler" =>
        expr(s"repeat('b1 b2 b3 b4 b5 b6 b7 b8 ', ${tokens / 8})")
      case other => sys.error(s"unknown shape: $other")
    }
    val docs = spark.range(2).select((col("id") + 1).as("doc_id"),
      text.as("text")).localCheckpoint(true)
    println(s"MARKER pair ready shape=$shape tokens=$tokens x2")
    time(s"plain removeDuplicatedSpans $shape") {
      Dedup.removeDuplicatedSpans(docs, w = 8)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"))
        .collect().foreach(r => println(s"MARKER plain row $r"))
    }
    time(s"dedupSpansFull GATED $shape") {
      Dedup.dedupSpansFull(docs, w = 8)
        .select(col("doc_id"), col("n_tokens"), col("n_removed_intra"),
          col("n_removed_cross"))
        .collect().foreach(r => println(s"MARKER gated row $r"))
    }
  }
}
