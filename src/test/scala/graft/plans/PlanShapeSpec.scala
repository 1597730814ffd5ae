package graft.plans

import graft.{SparkEntry, SparkSpec}

/**
 * Plan-shape regression tests for the most expensive headline queries:
 * the load-bearing physical-plan properties documented in PLANS.md are
 * asserted here so a future regression fails a test instead of a bench
 * round. The canonical incident this guards against: a ReuseExchange
 * defeat once made bm25_topk scan the corpus 16 times (fixed by the
 * one-explode-pass rewrite); with these bounds that class of regression
 * is caught at `sbt test` time.
 *
 * Counts are taken from the FINAL adaptive plan (after execution, before
 * the "Initial Plan" section of the AQE dump) at sf0.001 on the shared
 * local[4] session, matching the recorded values in PLANS.md. Bounds are
 * upper bounds — a plan that gets BETTER does not fail the suite.
 */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Final-plan string of an executed query (AQE resolved). */
  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  private def scanCount(plan: String, table: String): Int =
    plan.linesIterator.count(l => l.contains("FileScan") && l.contains(table))

  private def count(plan: String, token: String): Int =
    token.r.findAllIn(plan).size

  test("bm25_topk: <= 2 corpus scans (the 16-scan ReuseExchange defeat " +
      "stays fixed), broadcast query side, no cartesian product") {
    val p = executedPlan("bm25_topk")
    assert(scanCount(p, "documents") <= 2, s"corpus rescanned:\n$p")
    assert(count(p, "BroadcastHashJoin") + count(p, "BroadcastNestedLoopJoin") >= 1,
      s"query side no longer broadcast:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("hybrid_topk: <= 6 corpus scans (single corpus hashEmbed after the " +
      "round-6 double-embed fix), no cartesian product") {
    val p = executedPlan("hybrid_topk")
    assert(scanCount(p, "documents") <= 6, s"corpus rescanned:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("topk_cosine: corpus stays unshuffled — broadcast-NLJ on the query " +
      "side, <= 2 embedding scans") {
    val p = executedPlan("topk_cosine")
    assert(scanCount(p, "embeddings") <= 2, s"embeddings rescanned:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") >= 1,
      s"query side no longer broadcast:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("hyperplane_ann_capped: <= 4 embedding scans, hash joins only") {
    val p = executedPlan("hyperplane_ann_capped")
    assert(scanCount(p, "embeddings") <= 4, s"embeddings rescanned:\n$p")
    assert(count(p, "CartesianProduct") == 0 &&
      count(p, "BroadcastNestedLoopJoin") == 0)
  }

  test("simhash_capped: <= 3 corpus scans, no cartesian product") {
    val p = executedPlan("simhash_capped")
    assert(scanCount(p, "documents") <= 3, s"corpus rescanned:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("minhash_lsh: single corpus scan feeds signature + verify passes") {
    val p = executedPlan("minhash_lsh")
    assert(scanCount(p, "documents") <= 1, s"corpus rescanned:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("pagerank: <= 3 corpus scans — the 5 iteration rounds ride the " +
      "checkpointed edge frame, never the parquet scan") {
    val p = executedPlan("pagerank")
    assert(scanCount(p, "documents") <= 3, s"iterations re-scan parquet:\n$p")
    assert(count(p, "Scan ExistingRDD") >= 1,
      s"edge frame no longer checkpointed:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("incremental_neardup: <= 2 corpus scans (index + batch), no " +
      "cartesian product") {
    val p = executedPlan("incremental_neardup")
    assert(scanCount(p, "documents") <= 2, s"corpus rescanned:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("ivf_pq_topk: corpus codes scan once, probes/LUTs broadcast on an " +
      "equi-join — never a nested loop over the corpus") {
    val p = executedPlan("ivf_pq_topk")
    assert(scanCount(p, "embeddings") <= 2, s"embeddings rescanned:\n$p")
    assert(count(p, "BroadcastHashJoin") >= 1,
      s"cell join no longer broadcast:\n$p")
    assert(count(p, "CartesianProduct") == 0 &&
      count(p, "BroadcastNestedLoopJoin") == 0)
  }

  test("matryoshka_topk: <= 4 embedding scans (prefix + full, each side); " +
      "shortlist and query sides ride broadcasts") {
    val p = executedPlan("matryoshka_topk")
    assert(scanCount(p, "embeddings") <= 4, s"embeddings rescanned:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") >= 1,
      s"prefix stage no longer broadcast:\n$p")
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"re-rank fetch no longer broadcast:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("ppjoin: <= 8 corpus scans (df + ordered-set refs; the pin-free " +
      "shape measured FASTER than a checkpoint), no cartesian product") {
    val p = executedPlan("ppjoin")
    assert(scanCount(p, "documents") <= 8, s"corpus rescanned:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("triangle_count: edge list is checkpoint-pinned — the wedge/close " +
      "joins must not rescan the corpus at all") {
    val p = executedPlan("triangle_count")
    // only the pair pipeline (pinned upstream) and the node frame read
    // documents; wedge + closing joins run on the materialized edges
    assert(scanCount(p, "documents") <= 1, s"corpus rescanned:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("mutual_knn: the edge list is checkpoint-pinned — the mutuality " +
      "join must not rescan embeddings or re-run the kNN feed") {
    val p = executedPlan("mutual_knn")
    assert(scanCount(p, "embeddings") == 0, s"kNN feed re-ran:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("join_advisor: one scan per side — the advisor must stay strictly " +
      "cheaper than any join it advises on") {
    val p = executedPlan("join_advisor")
    assert(scanCount(p, "lineitem") <= 1, s"lineitem rescanned:\n$p")
    assert(scanCount(p, "orders") <= 1, s"orders rescanned:\n$p")
    // the only joins are 1-row cross-combines of the sizing aggregates
    assert(count(p, "CartesianProduct") == 0)
    // sizing aggregates keep their map-side partials (partial_count on
    // the scan side of the exchange)
    assert(count(p, "partial_count") >= 2, s"map-side combine lost:\n$p")
  }

  test("ks_drift / classifier_auc: the cumulative pass is range-" +
      "partitioned — the only unpartitioned Window runs over the tiny " +
      "__pid offsets frame, never the value frame") {
    // split a `Window [exprs], [partition], [order]` plan line into its
    // top-level bracket groups: 2 groups = unpartitioned window
    def topGroups(line: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var depth = 0
      line.dropWhile(_ != '[').foreach {
        case '[' => depth += 1; if (depth > 1) cur += '['
        case ']' =>
          depth -= 1
          if (depth == 0) { out += cur.toString; cur.clear() }
          else cur += ']'
        case c => if (depth >= 1) cur += c
      }
      out.toSeq
    }
    Seq("ks_drift", "classifier_auc", "ks_drift_by_source",
        "classifier_auc_by_source").foreach { name =>
      val p = executedPlan(name)
      val windows = p.linesIterator
        .filter(_.matches(""".*\bWindow \[.*""")).toSeq
      assert(windows.nonEmpty, s"$name lost its window pass:\n$p")
      val offending = windows.filter { l =>
        val g = topGroups(l)
        g.size == 2 && !g(1).contains("__pid")
      }
      assert(offending.isEmpty,
        s"$name runs an unpartitioned window over the VALUE frame " +
          s"(single-task cumulative pass):\n${offending.mkString("\n")}")
    }
  }

  test("hilbertCompact write: ONE range exchange on the hilbert index + " +
      "in-partition sort (the envelope-clustering plan)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    import spark.implicits._
    val captured = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    val t = "hilbert_pin"
    graft.tables.Tables.dropTable(spark, t)
    val grid = (0 until 1024).map(i =>
      (i.toLong, (i % 32).toLong, (i / 32).toLong)).toDF("id", "x", "y")
    graft.tables.Tables.loadOverwrite(grid.repartition(4), t)
    spark.listenerManager.register(listener)
    try {
      graft.tables.Tables.hilbertCompact(spark, t, "x", "y",
        targetFiles = 4, bits = 8)
      // the listener bus is asynchronous — poll for the write job's plan
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def writePlan(): Option[String] = captured.asScala
        .find(_.contains("rangepartitioning(__h"))
      while (writePlan().isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val p = writePlan().getOrElse(
        fail(s"no write plan captured; saw:\n${captured.asScala.mkString("\n---\n")}"))
        .split("== Initial Plan ==").head
      // exactly one exchange: the range partition on the curve index —
      // any second shuffle means the rewrite repartitioned twice
      assert(count(p, "Exchange rangepartitioning\\(__h") == 1, s"plan:\n$p")
      assert(count(p, "Exchange ") == 1, s"extra shuffle in the rewrite:\n$p")
      assert(count(p, "Sort \\[__h") >= 1, s"in-partition sort lost:\n$p")
    } finally {
      spark.listenerManager.unregister(listener)
      graft.tables.Tables.dropTable(spark, t)
    }
  }

  test("profile_columns: every per-column scan reads ONLY its column " +
      "(ReadSchema pruned to one field)") {
    val p = executedPlan("profile_columns")
    val scans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("events")).toSeq
    assert(scans.size == 3, s"expected one scan per profiled column:\n$p")
    scans.foreach { l =>
      val schema = l.split("ReadSchema: ").last
      assert(!schema.contains(","),
        s"scan reads more than one column: $l")
    }
  }

  test("constraint_audit: ALL predicates share ONE events scan") {
    val p = executedPlan("constraint_audit")
    assert(scanCount(p, "events") == 1,
      s"constraints must share a single pass:\n$p")
  }

  test("trend_by_type: one events scan, no window, no single-partition " +
      "exchange (moment sums are one hash-aggregate)") {
    val p = executedPlan("trend_by_type")
    assert(scanCount(p, "events") == 1, s"fact rescanned:\n$p")
    assert(count(p, "Window") == 0, s"unexpected window:\n$p")
  }

  test("hash_sample: top-k rides TakeOrdered (per-partition heaps), " +
      "never a global sort of the corpus") {
    val p = executedPlan("hash_sample")
    assert(count(p, "TakeOrderedAndProject") >= 1,
      s"sample no longer a TakeOrdered top-k:\n$p")
    assert(scanCount(p, "documents") == 1, s"corpus rescanned:\n$p")
  }

  test("mad_outliers: no single-partition exchange — both medians ride " +
      "the assembled range-partitioned ranks") {
    val p = executedPlan("mad_outliers")
    assert(count(p, "Exchange SinglePartition") == 0,
      s"single-task stage in the rank pass:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("frame_sample / media_resize: the codec mapPartitions runs at " +
      "cluster parallelism, never one fat upstream partition") {
    import graft.operators.Multimodal
    val docs = graft.sources.Fixtures.table(spark, dir, "documents")
      .coalesce(1) // the adversarial upstream layout
    val par = spark.sparkContext.defaultParallelism
    assert(Multimodal.imagePayload(spark, docs).rdd.getNumPartitions >= par,
      "image payload/codec pass must not inherit a serialized layout")
    assert(Multimodal.videoPayload(spark, docs).rdd.getNumPartitions >= par,
      "video payload/codec pass must not inherit a serialized layout")
    assert(Multimodal.frameSampleBatch(spark, docs.limit(32)).toDF()
      .rdd.getNumPartitions >= par)
    assert(Multimodal.resizeBatch(spark, docs.limit(32)).toDF()
      .rdd.getNumPartitions >= par)
  }

  test("dsir_weights: <= 2 documents scans (raw + target legs) — the " +
      "gram explosion rides one shared (doc, bucket) exchange") {
    val p = executedPlan("dsir_weights")
    // 2 raw text passes (counts, scoring) + 1 target pass + 1 id-only
    // left-join scan = 4; the pre-checkpoint shape measured 10
    assert(scanCount(p, "documents") <= 4,
      s"dsir corpus subtree re-executed beyond the two-pass floor:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("char_entropy: ONE documents scan, the entropy rides the scan " +
      "projection (native expression, no explode, no aggregate)") {
    val p = executedPlan("char_entropy")
    assert(scanCount(p, "documents") == 1, s"documents rescanned:\n$p")
    assert(p.contains("graft_char_entropy"),
      s"native expression missing from the projection:\n$p")
    // the per-character explode-and-regroup formulation would show here
    assert(count(p, "Generate") == 0 && count(p, "HashAggregate") == 0,
      s"entropy left the scan projection:\n$p")
  }

  test("t_closeness: <= 3 documents scans (class, global, total legs), " +
      "tiny frames broadcast, no cartesian product") {
    val p = executedPlan("t_closeness")
    assert(scanCount(p, "documents") <= 3, s"documents rescanned:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("dedup_spans: <= 4 documents scans (candidate agg, flagged join, " +
      "text re-attach, rebuild), window hashes hash-joined, no " +
      "cartesian product, no WindowExec (ownership must stay a " +
      "combinable aggregate — a Window keyed on window text serializes " +
      "hot boilerplate onto one task, drilled to OOM at 100x)") {
    val p = executedPlan("dedup_spans")
    assert(scanCount(p, "documents") <= 4, s"documents rescanned:\n$p")
    assert(count(p, "CartesianProduct") == 0)
    assert(count(p, "Window") == 0, s"WindowExec crept back:\n$p")
    // graft_span_cover itself is invisible here: CollapseProject folds
    // it into the final aggregate's resultExpressions, which the
    // one-line ObjectHashAggregate summary does not print — so pin its
    // structural consequence instead: the removal sets reach the
    // rebuild WITHOUT a post-ownership Generate (the exploded
    // positions stream the expression replaced)
    assert(count(p, "Generate explode") <= 1,
      s"a second explode appeared after the window explode:\n$p")
  }

  test("duplicated_spans: <= 4 documents scans (candidate agg, flagged " +
      "join, text re-attach, per-doc counts), no cartesian product, " +
      "no WindowExec") {
    val p = executedPlan("duplicated_spans")
    assert(scanCount(p, "documents") <= 4, s"documents rescanned:\n$p")
    assert(count(p, "CartesianProduct") == 0)
    assert(count(p, "Window") == 0, s"WindowExec crept back:\n$p")
  }

  test("dedup_spans_intra: ONE documents scan, ZERO exchanges — the " +
      "within-doc rewrite is a pure scan projection") {
    val p = executedPlan("dedup_spans_intra")
    assert(scanCount(p, "documents") == 1, s"documents rescanned:\n$p")
    // the orderBy in the query entry is presentation; the operator
    // itself must add no aggregate/join/generate
    assert(count(p, "HashAggregate") == 0 && count(p, "Generate") == 0 &&
      count(p, "Join") == 0, s"within-doc rewrite left the scan:\n$p")
    assert(p.contains("graft_intra_dup_positions") &&
      p.contains("graft_drop_positions"),
      s"native expressions missing:\n$p")
  }

  test("privacy_audit: <= 2 documents scans — every verdict re-derives " +
      "from the (classes x domain) counts frame, never the corpus") {
    val p = executedPlan("privacy_audit")
    assert(scanCount(p, "documents") <= 2, s"documents rescanned:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("budget_select: <= 2 documents scans (doc frame + quality " +
      "frame), one per-source window pass, no cartesian product") {
    val p = executedPlan("budget_select")
    assert(scanCount(p, "documents") <= 2, s"documents rescanned:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("budget_select_prethin: <= 6 documents scans (candidate frame " +
      "x stats/verify/final passes), thresholds broadcast, no " +
      "cartesian product") {
    val p = executedPlan("budget_select_prethin")
    assert(scanCount(p, "documents") <= 6, s"documents rescanned:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("ndcg_quantized: <= 6 embedding scans (exact + quantized leg, " +
      "corpus/query sides), query sides broadcast, no cartesian product") {
    val p = executedPlan("ndcg_quantized")
    assert(scanCount(p, "embeddings") <= 6, s"embeddings rescanned:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") >= 2,
      s"a ranking leg lost its broadcast query side:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  // ==== round-18 kernel pins: the native codegen kernels must stay in
  // the plan. A refactor that silently falls back to the interpreted HOF
  // chain (transform + graft_dot + array_position argmax) keeps results
  // identical but pays ~8x at production nlist (round-17 drill) — only
  // a plan assertion catches it.

  test("ivf_topk: corpus cell assignment rides the native graft_nearest_" +
      "cell kernel (no HOF-argmax fallback), <= 2 embedding scans, no " +
      "cartesian product") {
    val p = executedPlan("ivf_topk")
    assert(count(p, "graft_nearest_cell") >= 1,
      s"NearestCell kernel fell back to the interpreted chain:\n$p")
    // the corpus-side argmax must NOT be the array_position chain; the
    // query-side probe ranking legitimately keeps zip_with over __dists
    assert(count(p, "array_position") == 0,
      s"interpreted argmax chain back in the plan:\n$p")
    assert(scanCount(p, "embeddings") <= 2, s"embeddings rescanned:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("pq_encode: subspace codes ride the native graft_pq_code kernel " +
      "(no slice/argmax fallback), ONE embeddings scan") {
    val p = executedPlan("pq_encode")
    assert(count(p, "graft_pq_code") >= 1,
      s"PqCode kernel fell back to the interpreted chain:\n$p")
    assert(count(p, "array_position") == 0,
      s"interpreted argmin chain back in the plan:\n$p")
    assert(scanCount(p, "embeddings") == 1, s"embeddings rescanned:\n$p")
  }

  test("writeIvfIndex + writePqIndex build plans: both kernels present " +
      "at index-build time (the once-per-corpus hot path)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val captured = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    val emb = graft.sources.Fixtures.table(spark, dir, "embeddings")
    val ivfBase = "ivf_kernel_pin"
    val pqBase = "pq_kernel_pin"
    def dropAll(): Unit =
      Seq(s"${ivfBase}_cells", s"${ivfBase}_centroids",
        s"${pqBase}_pqcodes", s"${pqBase}_pqmeta")
        .foreach(graft.tables.Tables.dropTable(spark, _))
    dropAll()
    spark.listenerManager.register(listener)
    try {
      graft.operators.Similarity.writeIvfIndex(emb, ivfBase,
        nlist = 4, dim = 64)
      graft.operators.Similarity.writePqIndex(emb, pqBase,
        nlist = 4, m = 4, kcent = 8, dim = 64, residual = false)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def plans(tok: String): Option[String] =
        captured.asScala.find(_.contains(tok))
      while ((plans("graft_nearest_cell").isEmpty ||
          plans("graft_pq_code").isEmpty) && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(plans("graft_nearest_cell").isDefined,
        s"no build plan used NearestCell; saw:\n${captured.asScala.take(4).mkString("\n---\n")}")
      assert(plans("graft_pq_code").isDefined,
        s"no build plan used PqCode; saw:\n${captured.asScala.take(4).mkString("\n---\n")}")
    } finally {
      spark.listenerManager.unregister(listener)
      dropAll()
    }
  }

  test("ivf_pq_topk_residual: both kernels in the plan (NearestCell " +
      "assignment + PqCode over the residual column), <= 3 embedding " +
      "scans, no cartesian product") {
    val p = executedPlan("ivf_pq_topk_residual")
    assert(count(p, "graft_nearest_cell") >= 1,
      s"NearestCell kernel missing from the residual plan:\n$p")
    assert(count(p, "graft_pq_code") >= 1,
      s"PqCode kernel missing from the residual plan:\n$p")
    assert(scanCount(p, "embeddings") <= 3, s"embeddings rescanned:\n$p")
    assert(count(p, "CartesianProduct") == 0)
  }

  test("ivf_pq_topk_refined: stage 2 never shuffles the cells table — " +
      "shortlist and queries broadcast onto ONE raw-vector scan") {
    val p = executedPlan("ivf_pq_topk_refined")
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"shortlist/query sides lost their broadcasts:\n$p")
    assert(count(p, "CartesianProduct") == 0 &&
      count(p, "BroadcastNestedLoopJoin") == 0)
    // the raw-vector side reads the bucketed _cells table exactly once
    assert(count(p, "graft_ivf_idx") >= 1 &&
      scanCount(p, "graft_ivf_idx") <= 1,
      s"cells table rescanned or missing:\n$p")
  }

  test("ivf_pq_topk_indexed query side: codes table scans <= 2, cell " +
      "join broadcast, never a nested loop or python eval") {
    val p = executedPlan("ivf_pq_topk_indexed")
    assert(scanCount(p, "pqcodes") <= 2, s"codes table rescanned:\n$p")
    assert(count(p, "BroadcastHashJoin") >= 1,
      s"cell join no longer broadcast:\n$p")
    assert(count(p, "CartesianProduct") == 0 &&
      count(p, "BroadcastNestedLoopJoin") == 0 &&
      count(p, "BatchEvalPython") == 0)
  }
}
