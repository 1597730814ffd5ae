package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph operators over edge frames the dedup family produces (near-dup
 * pairs, link tables). Iterative message-passing in Spark is join +
 * aggregate per round — the [[Dedup.nearDupClusters]] pattern — with
 * lineage pinned once for the loop-invariant edge frame.
 */
object Graph {

  /**
   * PageRank with a FIXED iteration count, evaluated entirely in integer
   * micro-units so every engine and partitioning produces bit-identical
   * ranks: pr₀ = 1 000 000 per node and
   *   prᵢ₊₁(n) = 150 000 + (85 · Σ_{m→n} (prᵢ(m) div outdeg(m))) div 100
   * — the damping-0.85 update with both divisions floored (no float sum
   * ever forms; integer sums are associative). Over a near-dup pair
   * graph this ranks each document by how centrally it sits in its
   * duplication neighborhood — a principled "which copy is canonical"
   * signal (the max-degree heuristic, made transitive). Emits
   * (idCol, pr_micro) for EVERY node; isolated nodes settle at 150 000.
   *
   * `edges` must expose (src, dst) one direction per row — symmetrize
   * first for undirected graphs (as the near-dup query does). Dangling
   * mass is dropped, not redistributed — the rule is applied identically
   * by the oracle, and for ranking (not probability) semantics the
   * simplification is standard.
   *
   * Scale: the degree-annotated edge frame is loop-invariant and is
   * materialized ONCE (`localCheckpoint` — five downstream references
   * would otherwise each replan candidate generation); each round is one
   * shuffle join on the 8-byte node key plus a map-side-combined sum.
   * Fixed iterations mean no convergence action per round (contrast the
   * data-dependent loop in [[Dedup.nearDupClusters]], which must check).
   */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int = 5,
               idCol: String = "doc_id"): DataFrame = {
    val ed = edges.select(col("src"), col("dst"))
    val deg = ed.groupBy("src").agg(count(lit(1)).as("d"))
    // Loop frames NOT pre-partitioned (round-22 negative result): a
    // src/id-keyed pin + checkpoint of both loop-invariant frames — so
    // each iteration's `e ⋈ pr` plans zero exchanges — measured 0.88x
    // at sf0.1 (checkpointing `n` replaces its scan-derived size
    // estimate with a LogicalRDD's unknown stats and displaces the
    // tiny-frame broadcast joins) and FLAT at the 40x spot scale
    // (32.9 s vs 32.6 s — plans/r22/SPOT_scale.md): the per-round
    // groupBy(dst) exchange is the floor either way and the pinned
    // SMJ's per-round sorts eat the saved edge re-exchange.
    val e = ed.join(deg, "src").localCheckpoint(true)
    val n = nodes.select(col(idCol))
    var pr = n.withColumn("pr", lit(1000000L))
    (1 to iters).foreach { _ =>
      val in = e.join(pr, e("src") === pr(idCol))
        .select(col("dst"), expr("pr DIV d").as("__c"))
        .groupBy("dst")
        .agg(sum("__c").as("__m"))
      pr = n.join(in, n(idCol) === in("dst"), "left")
        .select(n(idCol),
          (lit(150000L) + expr("(85 * COALESCE(__m, 0L)) DIV 100")).as("pr"))
    }
    pr.select(col(idCol), col("pr").cast("long").as("pr_micro"))
  }

  /**
   * Per-node triangle counts via degree orientation (Schank & Wagner
   * '05 / Suri & Vassilvitskii WWW'11 "Counting Triangles and the Curse
   * of the Last Reducer"): each undirected edge is directed from its
   * lower-(degree, id) endpoint to the higher, wedges are generated only
   * at each edge's LOW endpoint, and a wedge (v, w) closes into a
   * triangle iff the oriented edge v→w exists. Over a near-dup pair
   * graph the count is each document's local duplication-clique density
   * — the signal separating "one stray copy" from "a replica farm", and
   * the numerator of local clustering coefficients. Emits
   * (idCol, triangles) for EVERY node (isolated nodes report 0); each
   * triangle contributes 1 to all three corners.
   *
   * Scale: the orientation is the whole point — every wedge is charged
   * to its lowest-degree corner, so a degree-D hub generates no D²
   * wedge blowup (the "curse of the last reducer"); total wedge volume
   * is O(m^{3/2}) worst-case and output-proportional on real graphs.
   * The oriented edge frame is built once and referenced three times
   * (two wedge sides + the closing join) — all three hash the same
   * 8-byte node keys. No iteration, three shuffles total.
   */
  def triangleCounts(edges: DataFrame, nodes: DataFrame,
                     idCol: String = "doc_id"): DataFrame = {
    // canonical undirected edges (accepts either one or both directions)
    // materialize once: the edge list is referenced by the degree
    // aggregate, the orientation join, and (via `oriented`) three more
    // consumers — without the pin, an expensive upstream (a near-dup
    // candidate pipeline) replans per reference (the pageRank lesson)
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
    val deg = und.select(col("a").as("n"))
      .union(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient by the total order (degree asc, id asc); carry the head's
    // order key so wedge pairs can be canonically ordered without a
    // second degree join
    val oriented = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("db").as("d"), col("b").as("n")))
          .otherwise(struct(col("da").as("d"), col("a").as("n")))
          .as("kdst"))
    val w1 = oriented.select(col("src").as("u"), col("kdst").as("kv"))
    val w2 = oriented.select(col("src").as("u"), col("kdst").as("kw"))
    val tris = w1.join(w2, "u")
      .filter(col("kv") < col("kw"))
      .select(col("u"), col("kv.n").as("v"), col("kw.n").as("w"))
      .join(oriented.select(col("src").as("v"), col("kdst.n").as("w")),
        Seq("v", "w"))
    val perNode = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("t"))
    nodes.select(col(idCol))
      .join(perNode, nodes(idCol) === perNode("n"), "left")
      .select(col(idCol), coalesce(col("t"), lit(0L)).as("triangles"))
  }

  /**
   * Local clustering coefficient per node, in exact integer permille:
   * `2000·triangles DIV (degree·(degree−1))` — the fraction of a node's
   * neighbor pairs that are themselves connected (Watts–Strogatz). Over
   * a near-dup graph this separates tight replica CLIQUES (coeff →
   * 1000) from hub-and-spoke template families (a shared boilerplate
   * neighbor with unrelated spokes, coeff → 0) — the two need different
   * dedup treatment (drop all-but-one vs strip the template). Nodes
   * with degree < 2 report 0 (no neighbor pair exists). Emits
   * (idCol, degree, triangles, coeff_permille); pure BIGINT, engine-
   * and partition-invariant.
   *
   * Scale: [[triangleCounts]] plus one degree aggregate and a node-key
   * join — nothing beyond the triangle pass itself.
   */
  def clusteringCoefficients(edges: DataFrame, nodes: DataFrame,
                             idCol: String = "doc_id"): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("n"))
      .union(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    triangleCounts(edges, nodes, idCol)
      .join(deg, col(idCol) === col("n"), "left")
      .select(col(idCol),
        coalesce(col("d"), lit(0L)).as("degree"),
        col("triangles"),
        when(coalesce(col("d"), lit(0L)) >= 2,
          expr("2000 * triangles DIV (d * (d - 1))"))
          .otherwise(lit(0L)).as("coeff_permille"))
  }
}
