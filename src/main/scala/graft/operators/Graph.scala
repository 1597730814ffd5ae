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
}
