package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: integer damping update, isolated node settles at base") {
    // star: 1-2, 1-3 (symmetrized), node 4 isolated.
    // p0 = 1_000_000 everywhere; deg(1) = 2, deg(2) = deg(3) = 1.
    // iter1: pr(1) = 150000 + 85*2_000_000//100        = 1_850_000
    //        pr(2) = pr(3) = 150000 + 85*500_000//100  =   575_000
    // iter2: pr(1) = 150000 + (85*1_150_000)//100      = 1_127_500
    //        pr(2) = pr(3) = 150000 + (85*925_000)//100 =  936_250
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst", $"src"))
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val out = rows(Graph.pageRank(edges, nodes, iters = 2).orderBy("doc_id"))
    assert(out == Seq(
      Seq(1L, 1127500L),
      Seq(2L, 936250L),
      Seq(3L, 936250L),
      Seq(4L, 150000L)))
    // partition-invariant: integer sums and divisions only
    val rep = rows(Graph.pageRank(edges.repartition(5),
      nodes.repartition(3), iters = 2).orderBy("doc_id"))
    assert(rep == out)
  }

  test("triangleCounts: clique triangles, pendant and isolated at zero") {
    // 4-clique {1,2,3,4} -> C(4,3) = 4 triangles, each corner in 3;
    // pendant 5 hangs off 1 (no triangle); node 6 isolated
    val clique = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)
    val pairs = (clique :+ (1L, 5L)).toDF("src", "dst")
    val nodes = (1L to 6L).toDF("doc_id")
    val out = rows(Graph.triangleCounts(pairs, nodes).orderBy("doc_id"))
    assert(out == Seq(
      Seq(1L, 3L), Seq(2L, 3L), Seq(3L, 3L), Seq(4L, 3L),
      Seq(5L, 0L), Seq(6L, 0L)))
    // direction- and duplicate-insensitive: symmetrized + doubled edges
    // canonicalize to the same undirected graph
    val sym = pairs.union(pairs.select($"dst", $"src")).union(pairs)
    assert(rows(Graph.triangleCounts(sym, nodes).orderBy("doc_id")) == out)
  }

  test("clusteringCoefficients: clique 1000 permille, hub diluted, " +
      "degree<2 zero") {
    val clique = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)
    val pairs = (clique :+ (1L, 5L)).toDF("src", "dst")
    val nodes = (1L to 6L).toDF("doc_id")
    val out = rows(Graph.clusteringCoefficients(pairs, nodes)
      .orderBy("doc_id"))
    assert(out == Seq(
      // node 1: degree 4 (clique + pendant), 3 triangles -> 2000*3/12
      Seq(1L, 4L, 3L, 500L),
      Seq(2L, 3L, 3L, 1000L), Seq(3L, 3L, 3L, 1000L),
      Seq(4L, 3L, 3L, 1000L),
      Seq(5L, 1L, 0L, 0L), Seq(6L, 0L, 0L, 0L)))
  }
}
