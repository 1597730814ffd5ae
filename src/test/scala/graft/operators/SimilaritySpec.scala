package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (1L, Array(1.0f, 0.0f)),
    (2L, Array(0.8f, 0.6f)),
    (3L, Array(0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine and excludes self") {
    val out = rows(Similarity.bruteForceTopK(emb, emb.filter($"vec_id" === 1), k = 3)
      .orderBy("rank"))
    // query 1: cos(2)=0.8, cos(3)=0, cos(4)=-1
    assert(out == Seq(Seq(1L, 2L, 1L), Seq(1L, 3L, 2L), Seq(1L, 4L, 3L)))
  }

  test("hyperplaneLshPairs output is a subset of the exact pairs") {
    val exact = rows(Dedup.embeddingNearDupPairs(emb, threshold = 0.5)).toSet
    val lsh = rows(Similarity.hyperplaneLshPairs(emb, threshold = 0.5,
      numPlanes = 2, numTables = 8, dim = 2)).toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.nonEmpty) // (1,2) at cos 0.8 should survive 8 tables
  }
}
