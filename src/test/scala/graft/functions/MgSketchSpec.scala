package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

class MgSketchSpec extends SparkSpec {
  import spark.implicits._

  test("sketch survivors are a superset of true heavy hitters, any layout") {
    // zipf-ish stream: token i appears ~1000/i times; k=8 guarantees
    // every token over n/9 survives any partitioning/merge order
    val stream = (1 to 40).flatMap(i => Seq.fill(1000 / i)(s"t$i"))
    val n = stream.size
    val truth = stream.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 * 9 > n).keySet
    assert(truth.nonEmpty)
    val mg = MgSketch.udaf(8)
    for (parts <- Seq(1, 4, 13)) {
      val cand = stream.toDF("t").repartition(parts)
        .agg(mg(col("t"))).head().getAs[Map[String, Long]](0)
      assert(cand.size <= 8)
      assert(truth.subsetOf(cand.keySet), s"parts=$parts")
    }
  }

  test("heavyHitters output is exact and partition-invariant") {
    val docs = Seq(
      (1L, "a a a a b b c d"), (2L, "a a b b e f"), (3L, "a b g h"))
      .toDF("doc_id", "text")
    // n = 18; k=3 -> threshold 18/4: a (7x) and b (5x) qualify
    val out = rows(TextAnalysis.heavyHitters(docs, k = 3)
      .orderBy(desc("n_occurrences"), col("token")))
    assert(out == Seq(Seq("a", 7L, 7.0 / 18), Seq("b", 5L, 5.0 / 18)))
    val repart = rows(TextAnalysis.heavyHitters(docs.repartition(5), k = 3)
      .orderBy(desc("n_occurrences"), col("token")))
    assert(repart == out)
    // empty corpus: empty result, not a crash
    assert(TextAnalysis.heavyHitters(docs.filter(lit(false)), k = 3)
      .count() == 0L)
  }
}
