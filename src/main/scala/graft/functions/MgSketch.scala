package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Misra-Gries frequent-items sketch as a typed [[Aggregator]]: at most
 * `k` (item, counter) pairs of state per buffer, merged associatively
 * across partitions (mergeable-summaries construction: sum counters,
 * then subtract the (k+1)-th largest and drop non-positive).
 *
 * Guarantee (any partitioning, any merge order): every item whose true
 * frequency exceeds `n / (k + 1)` of the `n` processed items survives in
 * the final buffer. The buffer CONTENTS beyond that guarantee depend on
 * merge order, so the sketch is a CANDIDATE GENERATOR, not an answer —
 * [[graft.operators.TextAnalysis.heavyHitters]] recounts candidates
 * exactly and thresholds, making the end-to-end result exact and
 * partition-invariant while the full-stream state stays O(k).
 */
class MgSketch(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, "k >= 1")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < k => buf.updated(x, 1L)
      case None => // decrement-all: x and every zeroed counter drop out
        buf.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest counter from all, keep positives
      val cut = summed.values.toArray.sortBy(-_).apply(k)
      summed.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object MgSketch {
  /** Spark-SQL-callable column aggregator: `mg(tokenCol)`. */
  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MgSketch(k), Encoders.STRING)
}
