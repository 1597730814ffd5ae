package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * KMV (k-minimum-values) distinct-count sketch as a typed
 * [[Aggregator]] — the §2.10 UDAF surface: partial buffers build
 * map-side, merge associatively across partitions, and the driver never
 * sees more than `k` longs per group.
 *
 * The sketch keeps the `k` smallest DISTINCT hash values seen. With
 * hashes uniform on `[0, mod)`, the k-th smallest value `h_k` estimates
 * density: `estimate = (k-1) * mod / h_k`. Below `k` distinct values the
 * sketch is exact. Determinism: the input hashes are the reproducible
 * polynomial hash ([[TextFns.polyHash]]), so buffers, merges, and the
 * final estimate are bit-identical across partitionings, runs, and the
 * DuckDB oracle (which recomputes the same k smallest hashes with
 * ORDER BY ... LIMIT k).
 */
class KmvSketch(k: Int, mod: Long = TextFns.HashMod)
    extends Aggregator[Long, Array[Long], Double] {

  override def zero: Array[Long] = Array.empty[Long]

  /** Insert keeping the buffer a sorted set of at most k smallest. */
  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble * mod / buf(k - 1)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvSketch {
  /** Spark-SQL-callable column aggregator: `kmv(hashCol)`. */
  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvSketch(k), Encoders.scalaLong)
}

/**
 * Bounded k-smallest aggregator: the `k` smallest DISTINCT long values
 * per group, returned sorted ascending. Same sorted-insert buffer as
 * [[KmvSketch]] (at most `k` longs of state in every partial buffer and
 * merge), but `finish` returns the values themselves rather than a
 * density estimate — the building block for capped inverted-index
 * posting lists, where an unbounded `collect_set(doc_id)` would hold
 * every document containing a stopword term in one aggregation buffer.
 */
class MinKLongs(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  private val ins = new KmvSketch(k)
  override def zero: Array[Long] = Array.empty[Long]
  override def reduce(buf: Array[Long], v: Long): Array[Long] = ins.reduce(buf, v)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = ins.merge(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinKLongs {
  /** Spark-SQL-callable column aggregator: `mink(longCol)`. */
  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MinKLongs(k), Encoders.scalaLong)
}
