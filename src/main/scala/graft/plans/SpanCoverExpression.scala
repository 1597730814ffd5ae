package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/**
 * Window-cover expansion: `graft_span_cover(sortedStarts, w)` = the
 * ascending 1-based token positions covered by any `w`-token window
 * starting at one of `sortedStarts` — exactly
 * `array_sort(array_distinct(flatten(transform(starts, i ->
 * sequence(i, i + w - 1)))))`, but one merge pass of
 * O(|starts| + |positions|) with no intermediate |starts| × w array.
 *
 * Exists for the span family's removal sets ([[graft.operators.Dedup
 * .removeDuplicatedSpans]] / `duplicatedSpanRuns`): expanding covers
 * BEFORE the per-document aggregation meant exploding |flagged
 * occurrences| × w position rows through a hash aggregate whose
 * map-side distinct is the dominant cost at high duplication (profiled
 * +3.5 s of a 9 s adversarial 10x run, BENCH_scaling round 16);
 * collecting the 4-byte starts instead and expanding once per document
 * inside codegen makes the shuffled volume |starts| and the expansion
 * linear.
 *
 * PRECONDITION: `sortedStarts` ascending (duplicates tolerated — the
 * cover merge absorbs them; nulls skipped). Callers sort once per row
 * with `array_sort` on the collected starts.
 *
 * Null semantics: null for a null starts array.
 */
case class SpanCover(child: Expression, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_span_cover requires ARRAY<INT>, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_span_cover"

  override def nullSafeEval(input: Any): Any =
    SpanCover.cover(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SpanCover.cover($c, $w);")

  override protected def withNewChildInternal(
      newChild: Expression): SpanCover = copy(child = newChild)
}

object SpanCover {
  /** One counting pass + one fill pass over ascending starts: each
   * start contributes positions from max(start, lastEmitted + 1) to
   * start + w - 1. Two passes over the (tiny, 4-byte-starts) input
   * buy an exactly-sized primitive Array[Int] for the (potentially
   * huge — |cover| ~ duplicated mass) output: no per-position Integer
   * boxing, no buffer-doubling churn in the per-row codegen hot path.
   * Kept public/static so codegen calls it directly. */
  def cover(sortedStarts: ArrayData, w: Int): ArrayData = {
    val m = sortedStarts.numElements()
    // pass 1: count emitted positions (same merge recurrence, no writes)
    var n = 0
    var last = 0 // highest position emitted so far (positions are >= 1)
    var k = 0
    while (k < m) {
      if (!sortedStarts.isNullAt(k)) {
        val s = sortedStarts.getInt(k)
        val end = s + w - 1
        val from = math.max(s, last + 1)
        if (end >= from) { n += end - from + 1; last = end }
      }
      k += 1
    }
    // pass 2: fill the exactly-sized primitive array
    val out = new Array[Int](n)
    var i = 0
    last = 0
    k = 0
    while (k < m) {
      if (!sortedStarts.isNullAt(k)) {
        val s = sortedStarts.getInt(k)
        var p = math.max(s, last + 1)
        val end = s + w - 1
        while (p <= end) { out(i) = p; i += 1; p += 1 }
        if (end > last) last = end
      }
      k += 1
    }
    new GenericArrayData(out)
  }
}
