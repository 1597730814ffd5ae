package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Linear-time token-position removal:
 * `graft_drop_positions(tokens, sortedPositions)` = the tokens whose
 * 1-based position is NOT in `sortedPositions`, joined by single spaces —
 * exactly `concat_ws(' ', filter(tokens, (tok, j) ->
 * NOT array_contains(sortedPositions, j + 1)))`, but one merge pass of
 * O(len + |positions|) instead of the HOF form's O(len × |positions|)
 * membership scan. That quadratic term is the difference between
 * rewriting a heavily-duplicated 100k-token document in milliseconds and
 * in ~10^10 comparisons on one task (the [[graft.operators.Dedup
 * .removeDuplicatedSpans]] long-document skew hazard this expression
 * exists to remove).
 *
 * PRECONDITION: `sortedPositions` ascending (duplicates and out-of-range
 * values are tolerated — the merge pointer skips them). Callers sort once
 * per row with `array_sort` on the collected position set.
 *
 * Null semantics: null if either input is null (callers coalesce the
 * position side to an empty array and the result to '' where the HOF
 * form's concat_ws would have absorbed a null). Null tokens are skipped,
 * matching concat_ws.
 */
case class DropPositions(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_drop_positions requires (ARRAY<STRING>, ARRAY<INT>), " +
        s"got $l and $r")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_drop_positions"

  override def nullSafeEval(l: Any, r: Any): Any =
    DropPositions.dropJoin(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.DropPositions.dropJoin($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DropPositions =
    copy(left = newLeft, right = newRight)
}

object DropPositions {
  private val Space = UTF8String.fromString(" ")

  /** One merge pass: advance a pointer through the ascending positions
   * while walking tokens once; survivors concat through the UTF8String
   * fast path (no UTF-16 decode). Kept public/static so codegen calls it
   * directly. */
  def dropJoin(tokens: ArrayData, sortedPos: ArrayData): UTF8String = {
    val n = tokens.numElements()
    val m = sortedPos.numElements()
    val keep = new Array[UTF8String](n)
    var k = 0
    var o = 0
    var j = 0
    while (j < n) {
      val p = j + 1
      while (k < m && !sortedPos.isNullAt(k) && sortedPos.getInt(k) < p) k += 1
      val drop = k < m && !sortedPos.isNullAt(k) && sortedPos.getInt(k) == p
      if (!drop && !tokens.isNullAt(j)) {
        keep(o) = tokens.getUTF8String(j)
        o += 1
      }
      j += 1
    }
    UTF8String.concatWs(Space, java.util.Arrays.copyOf(keep, o): _*)
  }
}
