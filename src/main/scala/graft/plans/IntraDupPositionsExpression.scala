package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/**
 * Within-document repeated-window positions:
 * `graft_intra_dup_positions(tokens, w)` = the ascending 1-based token
 * positions covered by any `w`-token window whose exact text already
 * occurred at an EARLIER start within the SAME token array (the first
 * occurrence owns; later occurrences' spans are marked). Feeding the
 * result to `graft_drop_positions` rewrites the document with its
 * internal boilerplate repeats removed — the WITHIN-document half of
 * exact-substring dedup (Lee et al. ACL'22), which the cross-document
 * operator deliberately ignores (its 2-distinct-docs test keeps
 * intra-doc repeats).
 *
 * Decided on ACTUAL window text (token strings contain no whitespace —
 * the tokenizer splits on it — so the space-join key is injective);
 * per-row, no shuffle: this is the rare span operator that is a pure
 * scan projection, because ownership never crosses rows.
 *
 * Null semantics: null for a null token array; null tokens inside the
 * array are treated as empty strings for window identity (the
 * tokenizer never produces them).
 */
case class IntraDupPositions(child: Expression, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_intra_dup_positions requires ARRAY<STRING>, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_intra_dup_positions"

  override def nullSafeEval(input: Any): Any =
    IntraDupPositions.positions(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.IntraDupPositions.positions($c, $w);")

  override protected def withNewChildInternal(
      newChild: Expression): IntraDupPositions = copy(child = newChild)
}

object IntraDupPositions {
  /** One pass: window-text -> first start; later occurrences mark their
   * covered positions. O(len · w) characters hashed, O(len) state.
   * Kept public/static so codegen calls it directly. */
  def positions(tokens: ArrayData, w: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Int])
    val toks = new Array[String](n)
    var t = 0
    while (t < n) {
      toks(t) = if (tokens.isNullAt(t)) "" else tokens.getUTF8String(t).toString
      t += 1
    }
    val first = new java.util.HashMap[String, Integer]()
    val removed = new Array[Boolean](n)
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j <= n - w) {
      sb.setLength(0)
      var q = j
      while (q < j + w) {
        if (q > j) sb.append(' ')
        sb.append(toks(q))
        q += 1
      }
      val key = sb.toString
      val f = first.putIfAbsent(key, Integer.valueOf(j))
      if (f != null) {
        var p = j
        while (p < j + w) { removed(p) = true; p += 1 }
      }
      j += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var p = 0
    while (p < n) { if (removed(p)) out += (p + 1); p += 1 }
    new GenericArrayData(out.toArray)
  }
}
