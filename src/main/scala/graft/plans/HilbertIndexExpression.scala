package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Native Hilbert-curve index: `graft_hilbert(xCell, yCell, bitsPerDim)`
 * maps a pair of `bitsPerDim`-wide non-negative cell coordinates to
 * their distance along the 2-D Hilbert curve (the classic per-level
 * quadrant/rotate fold, MSB first: digit = (3·rx) XOR ry, then the
 * lower-order square is flipped/transposed when ry = 0).
 *
 * Why a native expression and not a Column fold: each level's (x, y)
 * rewrite references BOTH previous coordinates inside conditionals, so
 * an unrolled Column tree doubles per level — 2^bits nodes that stall
 * planning/codegen exactly like the giant unrolled SQL expressions
 * documented in PLANS.md. Here the loop is ~10 Java statements inside
 * whole-stage codegen regardless of bit width; the interpreted eval is
 * the identical Scala loop. The DuckDB oracle twin runs the same fold
 * as a `list_reduce` over bit levels with a struct accumulator — both
 * engines walk the same integer state machine bit for bit.
 *
 * Coordinates outside [0, 2^bits) are masked to their low `bits` —
 * callers (Layout.hilbertLayout) always pass grid cells already in
 * range, so the mask only guards against misuse turning into garbage
 * high-bit flips (the flip constant is the full-grid `2^bits - 1`).
 */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31,
    s"graft_hilbert: bitsPerDim must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert requires (BIGINT, BIGINT), got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val mask = (1L << bits) - 1L
    var x = l.asInstanceOf[Long] & mask
    var y = r.asInstanceOf[Long] & mask
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val rx = (x >> i) & 1L
      val ry = (y >> i) & 1L
      d += ((3L * rx) ^ ry) << (2 * i)
      if (ry == 0L) {
        if (rx == 1L) {
          x = mask - x
          y = mask - y
        }
        val t = x; x = y; y = t
      }
      i -= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val i = ctx.freshName("hi")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      val mask = (1L << bits) - 1L
      s"""
         |long $x = $l & ${mask}L;
         |long $y = $r & ${mask}L;
         |long $d = 0L;
         |for (int $i = ${bits - 1}; $i >= 0; $i--) {
         |  long $rx = ($x >> $i) & 1L;
         |  long $ry = ($y >> $i) & 1L;
         |  $d += ((3L * $rx) ^ $ry) << (2 * $i);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = ${mask}L - $x; $y = ${mask}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
