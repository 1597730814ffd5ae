package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native 64-bit SimHash signature: `graft_simhash(tokenHashes)` maps an
 * ARRAY<BIGINT> of per-token hashes to one packed BIGINT whose bit b is set
 * iff `sum_tokens(bit_b(hash) == 1 ? +1 : -1) > 0` — the Charikar/Manku
 * frequency-weighted sign vector.
 *
 * One tight 64-counter loop per document inside whole-stage codegen,
 * replacing an interpreted `aggregate(zip_with(...))` chain that costs 64
 * lambda steps per token (~17M steps on the sf0.1 corpus). Bit-identical
 * to the HOF formulation and to the DuckDB oracle's recomputation.
 *
 * Empty input array yields signature 0 (all counters 0, no bit positive) —
 * same as the HOF path.
 */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires ARRAY<BIGINT>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  private def compute(arr: ArrayData): Long = {
    val counters = new Array[Int](64)
    var j = 0
    while (j < arr.numElements()) {
      val h = arr.getLong(j)
      var b = 0
      while (b < 64) {
        counters(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("simhashSig", this, classOf[SimHashSig].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (Long) $expr.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}
