package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.functions.TextFns

/**
 * Native MinHash signature: `graft_minhash(shingleHashes, numHashes)` maps
 * an ARRAY<BIGINT> of (already reduced, < 1e9+7) shingle hashes to the
 * ARRAY<BIGINT> of `numHashes` components `min_j((a_i*h_j + b_i) mod P)`.
 *
 * One tight two-level Java loop per document inside whole-stage codegen,
 * replacing the explode + groupBy + 128 min-aggregate formulation — the
 * signature step becomes a narrow shuffle-free projection. Permutation
 * parameters are [[TextFns.minhashParams]], so components are identical
 * to the aggregate formulation.
 *
 * Empty input array yields all components = P (no shingle seen); callers
 * filter empty documents out before banding, same as the aggregate path
 * (which produced no row for them).
 */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires ARRAY<BIGINT>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  @transient private lazy val params: (Array[Long], Array[Long]) = {
    val ps = TextFns.minhashParams(numHashes)
    (ps.map(_._1).toArray, ps.map(_._2).toArray)
  }

  private def compute(arr: ArrayData): ArrayData = {
    val (as, bs) = params
    val out = Array.fill(numHashes)(TextFns.HashMod)
    var j = 0
    while (j < arr.numElements()) {
      val h = arr.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = (h * as(i) + bs(i)) % TextFns.HashMod
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
