package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/**
 * Native packed hyperplane-LSH signature:
 * `graft_hyperplane_sig(vec, totalPlanes, dim)` sets bit p iff the dot
 * product of `vec` with pseudo-random plane p is positive — the whole
 * plane matrix evaluated in ONE fused loop per vector.
 *
 * Replaces the interpreted HOF chain
 * `aggregate(zip_with(transform(planes, p -> graft_dot(vec, p)), ...))`
 * that costs `totalPlanes` lambda dispatches per row on the ANN /
 * embedding-near-dup paths. Bit-identical to that chain and to the
 * DuckDB oracle:
 *  - plane components are the same closed-form LCG of (plane, dim) as
 *    `Similarity.planeComponent` (so the oracle's `generate_series`
 *    recomputation still matches);
 *  - per-plane accumulation is `graft_dot`'s left-to-right double sum;
 *  - the HOF chain's edge semantics are preserved: a vector whose
 *    length differs from `dim`, or with a null element, makes every
 *    per-plane dot NULL, and `CASE WHEN d > 0` then takes the ELSE 0
 *    branch — signature 0, not null. A null vector stays null.
 */
case class HyperplaneSig(child: Expression, totalPlanes: Int, dim: Int)
    extends UnaryExpression {

  require(totalPlanes >= 1 && totalPlanes <= 64,
    "totalPlanes must fit a packed 64-bit signature")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_sig requires ARRAY<FLOAT|DOUBLE>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Same closed form as Similarity.planeComponent / the oracle SQL. */
  @transient private lazy val planes: Array[Double] = {
    val out = new Array[Double](totalPlanes * dim)
    var p = 0
    while (p < totalPlanes) {
      var d = 0
      while (d < dim) {
        val x = (1103515245L * (p * 131L + d + 1) + 12345L) % 2147483647L
        out(p * dim + d) = ((if (x < 0) -x else x) % 2001L - 1000L) / 1000.0
        d += 1
      }
      p += 1
    }
    out
  }

  private def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    // HOF-chain edge semantics: mismatched length or a null element
    // nulls every per-plane dot, and CASE WHEN null THEN .. ELSE 0
    // yields signature 0
    if (n != dim) return 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0L
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < totalPlanes) {
      var acc = 0.0
      val base = p * dim
      var d = 0
      while (d < dim) {
        val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        acc += x * planes(base + d)
        d += 1
      }
      if (acc > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hplaneSig", this, classOf[HyperplaneSig].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (Long) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}
