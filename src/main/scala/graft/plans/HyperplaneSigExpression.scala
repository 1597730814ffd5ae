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
 *  - plane components are the same closed-form mixed LCG of
 *    (plane, dim) as `Similarity.planeComponent` (so the oracle's
 *    `generate_series` recomputation still matches). The mix step
 *    (xorshift between two LCG rounds) is load-bearing: a single LCG
 *    round is AFFINE in the seed `p * 131 + d + 1`, which correlates
 *    planes so strongly that multi-table recall lands far below the
 *    independent-plane model (measured 0.38 vs modeled 0.98 at a
 *    9-plane x 7-table layout on planted cosine-0.96 near-dup pairs);
 *    with the xorshift mix measured recall matches the model
 *    (0.983 vs 0.984) and random-pair candidacy drops to the modeled
 *    L / 2^planes;
 *  - per-plane accumulation is `graft_dot`'s left-to-right double sum;
 *  - the HOF chain's edge semantics are preserved: a vector whose
 *    length differs from `dim`, or with a null element, makes every
 *    per-plane dot NULL, and `CASE WHEN d > 0` then takes the ELSE 0
 *    branch — signature 0, not null. A null vector stays null.
 *
 * `doGenCode` emits the plane loop INLINE (the precomputed plane
 * matrix rides along as a flat double[] reference object), so the hot
 * signing path — batch near-dup, both streaming sinks — runs unboxed
 * inside whole-stage codegen instead of paying a boxed virtual
 * `nullSafeEval` call per row.
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
  @transient private lazy val planes: Array[Double] =
    HyperplaneSig.planeMatrix(totalPlanes, dim)

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
    val planesRef = ctx.addReferenceObj("hplanes", planes, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $c.numElements();
         |boolean $ok = $n == $dim;
         |if ($ok) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($c.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |long $sig = 0L;
         |if ($ok) {
         |  for (int $p = 0; $p < $totalPlanes; $p++) {
         |    double $acc = 0.0;
         |    final int $base = $p * $dim;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += ((double) $c.$get($d)) * $planesRef[$base + $d];
         |    }
         |    if ($acc > 0) $sig |= (1L << $p);
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  /** Flat `totalPlanes x dim` plane matrix from the shared mixed-LCG
   * closed form (see [[graft.operators.Similarity.planeComponent]]). */
  private[graft] def planeMatrix(totalPlanes: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](totalPlanes * dim)
    var p = 0
    while (p < totalPlanes) {
      var d = 0
      while (d < dim) {
        out(p * dim + d) = graft.operators.Similarity.planeComponent(p, d)
        d += 1
      }
      p += 1
    }
    out
  }
}
