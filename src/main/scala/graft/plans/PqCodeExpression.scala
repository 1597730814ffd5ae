package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/**
 * Native PQ subvector encoding: 1-based index of the codebook centroid
 * maximizing the MIPS score `dot(vec[offset..offset+dsub), c_i) - bias_i`
 * (bias = ||c_i||²/2, precomputed on the driver — L2-nearest via the
 * max-inner-product identity). The windowed sibling of [[NearestCell]]:
 * the codebook rides as a driver value, the window is read IN PLACE
 * (no per-candidate `slice` array copy), and the whole scan stays in
 * whole-stage codegen.
 *
 * Replaces the interpreted chain in `Similarity.withPqCodes`
 * (`array_position`/`array_max` over `transform(sequence(1, k),
 * i -> graft_dot(slice(vec, offset+1, dsub), element_at(__cb, i)) -
 * element_at(__bias, i))`), which paid, per CORPUS row and subspace,
 * k interpreted lambda dispatches each doing a fresh `slice` COPY of
 * the subvector plus a boxed virtual dot call. (The twice-referenced
 * `__sc` alias is NOT collapsed into the argmax — plan-verified — so
 * the transform ran once; the dispatch/copy/boxing overhead alone
 * measured 368 s per 1M rows at m = 8, ksub = 256, vs 4.7 s fused.)
 * PQ encoding is the index-build kernel of the PQ/IVF-PQ family
 * (`pq_encode`, `writePqIndex`, `pqIngestSink` run it over every
 * corpus row at ksub candidates × m subspaces).
 *
 * Exactness contract (the chain's semantics bit-for-bit, DuckDB-oracle
 * compatible):
 *  - accumulation is `graft_dot`'s left-to-right double sum over the
 *    window, THEN one bias subtraction (matching `dot - bias`);
 *  - ties break to the FIRST maximal candidate (`array_position`);
 *  - null vector, window extending past the vector's end
 *    (`slice` yields a short array → every dot nulls), or a null
 *    element INSIDE the window → null code. Elements outside the
 *    window are never read, so nulls there don't null the code —
 *    exactly the slice-first chain's behavior.
 *
 * One DELIBERATE divergence: a malformed (ragged) codebook fails
 * loudly at construction (the flat-matrix require), where the chain
 * silently SKIPPED short centroids (their dot nulled and `array_max`
 * ignored the null) — an encode that quietly drops candidates is a
 * recall bug, not a semantics.
 */
case class PqCode(child: Expression, matrix: Array[Double],
                  k: Int, dsub: Int, offset: Int, bias: Array[Double])
    extends UnaryExpression {

  require(k >= 1, s"codebook must be non-empty, got k=$k")
  require(dsub >= 1, s"subvector dim must be >= 1, got $dsub")
  require(offset >= 0, s"offset must be >= 0, got $offset")
  require(matrix.length == k * dsub,
    s"codebook matrix must be k*dsub = ${k * dsub} doubles flat, " +
      s"got ${matrix.length}")
  require(bias.length == k,
    s"bias must carry one ||c||²/2 per candidate ($k), got ${bias.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_code requires ARRAY<FLOAT|DOUBLE>, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_pq_code"

  // null on shape violations with non-null input (see DotProduct.nullable)
  override def nullable: Boolean = true

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def compute(arr: ArrayData): Any = {
    if (arr.numElements() < offset + dsub) return null
    var i = offset
    while (i < offset + dsub) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    var best = Double.NegativeInfinity
    var bestIdx = 1
    var c = 0
    while (c < k) {
      var acc = 0.0
      val base = c * dsub
      var d = 0
      while (d < dsub) {
        val x = if (isFloat) arr.getFloat(offset + d).toDouble
                else arr.getDouble(offset + d)
        acc += x * matrix(base + d)
        d += 1
      }
      val score = acc - bias(c)
      // Spark orders NaN GREATEST and NaN = NaN is true, so the chain's
      // array_max/array_position selects the FIRST NaN when one exists;
      // Java's `>` would never select it — branch explicitly.
      if (java.lang.Double.isNaN(score)) {
        if (!java.lang.Double.isNaN(best)) { best = score; bestIdx = c + 1 }
      } else if (score > best) { best = score; bestIdx = c + 1 }
      c += 1
    }
    bestIdx
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("pqCb", matrix, "double[]")
    val biasRef = ctx.addReferenceObj("pqBias", bias, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val win = ctx.freshName("win")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val cc = ctx.freshName("cc")
      val acc = ctx.freshName("acc")
      val score = ctx.freshName("score")
      val base = ctx.freshName("base")
      val d = ctx.freshName("d")
      s"""
         |boolean $ok = $c.numElements() >= ${offset + dsub};
         |if ($ok) {
         |  for (int $i = $offset; $i < ${offset + dsub}; $i++) {
         |    if ($c.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $win = new double[$dsub];
         |  for (int $i = 0; $i < $dsub; $i++) {
         |    $win[$i] = (double) $c.$get($offset + $i);
         |  }
         |  double $best = Double.NEGATIVE_INFINITY;
         |  int $bestIdx = 1;
         |  for (int $cc = 0; $cc < $k; $cc++) {
         |    double $acc = 0.0;
         |    final int $base = $cc * $dsub;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      $acc += $win[$d] * $matRef[$base + $d];
         |    }
         |    final double $score = $acc - $biasRef[$cc];
         |    if (Double.isNaN($score)) {
         |      if (!Double.isNaN($best)) { $best = $score; $bestIdx = $cc + 1; }
         |    } else if ($score > $best) { $best = $score; $bestIdx = $cc + 1; }
         |  }
         |  ${ev.value} = $bestIdx;
         |}
       """.stripMargin
    })
  }

  // Content-based equality over the Array params (same rationale as
  // [[NearestCell]]): reference-identity equals would defeat
  // semanticEquals-based subexpression elimination between two
  // identically-parameterized instances.
  override def equals(other: Any): Boolean = other match {
    case that: PqCode =>
      k == that.k && dsub == that.dsub && offset == that.offset &&
        child == that.child &&
        java.util.Arrays.equals(matrix, that.matrix) &&
        java.util.Arrays.equals(bias, that.bias)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, Integer.valueOf(k),
      Integer.valueOf(dsub), Integer.valueOf(offset),
      Integer.valueOf(java.util.Arrays.hashCode(matrix)),
      Integer.valueOf(java.util.Arrays.hashCode(bias)))

  override protected def withNewChildInternal(newChild: Expression): PqCode =
    copy(child = newChild)
}
