package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/**
 * Native IVF cell assignment: 1-based index of the centroid with the
 * largest dot product against `child`, over a TRAINED centroid matrix
 * carried as a constructor parameter (the matrix is a driver value —
 * `nlist` ≤ ~√n rows by the IVF sizing contract — not a column).
 *
 * Replaces the interpreted HOF chain
 * `array_position-argmax over transform(__cents, c -> graft_dot(vec, c))`
 * on the CORPUS side of the IVF paths — the index-build kernel that
 * runs once per corpus row. The chain pays `nlist` lambda dispatches
 * plus a boxed virtual `graft_dot` call per centroid per row; this
 * expression is ONE fused unboxed loop inside whole-stage codegen.
 * Measured on the round-17 1M-vector drill (nlist = 1000, dim = 64,
 * BENCH_scaling.md): the fused loop assigns the corpus ~8× faster than
 * the HOF chain. The per-centroid distances are NOT emitted — callers
 * that need `__dists` (the query-side probe ranking, nprobe ≪ nlist
 * rows) keep the HOF form, and column pruning drops it from corpus
 * scans.
 *
 * Exactness contract (the chain's semantics, bit-for-bit, so the
 * DuckDB oracle's closed-form recomputation still matches):
 *  - per-centroid accumulation is `graft_dot`'s left-to-right double
 *    sum over the UNIT-NORMALIZED centroid components, in centroid
 *    order;
 *  - ties break to the FIRST maximal centroid (strict `>` keeps the
 *    earlier index — `array_position`'s first-occurrence rule);
 *  - a null vector, a vector whose length differs from the centroid
 *    dimension, or any null element → null cell (the chain nulls every
 *    dot, `array_max` of all-null is null, `array_position(_, null)`
 *    is null).
 */
case class NearestCell(child: Expression, matrix: Array[Double],
                       nlist: Int, dim: Int)
    extends UnaryExpression {

  require(nlist >= 1, s"nlist must be >= 1, got $nlist")
  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(matrix.length == nlist * dim,
    s"centroid matrix must be nlist*dim = ${nlist * dim} doubles flat, " +
      s"got ${matrix.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cell requires ARRAY<FLOAT|DOUBLE>, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"

  // null on shape violations even when the input is non-null — the
  // child-derived default would let codegen emit a constant-false
  // isNull and break compilation (same trap as DotProduct.nullable)
  override def nullable: Boolean = true

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def compute(arr: ArrayData): Any = {
    val n = arr.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    var best = Double.NegativeInfinity
    var bestIdx = 1
    var c = 0
    while (c < nlist) {
      var acc = 0.0
      val base = c * dim
      var d = 0
      while (d < dim) {
        val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        acc += x * matrix(base + d)
        d += 1
      }
      // Spark orders NaN GREATEST and NaN = NaN is true, so the chain's
      // array_max/array_position selects the FIRST NaN when one exists;
      // Java's `>` would never select it — branch explicitly.
      if (java.lang.Double.isNaN(acc)) {
        if (!java.lang.Double.isNaN(best)) { best = acc; bestIdx = c + 1 }
      } else if (acc > best) { best = acc; bestIdx = c + 1 }
      c += 1
    }
    // a first dot of -Infinity still assigns cell 1: the strict `>`
    // against the -Infinity sentinel fails, but bestIdx starts at 1
    bestIdx
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("ivfCents", matrix, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val vec = ctx.freshName("vec")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val cc = ctx.freshName("cc")
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
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $vec = new double[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $vec[$i] = (double) $c.$get($i);
         |  }
         |  double $best = Double.NEGATIVE_INFINITY;
         |  int $bestIdx = 1;
         |  for (int $cc = 0; $cc < $nlist; $cc++) {
         |    double $acc = 0.0;
         |    final int $base = $cc * $dim;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += $vec[$d] * $matRef[$base + $d];
         |    }
         |    if (Double.isNaN($acc)) {
         |      if (!Double.isNaN($best)) { $best = $acc; $bestIdx = $cc + 1; }
         |    } else if ($acc > $best) { $best = $acc; $bestIdx = $cc + 1; }
         |  }
         |  ${ev.value} = $bestIdx;
         |}
       """.stripMargin
    })
  }

  // Case-class equality on an Array param is reference identity, which
  // makes two semantically identical instances (e.g. the corpus-side and
  // query-side assignments in a self-kNN, each flattening its own copy
  // of the same trained matrix) compare unequal — defeating
  // semanticEquals-based subexpression elimination and exchange reuse
  // that the earlier value-equal typedLit literals permitted. Compare
  // matrix CONTENTS instead.
  override def equals(other: Any): Boolean = other match {
    case that: NearestCell =>
      nlist == that.nlist && dim == that.dim && child == that.child &&
        java.util.Arrays.equals(matrix, that.matrix)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, Integer.valueOf(nlist),
      Integer.valueOf(dim), Integer.valueOf(java.util.Arrays.hashCode(matrix)))

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}
