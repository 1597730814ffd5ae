package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native dot product: `graft_dot(a, b)` over ARRAY<FLOAT> / ARRAY<DOUBLE>
 * columns — one tight loop accumulating left-to-right in double, exactly
 * the arithmetic of `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)),
 * 0d, (acc,v) -> acc+v)` (bit-identical results, including the DuckDB
 * oracle's sequential list_sum), but without the interpreted
 * higher-order-function machinery: the HOF form dominated the ANN
 * operators' runtime at ~6M candidate pairs x 64 elements per query.
 *
 * Null/shape semantics match the HOF form: null if either array is null,
 * lengths differ (zip_with pads with null), or any element is null.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires ARRAY<FLOAT|DOUBLE> args, got " +
      s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // nullSafeEval returns null for length-mismatched arrays and null
  // elements even when BOTH inputs are non-null, so the default
  // child-derived nullability would be a lie: an optimizer may fold
  // IsNull(graft_dot(..)) away on it, and codegen emits the constant
  // `false` for ev.isNull — the generated `false = true;` then fails to
  // compile and the whole stage silently falls back to the interpreter
  // (observed when the inputs are computed non-nullable arrays rather
  // than parquet columns).
  override def nullable: Boolean = true

  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotExpr", this, classOf[DotProduct].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("dotRes")
      s"""
         |Object $res = $ref.nullSafeEval($a, $b);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $res).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
