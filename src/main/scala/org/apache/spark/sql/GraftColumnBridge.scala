package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * The one `private[sql]` doorway the library uses: wrapping a Catalyst
 * `Expression` into a `Column` (Spark 4 routes Columns through
 * ColumnNodes; `classic.ExpressionUtils.column` is the supported
 * internal conversion, used by Spark's own function library).
 *
 * Needed for expressions carrying DRIVER-VALUE parameters — e.g.
 * [[graft.plans.NearestCell]]'s trained centroid matrix — which cannot
 * ride through the SQL function-registry route: a registry builder
 * only sees argument EXPRESSIONS at parse time (an unresolved
 * attribute, not the literal's values), and inlining an nlist×dim
 * matrix into SQL text would push megabytes through the parser per
 * query. Registered-function expressions with scalar/column args
 * (graft_dot, graft_span_cover, …) keep using the registry; this
 * bridge is only for driver-parameterized kernels.
 */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The reverse direction: a Column's resolved/unresolved expression,
   * for embedding user-supplied Columns as children of
   * driver-parameterized expressions. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
