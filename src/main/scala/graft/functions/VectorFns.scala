package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Dense-vector column math over `ARRAY<FLOAT>` embedding columns, built
 * from higher-order functions (`zip_with` + `aggregate`) so the hot path
 * stays inside whole-stage codegen — no UDF boxing per element.
 */
object VectorFns {

  /** Dot product of two float-array expressions, accumulated left-to-right
   * in double. Resolves to the native [[graft.plans.DotProduct]] loop
   * (bit-identical to the HOF aggregate-over-zip_with form and the DuckDB
   * oracle's sequential list_sum, ~10x cheaper per pair); the session must
   * register [[graft.plans.GraftExtensions]]. */
  def dot(aExpr: String, bExpr: String): Column =
    expr(s"graft_dot($aExpr, $bExpr)")

  /** L2 norm of a float-array expression. */
  def norm(aExpr: String): Column = sqrt(dot(aExpr, aExpr))

  /** Cosine similarity — prefer precomputing norms once per side before a
   * join (see Similarity) instead of calling this inside join conditions. */
  def cosine(aExpr: String, bExpr: String): Column =
    dot(aExpr, bExpr) / (norm(aExpr) * norm(bExpr))

}
