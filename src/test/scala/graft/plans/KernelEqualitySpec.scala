package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite

/**
 * The trained-matrix kernels carry `Array[Double]` constructor params;
 * case-class equality on an array is REFERENCE identity, so two
 * semantically identical instances (the corpus-side and query-side
 * `withIvfCell` calls in a self-kNN each flatten their own array) would
 * never compare equal — defeating `semanticEquals`-based subexpression
 * elimination and exchange reuse. Both kernels override equals/hashCode
 * to compare contents; these tests pin that contract.
 */
class KernelEqualitySpec extends AnyFunSuite {

  private def vec = Literal.create(Seq(1.0f, 2.0f),
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType))

  test("NearestCell: separately-built equal-content matrices compare " +
      "equal (and hash equal); different content does not") {
    val a = NearestCell(vec, Array(1.0, 0.0, 0.0, 1.0), 2, 2)
    val b = NearestCell(vec, Array(1.0, 0.0, 0.0, 1.0), 2, 2)
    val c = NearestCell(vec, Array(1.0, 0.0, 0.5, 1.0), 2, 2)
    assert(a == b && a.hashCode == b.hashCode)
    assert(a != c)
    assert(a.semanticEquals(b), "semanticEquals must see through the array")
    assert(!a.semanticEquals(c))
  }

  test("PqCode: content equality over matrix AND bias; offset/k/dsub " +
      "still discriminate") {
    val m = Array(1.0, 0.0, 0.0, 1.0)
    val bias = Array(0.5, 0.25)
    val a = PqCode(vec, m.clone(), 2, 2, 0, bias.clone())
    val b = PqCode(vec, m.clone(), 2, 2, 0, bias.clone())
    assert(a == b && a.hashCode == b.hashCode)
    assert(a.semanticEquals(b))
    assert(a != PqCode(vec, m.clone(), 2, 2, 2, bias.clone()))
    assert(a != PqCode(vec, m.clone(), 2, 2, 0, Array(0.5, 0.75)))
  }
}
