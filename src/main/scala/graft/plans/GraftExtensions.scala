package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * Session extensions for the graft engine. Activate with
 * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` (works
 * through `getOrCreate`) or `SparkSession.builder().withExtensions(...)`.
 *
 * Currently injects:
 *  - `graft_poly_hash(str[, mult, mod])` — native codegen'd polynomial
 *    hash ([[PolyHash]]); defaults (31, 1e9+7) match `TextFns.HashMod`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _)  => v.toLong
    case other => throw new IllegalArgumentException(
      s"graft_poly_hash: $what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => NanosRangePushdown)
    ext.injectFunction((
      new FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (args: Seq[Expression]) => args match {
        case Seq(s)             => PolyHash(s, 31L, 1000000007L)
        case Seq(s, mult, mod)  =>
          PolyHash(s, longLit(mult, "mult"), longLit(mod, "mod"))
        case _ => throw new IllegalArgumentException(
          "graft_poly_hash expects (str) or (str, mult, mod)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException(
          "graft_dot expects (arrayA, arrayB)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashSig].getName, "graft_simhash"),
      (args: Seq[Expression]) => args match {
        case Seq(arr) => SimHashSig(arr)
        case _ => throw new IllegalArgumentException(
          "graft_simhash expects (tokenHashArray)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => NfcNormalize(s)
        case _ => throw new IllegalArgumentException(
          "graft_nfc expects (str)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_del1_keys"),
      new ExpressionInfo(classOf[Del1Keys].getName, "graft_del1_keys"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => Del1Keys(s)
        case _ => throw new IllegalArgumentException(
          "graft_del1_keys expects (str)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert"),
      (args: Seq[Expression]) => args match {
        case Seq(x, y, bits) =>
          HilbertIndex(x, y, longLit(bits, "bitsPerDim").toInt)
        case _ => throw new IllegalArgumentException(
          "graft_hilbert expects (xCell, yCell, bitsPerDim)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "graft_hyperplane_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(vec, total, dim) =>
          HyperplaneSig(vec, longLit(total, "totalPlanes").toInt,
            longLit(dim, "dim").toInt)
        case _ => throw new IllegalArgumentException(
          "graft_hyperplane_sig expects (vec, totalPlanes, dim)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (args: Seq[Expression]) => args match {
        case Seq(arr, n) => MinHashSig(arr, longLit(n, "numHashes").toInt)
        case _ => throw new IllegalArgumentException(
          "graft_minhash expects (shingleHashArray, numHashes)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_char_entropy"),
      new ExpressionInfo(classOf[CharEntropyMicro].getName,
        "graft_char_entropy"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => CharEntropyMicro(s)
        case _ => throw new IllegalArgumentException(
          "graft_char_entropy expects (str)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_drop_positions"),
      new ExpressionInfo(classOf[DropPositions].getName,
        "graft_drop_positions"),
      (args: Seq[Expression]) => args match {
        case Seq(toks, pos) => DropPositions(toks, pos)
        case _ => throw new IllegalArgumentException(
          "graft_drop_positions expects (tokenArray, sortedPositionArray)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_span_cover"),
      new ExpressionInfo(classOf[SpanCover].getName,
        "graft_span_cover"),
      (args: Seq[Expression]) => args match {
        case Seq(starts, w) =>
          SpanCover(starts, longLit(w, "w").toInt)
        case _ => throw new IllegalArgumentException(
          "graft_span_cover expects (sortedStartArray, w)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_intra_dup_positions"),
      new ExpressionInfo(classOf[IntraDupPositions].getName,
        "graft_intra_dup_positions"),
      (args: Seq[Expression]) => args match {
        case Seq(toks, w) =>
          IntraDupPositions(toks, longLit(w, "w").toInt)
        case _ => throw new IllegalArgumentException(
          "graft_intra_dup_positions expects (tokenArray, w)")
      }))
  }
}
