package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native 1-deletion neighborhood keys: `graft_del1_keys(str)` returns an
 * ARRAY<BIGINT> holding a 64-bit content key for the string itself plus
 * one key per single-codepoint deletion — the candidate keys of the
 * FastSS edit-distance join at k=1 ([[graft.operators.Dedup.editDistancePairs]]).
 *
 * The naive formulation materializes every deletion variant as a string
 * (O(len²) bytes per row: `transform(sequence(...), i -> concat(
 * substring..., substring...))` + a hash per variant). This expression
 * computes all keys in O(len) with rolling polynomial prefix/suffix
 * hashes over codepoints (mod 2⁶⁴, multiplier 1000003):
 * `key(delete i) = prefix[i] * B^(len-1-i) + suffix[i+1]` — the hash of
 * the variant string without ever building it. Two different strings
 * can collide on a key (≈2⁻⁶⁴ per pair); the join's levenshtein verify
 * makes collisions a performance footnote, never a wrong pair — the
 * same contract as the xxhash64 string path it replaces.
 *
 * Deleting either of two equal ADJACENT codepoints yields the same
 * variant, so those duplicate keys are skipped at the source (classic
 * FastSS dedup); the empty string yields the single key 0.
 */
case class Del1Keys(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_del1_keys requires STRING, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_del1_keys"

  private val B = 1000003L

  private def compute(s: UTF8String): GenericArrayData = {
    val cp = s.toString.codePoints().toArray
    val n = cp.length
    // pow(k) = B^k; prefix(i) = hash of cp[0..i); suffix(i) = weighted
    // tail sum with cp[n-1] at B^0 — all mod 2^64 (natural overflow)
    val pow = new Array[Long](n + 1)
    val prefix = new Array[Long](n + 1)
    val suffix = new Array[Long](n + 1)
    pow(0) = 1L
    var i = 0
    while (i < n) {
      pow(i + 1) = pow(i) * B
      prefix(i + 1) = prefix(i) * B + cp(i)
      i += 1
    }
    i = n - 1
    while (i >= 0) {
      suffix(i) = suffix(i + 1) + cp(i) * pow(n - 1 - i)
      i -= 1
    }
    val out = new Array[Long](n + 1)
    out(0) = prefix(n) // the string's own key (0 deletions)
    var m = 1
    i = 0
    while (i < n) {
      if (i == 0 || cp(i) != cp(i - 1)) {
        out(m) = prefix(i) * pow(n - 1 - i) + suffix(i + 1)
        m += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("del1Keys", this, classOf[Del1Keys].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) " +
        s"$expr.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Del1Keys =
    copy(child = newChild)
}
