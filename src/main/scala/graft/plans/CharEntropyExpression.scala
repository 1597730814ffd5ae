package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Character-distribution Shannon entropy in micro-bits:
 * `graft_char_entropy(str)` = Σ over codepoint classes c of
 * floor((1e6 · (n_c / n)) · (ln(n / n_c) / ln 2)) as BIGINT — the
 * classic cheap quality signal for web-scale curation (low entropy
 * flags boilerplate / repeated-char junk, near-max entropy flags
 * random-string noise; both tails get dropped by quality gates in
 * published pipelines such as Gopher's and RefinedWeb's rule sets).
 *
 * Determinism contract (the dsir_weights precedent): the ONLY float
 * work is one ln-quotient per DISTINCT codepoint, micro-floored ONCE;
 * the per-document result is a sum of BIGINTs, which is associative —
 * so the value is partition-invariant and the DuckDB oracle twin
 * reproduces it term-for-term with the same expression shape
 * (`(1000000 * (cnt/n)) * (ln(n/cnt) / ln(2))`, same association).
 *
 * Codepoint classes, not UTF-16 units: surrogate pairs count as one
 * character, matching DuckDB's codepoint `length()` semantics.
 *
 * Scale: per-row O(len) with a small counting map, no shuffle, no
 * explode — a 100 TB corpus gets its entropy column inside the scan
 * projection, where the explode-and-groupBy formulation would shuffle
 * one row per character.
 */
case class CharEntropyMicro(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_entropy requires STRING, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    java.lang.Long.valueOf(CharEntropyMicro.entropyMicro(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CharEntropyMicro.entropyMicro($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyMicro =
    copy(child = newChild)
}

object CharEntropyMicro {
  private val Ln2 = math.log(2.0)

  /** Σ_c floor((1e6 · n_c/n) · (ln(n/n_c)/ln 2)) over codepoint counts;
   * empty string → 0. Kept public/static so codegen calls it directly. */
  def entropyMicro(s: String): Long = {
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1L
    }
    if (n == 0L) return 0L
    var acc = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val cnt = it.next()
      acc += math.floor(
        (1e6 * (cnt.toDouble / n)) * (math.log(n.toDouble / cnt) / Ln2)
      ).toLong
    }
    acc
  }
}
