package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization: `graft_nfc(str)` canonically composes the
 * input (é as e+combining-acute becomes the single codepoint é, etc.).
 * Spark has no built-in normalizer, and UN-normalized text silently
 * breaks every equality-based operator in the engine — exact dedup,
 * segment dedup, shingle joins, and fingerprints all treat the two
 * encodings of é as different documents. Run this first in an intake.
 *
 * Backed by `java.text.Normalizer` (ICU-conformant NFC per Unicode
 * TR-15, the same form DuckDB's `nfc_normalize` produces — the oracle
 * twin). Fast path: NFC-checking is O(n) and most real text is already
 * NFC, so the common case allocates nothing.
 */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires STRING, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("nfcNorm", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) " +
        s"$expr.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
