package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/**
 * Within-document repeated-window positions:
 * `graft_intra_dup_positions(tokens, w)` = the ascending 1-based token
 * positions covered by any `w`-token window whose exact text already
 * occurred at an EARLIER start within the SAME token array (the first
 * occurrence owns; later occurrences' spans are marked). Feeding the
 * result to `graft_drop_positions` rewrites the document with its
 * internal boilerplate repeats removed — the WITHIN-document half of
 * exact-substring dedup (Lee et al. ACL'22), which the cross-document
 * operator deliberately ignores (its 2-distinct-docs test keeps
 * intra-doc repeats).
 *
 * Decided on ACTUAL window text — a candidate hash hit always verifies
 * token-by-token against the stored first start before marking, so a
 * removal never acts on a hash alone (the destructive-rewrite rule);
 * per-row, no shuffle: this is the rare span operator that is a pure
 * scan projection, because ownership never crosses rows. Live state is
 * 12 bytes per window (open-addressed hash + first-start slots), never
 * the window strings — a 10M-token mega-doc costs ~200 MB transient on
 * its task, not the ~2 GB the string-keyed map would.
 *
 * Null semantics: null for a null token array; null tokens inside the
 * array are treated as empty strings for window identity (the
 * tokenizer never produces them).
 */
case class IntraDupPositions(child: Expression, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_intra_dup_positions requires ARRAY<STRING>, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_intra_dup_positions"

  override def nullSafeEval(input: Any): Any =
    IntraDupPositions.positions(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.IntraDupPositions.positions($c, $w);")

  override protected def withNewChildInternal(
      newChild: Expression): IntraDupPositions = copy(child = newChild)
}

object IntraDupPositions {
  /** One pass: window -> first start; later occurrences mark their
   * covered positions. O(len · w) token compares worst case, and —
   * the round-16 memory fix — O(len) 12-byte slots of state, never the
   * window STRINGS: the r15 version keyed a HashMap on the space-joined
   * window text, ~O(len · w) characters of live heap per document
   * (~2 GB for one 10M-token mega-doc evaluated on one task). Now an
   * open-addressed (window-hash, first-start) table decides candidacy,
   * and a hash hit verifies the ACTUAL tokens at the stored start
   * before marking — text-exactness is untouched (the hash only orders
   * the probe chain; equality is always decided token-by-token), state
   * is 12 bytes per window. Kept public/static so codegen calls it
   * directly. */
  def positions(tokens: ArrayData, w: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Int])
    val toks = new Array[String](n)
    var t = 0
    while (t < n) {
      toks(t) = if (tokens.isNullAt(t)) "" else tokens.getUTF8String(t).toString
      t += 1
    }
    // per-token FNV-1a once; a window's key is an order-sensitive
    // polynomial over its w token hashes, mixed before slotting
    val th = new Array[Long](n)
    t = 0
    while (t < n) {
      var h = 0xcbf29ce484222325L
      val s = toks(t)
      var c = 0
      while (c < s.length) { h = (h ^ s.charAt(c)) * 0x100000001b3L; c += 1 }
      th(t) = h
      t += 1
    }
    val nWin = n - w + 1
    // open addressing at load factor <= 0.7, power-of-two capacity
    var cap = 16
    while (cap.toLong * 7 < nWin.toLong * 10) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val starts = new Array[Int](cap)
    java.util.Arrays.fill(starts, -1)
    val removed = new Array[Boolean](n)
    def sameWin(a: Int, b: Int): Boolean = {
      var k = 0
      while (k < w) {
        if (toks(a + k) != toks(b + k)) return false
        k += 1
      }
      true
    }
    var j = 0
    while (j <= n - w) {
      var h = 1125899906842597L
      var q = j
      while (q < j + w) { h = h * 0x9e3779b97f4a7c15L + th(q); q += 1 }
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      var slot = (h & mask).toInt
      var placed = false
      while (!placed) {
        val s0 = starts(slot)
        if (s0 < 0) { keys(slot) = h; starts(slot) = j; placed = true }
        else if (keys(slot) == h && sameWin(s0, j)) {
          // verified repeat: the first occurrence (s0 < j) owns
          var p = j
          while (p < j + w) { removed(p) = true; p += 1 }
          placed = true
        } else slot = (slot + 1) & mask // occupied by a different window
      }
      j += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var p = 0
    while (p < n) { if (removed(p)) out += (p + 1); p += 1 }
    new GenericArrayData(out.toArray)
  }
}
