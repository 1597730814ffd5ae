package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text/hash column builders for the LLM-pipeline operators (dedup, text
 * analysis, fingerprinting). Everything here is a Catalyst expression built
 * from codegen'd built-ins (higher-order array functions) — no UDFs, so
 * whole-stage codegen and column pruning stay intact.
 *
 * The polynomial hash is deliberately *arithmetic-reproducible*: the DuckDB
 * correctness oracle computes the identical value with `list_reduce`, so
 * sketch-based operators remain hash-checkable end-to-end.
 */
object TextFns {

  /** Modulus for reproducible polynomial hashing: a prime < 2^30 so that
   * `acc * 31 + code` never exceeds 2^35 (no BIGINT overflow in either
   * engine, ANSI-safe). */
  val HashMod: Long = 1000000007L

  /** Whitespace tokenizer: trim, split on whitespace runs, drop empty
   * tokens — `split(trim(''), '\s+')` yields `[""]`, so without the filter
   * an empty/whitespace-only document would count one phantom token. */
  def tokens(textCol: String): Column =
    expr(s"filter(split(trim($textCol), '\\\\s+'), w -> w != '')")

  /**
   * Reproducible polynomial rolling hash of a string:
   * `h = fold(codepoints, 0, (acc, c) -> (acc*31 + c) % 1000000007)`.
   * Used for document fingerprinting; DuckDB oracle computes the same fold.
   * Resolves to the native codegen'd [[graft.plans.PolyHash]] expression —
   * the session must register [[graft.plans.GraftExtensions]].
   */
  def polyHash(textExpr: String): Column =
    expr(s"graft_poly_hash($textExpr, 31, ${HashMod})")

  /** BPE-ish pre-tokenization pattern (GPT-2-style categories without
   * lookarounds, so Java and RE2 agree): common contractions, letter runs,
   * 1-3 digit groups, punctuation runs. Whitespace separates and is not
   * emitted. */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]{1,3}|[^a-zA-Z0-9'\\s]+"

  /** BPE-ish tokens of a text expression: all matches of [[bpePattern]] —
   * the pre-tokenizer splits a byte-pair encoder runs before merges, which
   * is what "token count" approximates in corpus budgeting. */
  def bpeTokens(textCol: String): Column =
    regexp_extract_all(col(textCol), lit(bpePattern), lit(0))

  /**
   * Word n-gram shingles from a token-array expression: overlapping windows
   * of `n` tokens joined with single spaces. Empty array when the document
   * has fewer than `n` tokens.
   */
  def shinglesSql(wordsExpr: String, n: Int = 3): String = {
    val parts = (0 until n).map(j => s"element_at($wordsExpr, i + $j)").mkString(", ")
    s"""CASE WHEN size($wordsExpr) >= $n THEN
       |  transform(sequence(1, size($wordsExpr) - ${n - 1}),
       |            i -> concat_ws(' ', $parts))
       |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin
  }

  def shingles(wordsExpr: String, n: Int = 3): Column =
    expr(shinglesSql(wordsExpr, n))

  /** Non-negative 64-bit shingle hash reduced into the reproducible-hash
   * field: `pmod(xxhash64(s), HashMod)`. xxhash64 keeps the shuffle key
   * 8 bytes instead of a full shingle string at 100 TB scale. */
  def shingleHash(shingleCol: Column): Column =
    pmod(xxhash64(shingleCol), lit(HashMod))

  /** SQL fragment: polynomial hash of string variable `v` — for use inside
   * higher-order-function lambdas where a Column cannot reach. Resolves to
   * the native [[graft.plans.PolyHash]] (registered SQL functions are
   * callable from lambda bodies; bare expressions are not). */
  def polyHashFragment(v: String, mult: Long, mod: Long): String =
    s"graft_poly_hash($v, $mult, $mod)"

  /** SQL fragment: 63-bit reproducible token hash from three independent
   * polynomial folds — bits 0-29 from (31, 1e9+7), 30-59 from
   * (131, 998244353), 60-62 from (137, 1000003). Bit 63 is always 0. The
   * DuckDB oracle computes the identical value, so SimHash signatures are
   * hash-checkable end-to-end (xxhash64 is not available in DuckDB).
   * Precondition: `v` non-empty (guaranteed by [[tokens]]). */
  def token63Fragment(v: String): String =
    s"(${polyHashFragment(v, 31, 1000000007L)} " +
    s"+ ${polyHashFragment(v, 131, 998244353L)} * 1073741824 " +
    s"+ (${polyHashFragment(v, 137, 1000003L)} % 8) * 1152921504606846976)"

  /** Reproducible uniform key hash: the polynomial hash through a
   * universal-hash mix `(a·h + b) mod p`. The mix matters for SHORT keys
   * (numeric ids): their raw polynomial hash never wraps the modulus and
   * concentrates near zero, which breaks any k-minimum-values density
   * estimate; one multiply-mod spreads them uniformly on `[0, HashMod)`
   * while staying closed-form for the DuckDB twin. */
  def mixedKeyHash(keyExpr: String): Column =
    expr(s"(1103515245L * " +
      s"graft_poly_hash(CAST($keyExpr AS STRING), 31, $HashMod)" +
      s" + 12345L) % $HashMod")

  /** MinHash permutation parameters: deterministic LCG-derived (a, b) pairs,
   * a != 0, reproducible across runs and engines. */
  def minhashParams(numHashes: Int): IndexedSeq[(Long, Long)] =
    (0 until numHashes).map { i =>
      val a = (1103515245L * (i + 1) + 12345L) % HashMod
      val b = (69069L * (i + 1) + 362437L) % HashMod
      (if (a == 0) 1L else a, b)
    }
}
