package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/**
 * Text-analysis operators for LLM training-data pipelines: token counting,
 * quality scoring, marker-based language ID, and document fingerprinting.
 *
 * All four are single narrow projections over the documents table — no
 * shuffle, fully codegen'd, linear scans that scale to 100 TB by partition
 * count alone. Scores are derived exclusively from integer counts so the
 * resulting doubles are bit-identical across engines (oracle-checkable).
 */
object TextAnalysis {

  private def toks: Column = TextFns.tokens("text")

  /** Tokens, characters, and average token length per document. */
  def tokenStats(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("__t", toks)
      .select(
        col(idCol),
        size(col("__t")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        expr("aggregate(__t, CAST(0 AS BIGINT), (acc, w) -> acc + length(w))")
          .as("sum_token_len"))
      // explicit CASE (not engine default) so ANSI Spark and the DuckDB
      // oracle agree on empty documents: 0 tokens -> NULL
      .withColumn("avg_token_len",
        when(col("n_tokens") > 0,
          round(col("sum_token_len") / col("n_tokens").cast("double"), 4)))

  /**
   * BPE-ish token budgeting: subword-ish counts from the GPT-2-style
   * pre-tokenizer regex ([[TextFns.bpePattern]]) next to whitespace word
   * counts, plus their ratio (tokens-per-word — the standard fudge factor
   * for corpus token budgets). Narrow projection, integer counts, exact
   * ratio.
   */
  def bpeTokenStats(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs
      .select(
        col(idCol),
        size(TextFns.bpeTokens("text")).cast("long").as("n_bpe"),
        size(toks).cast("long").as("n_words"))
      .withColumn("tokens_per_word",
        when(col("n_words") > 0,
          col("n_bpe") / col("n_words").cast("double")))

  /** Small fixed stopword list used by the quality heuristic. */
  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  /**
   * Heuristic quality score in [0, 1]: rewards length (saturating at 200
   * tokens), a healthy stopword ratio, and penalizes punctuation soup.
   * Deterministic integer-count arithmetic only.
   */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val stopArr = stopwords.map(s => s"'$s'").mkString("array(", ", ", ")")
    docs
      .withColumn("__t", toks)
      .select(
        col(idCol),
        size(col("__t")).cast("long").as("n_tokens"),
        expr(s"CAST(size(filter(__t, w -> array_contains($stopArr, w))) AS BIGINT)")
          .as("n_stop"),
        regexp_count(col("text"), lit("[.,;:!?]")).cast("long").as("n_punct"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("stop_ratio",
        when(col("n_tokens") > 0,
          round(col("n_stop") / col("n_tokens").cast("double"), 6))
          .otherwise(lit(0.0)))
      .withColumn("quality_score",
        round(
          least(col("n_tokens"), lit(200)).cast("double") / 200d * 0.5
            + col("stop_ratio") * 0.3
            + (lit(1.0) - least(col("n_punct"), lit(50)).cast("double") / 50d) * 0.2,
          6))
  }

  /** Marker words per language for the n-gram-free language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "y", "las"),
    "de" -> Seq("der", "die", "und", "das"))

  /**
   * Language ID by marker-token counting with a deterministic priority
   * tie-break (declared order; "und" = undetermined when no marker hits).
   * A real pipeline swaps in a character-n-gram model — the operator shape
   * (narrow projection, argmax over per-class counts) is identical.
   */
  def langId(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val counted = docs
      .withColumn("__t", toks)
      .select(
        col(idCol) +: langMarkers.map { case (lang, words) =>
          val arr = words.map(w => s"'$w'").mkString("array(", ", ", ")")
          expr(s"CAST(size(filter(__t, w -> array_contains($arr, w))) AS BIGINT)").as(s"c_$lang")
        }: _*)
    // argmax with first-wins tie-break in declared language order
    val langs = langMarkers.map(_._1)
    val best = langs.map(l => col(s"c_$l")).reduce((a, b) => greatest(a, b))
    val pick = langs.foldRight(lit("und"): Column) { (l, rest) =>
      when(col(s"c_$l") === best && best > 0, lit(l)).otherwise(rest)
    }
    counted.withColumn("lang_pred", pick)
      .select(col(idCol) +: langs.map(l => col(s"c_$l")) :+ col("lang_pred"): _*)
  }

  /**
   * Top-k characteristic terms per document by tf/df weighting. The score
   * `tf / df` ranks identically to classic tf-idf `tf * log(N/df)` for any
   * fixed corpus size N, but stays a raw division of two integer counts —
   * bit-identical across engines, no transcendental functions (log results
   * can differ in the last ulp between libm implementations and flip ranks).
   * Ties break on the term string, so top-k is fully deterministic.
   *
   * Scale: two hash-aggregates (doc-term counts, term document-frequency)
   * plus one window on the doc key; the df side is a small dimension
   * (vocabulary-sized) that Catalyst broadcasts.
   */
  def tfidfTopTerms(docs: DataFrame, k: Int = 5,
                    idCol: String = "doc_id"): DataFrame = {
    val tf = docs
      .withColumn("__t", toks)
      .select(col(idCol), explode(col("__t")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("score").desc, col("term").asc)
    tf.join(broadcast(df), "term")
      .withColumn("score", col("tf") / col("df").cast("double"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /**
   * Unicode NFC normalization pass ([[graft.plans.NfcNormalize]]):
   * canonically compose the text column so that equality-based operators
   * (exact dedup, segment dedup, shingles, fingerprints) see one
   * encoding per grapheme — the zeroth stage of any text intake. Emits
   * (idCol, text_nfc, changed). Narrow projection, zero shuffle.
   */
  /**
   * In-corpus bigram language-model scoring — the perplexity-style
   * quality filter (CCNet / Gopher filter corpora by LM perplexity; with
   * no external LM shippable here, the corpus is its own model): MLE
   * bigram probabilities p(w2|w1) = c(w1,w2) / c(w1·) from corpus counts,
   * and each document scores the mean log-probability of its bigrams.
   * Low scores = improbable token sequences (gibberish, boilerplate
   * splice points); high = formulaic text. No smoothing is needed — every
   * scored bigram exists in the corpus by construction, so p > 0.
   *
   * Cross-engine exactness: a double `avg` over log terms is summation-
   * order-dependent, so each term is quantized to integer MICRO-NATS
   * (`floor(ln(p) * 1e6)`) first — integer sums are associative and
   * partition-invariant, and the final division is one deterministic
   * IEEE op (the [[Similarity.embeddingCentroids]] fixed-point trick).
   *
   * Scale: one bigram explode, two vocabulary-bounded hash aggregates
   * (map-side combined), two linear joins keyed on bigram/context
   * strings, one per-doc aggregate. Emits (idCol, n_bigrams, lm_score)
   * for every document; `lm_score = 0.0` when the document has fewer
   * than two tokens.
   */
  def lmScore(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val bg = docs
      .withColumn("__t", toks)
      .select(col(idCol).as("id"), explode(expr(
        """CASE WHEN size(__t) >= 2 THEN
          |  transform(sequence(1, size(__t) - 1),
          |    i -> struct(element_at(__t, i) AS w1,
          |                element_at(__t, i + 1) AS w2))
          |ELSE array() END""".stripMargin)).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val stats = bg
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .withColumn("__lpq",
        floor(log(col("c12").cast("double") / col("c1")) * 1e6).cast("long"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum("__lpq").as("__s"))
    docs.select(col(idCol).as("id"))
      .join(stats, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams") > 0L,
          round(col("__s").cast("double") / col("n_bigrams") / 1e6, 6))
          .otherwise(0.0).as("lm_score"))
  }

  def normalizeUnicode(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      expr(s"graft_nfc($textCol)").as("text_nfc"),
      (expr(s"graft_nfc($textCol)") =!= col(textCol)).as("changed"))

  /**
   * Exact corpus heavy hitters with bounded memory: every token whose
   * occurrence count exceeds `n / (k + 1)` of the `n` total token
   * occurrences, with its exact count and share. Two passes:
   *
   *   1. one aggregate pass builds a [[graft.functions.MgSketch]]
   *      (Misra-Gries, <= k counters per partial buffer — the full
   *      vocabulary never shuffles) plus the total count; the sketch's
   *      guarantee makes its <= k survivors a SUPERSET of the true heavy
   *      hitters regardless of merge order;
   *   2. the candidate tokens (a driver-bounded list, <= k — same
   *      contract as the IVF centroid collect) filter the token stream
   *      BEFORE the exact recount, so the second shuffle carries only
   *      candidate rows.
   *
   * The threshold is applied to the exact recount, so the output is
   * exact and partition-invariant even though the intermediate sketch
   * contents are not — which is what makes a sketch-based plan
   * oracle-checkable against a plain GROUP BY / HAVING.
   *
   * At 100 TB: pass 1 is a map-side-combined aggregate with O(k) state;
   * pass 2 is a broadcast-filtered count of at most k distinct keys. The
   * full-vocabulary `groupBy(token)` this replaces shuffles every
   * distinct token (billions) to answer a k-row question.
   */
  def heavyHitters(docs: DataFrame, k: Int = 32,
                   textCol: String = "text"): DataFrame = {
    val tokens = docs.select(explode(TextFns.tokens(textCol)).as("token"))
    val mg = graft.functions.MgSketch.udaf(k)
    val head = tokens
      .agg(mg(col("token")).as("cand"), count(lit(1)).as("n")).head()
    val cand = head.getAs[Map[String, Long]]("cand").keys.toSeq
    val n = head.getAs[Long]("n")
    if (cand.isEmpty) tokens.filter(lit(false))
      .select(col("token"), lit(0L).as("n_occurrences"),
        lit(0.0).as("share"))
    else tokens.filter(col("token").isin(cand: _*))
      .groupBy("token").agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * (k + 1) > n)
      .select(col("token"), col("n_occurrences"),
        (col("n_occurrences").cast("double") / n).as("share"))
  }

  /**
   * Intra-document repetition score — the fraction of word n-gram
   * occurrences that are repeats of an earlier n-gram in the same document
   * (`1 - distinct/total`), a standard corpus-quality signal for filtering
   * boilerplate and degenerate generations. Narrow codegen'd projection;
   * the ratio is a division of two integer counts (bit-exact).
   */
  def repetitionScore(docs: DataFrame, n: Int = 3,
                      idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("__t", toks)
      .withColumn("__sh", TextFns.shingles("__t", n))
      .select(
        col(idCol),
        size(col("__sh")).cast("long").as("n_shingles"),
        size(array_distinct(col("__sh"))).cast("long").as("n_distinct"))
      .withColumn("rep_ratio",
        when(col("n_shingles") > 0,
          lit(1.0) - col("n_distinct") / col("n_shingles").cast("double"))
          .otherwise(lit(0.0)))

  /**
   * Canonical text cleaning for training corpora: lowercase, mask URLs /
   * emails / digit runs with fixed placeholder tokens, collapse whitespace,
   * trim. One narrow codegen'd projection; patterns restricted to the regex
   * subset Java and RE2 interpret identically (character classes, `+`,
   * alternation — no backrefs or lookarounds).
   */
  def cleanText(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      trim(regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(col(textCol)),
              "https?://[^ \\t\\n]+", "<url>"),
            "[a-z0-9._%+-]+@[a-z0-9.-]+", "<email>"),
          "[0-9]+", "<num>"),
        "[ \\t\\n]+", " ")).as("clean"))

  /**
   * Document fingerprints: a reproducible polynomial rolling hash of the raw
   * text plus a vocabulary fingerprint (hash of the sorted distinct token
   * set) that is invariant to token order — cheap near-dup prefilter.
   */
  def fingerprint(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("__t", toks)
      .withColumn("__vocab", expr("concat_ws(' ', array_sort(array_distinct(__t)))"))
      .select(
        col(idCol),
        TextFns.polyHash("text").as("fp_text"),
        TextFns.polyHash("__vocab").as("fp_vocab"))

  /** PII pattern table (name, regex, replacement tag). Regexes stay in the
   * Java∩RE2 subset — no lookaround or backreferences, and no `\s`/`\b`,
   * whose character classes differ between the two engines — so the DuckDB
   * oracle matches byte for byte. Application ORDER is part of the
   * contract: emails, then URLs, then IPv4s, then phone-like digit runs —
   * each later pattern runs on already-redacted text, so an IP can never
   * be re-matched as a phone number. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", "https?://[^ \\t\\n]+", "<URL>"),
    ("ip", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("phone", "\\+?[0-9][0-9() .-]{6,}[0-9]", "<PHONE>"))

  /**
   * PII redaction — the training-data hygiene step that scrubs contact
   * details before a corpus ships: each [[piiPatterns]] category is
   * counted (on the text as it stood BEFORE that category's replacement)
   * and replaced with its typed tag, in table order. Counts make the
   * redaction auditable (how much PII did this shard contain?).
   *
   * Scale: one narrow codegen'd projection, no shuffle; each intermediate
   * redaction stage is a named column referenced twice (count + next
   * stage), which keeps Catalyst from inlining the regex chain into every
   * downstream expression.
   */
  def piiRedact(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    var df = docs.withColumn("__pii0", col(textCol))
    piiPatterns.zipWithIndex.foreach { case ((name, pat, tag), i) =>
      df = df
        .withColumn(s"n_$name",
          regexp_count(col(s"__pii$i"), lit(pat)).cast("long"))
        .withColumn(s"__pii${i + 1}", regexp_replace(col(s"__pii$i"), pat, tag))
    }
    df.select(
      col(idCol) +:
        piiPatterns.map { case (name, _, _) => col(s"n_$name") } :+
        col(s"__pii${piiPatterns.size}").as("clean"): _*)
  }
}
