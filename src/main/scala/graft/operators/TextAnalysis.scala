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
   * Token-concentration score by Simpson's index, in exact integer
   * permille: `1000·Σ nᵢ(nᵢ−1) DIV (N(N−1))` over per-token counts nᵢ —
   * the probability two tokens drawn without replacement are EQUAL.
   * Where [[repetitionScore]]'s distinct/total ratio treats "one token
   * repeated everywhere" and "every token appearing twice" alike,
   * Simpson weights concentration quadratically, separating the
   * boilerplate/keyword-stuffing failure mode the quality battery
   * actually hunts. Emits (idCol, n_tokens, simpson_permille); docs
   * with < 2 tokens score 0. Integer DIV only — engine- and
   * partition-invariant.
   *
   * Scale: one narrow projection — per-document token counts come from
   * a `aggregate`-free sort + run-length pass entirely inside the
   * document's own token array (no explode, no shuffle; the array is
   * sorted per row and runs are counted with a single HOF fold over
   * positions, whose per-step work is an integer compare — cheap even
   * interpreted).
   */
  def simpsonScore(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs
      .withColumn("__t", TextFns.tokens(textCol))
      .withColumn("__s", sort_array(col("__t")))
      .select(
        col(idCol),
        size(col("__t")).cast("long").as("n_tokens"),
        // Σ n_i(n_i-1) = number of ordered equal pairs = for each
        // position i > 0 in the sorted array, 2 * (run length so far - 1)
        // ... computed instead as: for each adjacent equal pair the run
        // extends, add 2 * (distance back to run start). Equivalent and
        // simpler: count ordered equal pairs directly via a fold that
        // carries (run_start_index, acc).
        expr("""
          aggregate(
            IF(size(__s) > 1, sequence(1, size(__s) - 1),
               CAST(array() AS ARRAY<INT>)),
            named_struct('run', 0, 'acc', 0L),
            (st, i) -> IF(__s[i] = __s[i - 1],
                          named_struct('run', st.run,
                                       'acc', st.acc + 2L * (i - st.run)),
                          named_struct('run', i, 'acc', st.acc)),
            st -> st.acc)""").as("__pairs"))
      .withColumn("simpson_permille",
        when(col("n_tokens") > 1,
          expr("__pairs * 1000 DIV (n_tokens * (n_tokens - 1))"))
          .otherwise(lit(0L)))
      .select(col(idCol), col("n_tokens"), col("simpson_permille"))

  /**
   * Zipf rank-frequency audit: the corpus's top-`k` tokens with their
   * ranks and the integer-permille ratio `n·rank·1000 DIV n_top` —
   * under Zipf's law `n ≈ n_top / rank`, so a healthy natural-language
   * corpus holds the ratio near 1000 across ranks, while boilerplate
   * floods (one template token dominating), language mixing, and
   * markup-heavy scrapes bend it far off — the corpus-level sibling of
   * the per-value [[graft.operators.Relational.benfordAudit]] screen.
   * Emits (rank, term, n, zipf_ratio_permille), rank 1 = most frequent,
   * ties broken by term. Pure integer arithmetic — no log-log fit, no
   * float slope.
   *
   * Scale: one explode + hash aggregate (map-side combined) and a
   * TakeOrdered top-k; the ranking window only ever sees k rows.
   */
  def zipfAudit(docs: DataFrame, k: Int = 20,
                textCol: String = "text"): DataFrame = {
    val counts = docs
      .withColumn("__t", toks)
      .select(explode(col("__t")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("term").asc)
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__top", max(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("zipf_ratio_permille",
        expr("n * rank * 1000 DIV __top"))
      .select("rank", "term", "n", "zipf_ratio_permille")
  }

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

  /**
   * Gopher-style document quality rules (Rae et al., arXiv:2112.11446,
   * App. A1.1 — the MassiveText filter battery): word-count bounds, mean
   * word length in [3, 10], symbol-to-word ratio (`#`/ellipsis soup),
   * fraction of words containing a letter, and minimum distinct-stopword
   * presence. Emits the raw counts, one boolean per rule, and the
   * conjunction `pass` — keeping per-rule flags makes the filter auditable
   * (which rule kills how much of a crawl?), which is how these batteries
   * are tuned in practice.
   *
   * Every ratio rule is evaluated by integer cross-multiplication
   * (`sum_len >= 3*n` rather than `sum_len/n >= 3.0`), so the booleans are
   * bit-identical across engines and no float ever forms.
   *
   * Scale: one narrow codegen'd projection, no shuffle — linear to 100 TB
   * by partition count alone.
   */
  def gopherRules(docs: DataFrame, idCol: String = "doc_id",
                  minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val stopArr = stopwords.map(s => s"'$s'").mkString("array(", ", ", ")")
    docs
      .withColumn("__t", toks)
      .select(
        col(idCol),
        size(col("__t")).cast("long").as("n_words"),
        expr("aggregate(__t, CAST(0 AS BIGINT), (acc, w) -> acc + length(w))")
          .as("sum_word_len"),
        expr("CAST(size(filter(__t, w -> w rlike '[a-zA-Z]')) AS BIGINT)")
          .as("n_alpha_words"),
        expr(s"CAST(size(array_intersect(__t, $stopArr)) AS BIGINT)")
          .as("n_stop_distinct"),
        regexp_count(col("text"), lit("#|\\.{3}")).cast("long").as("n_symbols"))
      .withColumn("rule_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("rule_mean_word_len",
        col("n_words") > 0 &&
          col("sum_word_len") >= col("n_words") * 3 &&
          col("sum_word_len") <= col("n_words") * 10)
      .withColumn("rule_symbol_ratio",
        col("n_words") > 0 && col("n_symbols") * 10 <= col("n_words"))
      .withColumn("rule_alpha_words",
        col("n_words") > 0 && col("n_alpha_words") * 5 >= col("n_words") * 4)
      .withColumn("rule_stopwords", col("n_stop_distinct") >= 2)
      .withColumn("pass",
        col("rule_word_count") && col("rule_mean_word_len") &&
          col("rule_symbol_ratio") && col("rule_alpha_words") &&
          col("rule_stopwords"))
  }

  /**
   * First-merge-step statistic of byte-pair-encoding tokenizer training
   * (Sennrich et al., arXiv:1508.07909): the corpus-wide count of every
   * adjacent character pair inside words, ranked. The top pair IS the
   * first merge a BPE trainer would learn; re-running after applying each
   * winning merge yields the merge table — this operator is that training
   * loop's inner aggregation, which at corpus scale dominates tokenizer
   * training cost.
   *
   * Scale: explodes to one row per in-word character pair — linear in
   * corpus characters — then a single hash aggregate with map-side
   * combine and a TakeOrderedAndProject top-k. No window, no unbounded
   * per-group state (pair keys are 2 characters; the key space is tiny).
   * Ties rank lexicographically, so the top-k is deterministic.
   */
  def bpeMerges(docs: DataFrame, k: Int = 20): DataFrame =
    docs
      .withColumn("__t", toks)
      .select(explode(col("__t")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(k)

  /**
   * Capped inverted index: per term, its document frequency, total term
   * frequency, and a posting list truncated to the `postingCap` smallest
   * doc ids (ascending, comma-joined). The cap is enforced INSIDE the
   * aggregation — [[graft.functions.MinKLongs]] keeps at most `postingCap`
   * longs of state per partial buffer and merge — so a stopword term never
   * materializes its full posting list anywhere, which is the failure mode
   * of `collect_set(doc_id)` at corpus scale. `minDf` prunes the hapax
   * tail (most of any corpus vocabulary) from the output.
   *
   * One explode + one hash aggregate; the distinct df count rides the same
   * aggregate via Spark's distinct-aggregate expansion.
   */
  def invertedIndex(docs: DataFrame, minDf: Int = 5, postingCap: Int = 10,
                    idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("__t", toks)
      .select(col(idCol).as("__id"), explode(col("__t")).as("term"))
      .groupBy("term")
      .agg(
        count_distinct(col("__id")).as("df"),
        count(lit(1)).as("tf_total"),
        graft.functions.MinKLongs.udaf(postingCap)(col("__id")).as("__post"))
      .filter(col("df") >= minDf)
      .select(col("term"), col("df"), col("tf_total"),
        expr("array_join(transform(__post, x -> CAST(x AS STRING)), ',')")
          .as("postings"))
      .orderBy("term")

  /**
   * Hashing-trick document embedding (Weinberger et al., "Feature
   * Hashing for Large Scale Multitask Learning", ICML 2009): each token
   * lands in `dim` buckets by reproducible polynomial hash, with a
   * second hash bit choosing ±1 so bucket collisions cancel in
   * expectation. The result is a fixed-width integer vector per document
   * — a model-free featurization that lets the embedding-side operators
   * (k-means, PQ, cosine top-k) run on text-only corpora. Components are
   * exact integer sums, emitted comma-joined, so the vector is
   * bit-identical across engines and partitionings.
   *
   * Scale: explode + one (doc, bucket) hash aggregate with map-side
   * combine + one per-doc reassembly aggregate — the same two-aggregate
   * shape as [[Similarity.embeddingCentroids]]; nothing wider than
   * (id, bucket, count) ever shuffles.
   */
  def hashEmbed(docs: DataFrame, dim: Int = 64,
                idCol: String = "doc_id"): DataFrame = {
    require(dim >= 2, "dim >= 2")
    val h = s"graft_poly_hash(tok, 31, ${TextFns.HashMod})"
    val signed = docs
      .withColumn("__t", toks)
      .select(col(idCol).as("__id"), explode(col("__t")).as("tok"))
      .select(col("__id"), expr(s"CAST($h % $dim AS INT)").as("__b"),
        expr(s"CASE WHEN ($h div $dim) % 2 = 0 THEN 1L ELSE -1L END")
          .as("__s"))
      .groupBy("__id", "__b").agg(sum(col("__s")).as("__v"))
      .groupBy("__id")
      .agg(expr("map_from_entries(collect_list(struct(__b, __v)))").as("__m"))
      .select(col("__id"),
        expr(s"""array_join(transform(sequence(0, ${dim - 1}),
                 |  b -> CAST(coalesce(element_at(__m, b), 0L) AS STRING)),
                 |  ',')""".stripMargin).as("vec"))
    docs.select(col(idCol).as("__id"))
      .join(signed, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("vec"),
          lit(Seq.fill(dim)("0").mkString(","))).as("vec"))
  }

  /** Default keyword→(topic, weight) rule table for [[topicClassify]]. */
  val topicRules: Seq[(String, String, Int)] = Seq(
    ("join", "joins", 3), ("merge", "joins", 2), ("hash", "joins", 1),
    ("scan", "storage", 3), ("table", "storage", 2),
    ("stream", "streaming", 3), ("batch", "streaming", 2),
    ("window", "streaming", 1),
    ("agg", "aggregation", 3), ("sort", "aggregation", 2),
    ("group", "aggregation", 2),
    ("vector", "vectorized", 3), ("column", "vectorized", 2))

  /**
   * Rule-table topic classification — the cheap taxonomy tagger used to
   * slice corpora by domain before mixing: each (keyword, topic, weight)
   * rule votes `weight` per occurrence of `keyword`; a document's topic is
   * the highest-scoring topic, ties broken lexicographically, `unknown`
   * when no rule fires. The rule table is DATA, not code — production
   * taxonomies run to thousands of keywords, so the rules arrive as a
   * DataFrame and are broadcast-joined against the exploded token stream
   * (never collected, never compiled into the plan).
   *
   * Scale: explode + broadcast hash join + one hash aggregate per
   * (doc, topic), then a per-document window over at most |topics| rows
   * per document. Corpus text never shuffles — only (id, topic, score).
   */
  def topicClassify(docs: DataFrame,
                    rules: Seq[(String, String, Int)] = topicRules,
                    idCol: String = "doc_id"): DataFrame = {
    import docs.sparkSession.implicits._
    val ruleDf = rules.toDF("term", "topic", "weight")
    val scores = docs
      .withColumn("__t", toks)
      .select(col(idCol).as("__id"), explode(col("__t")).as("term"))
      .join(broadcast(ruleDf), "term")
      .groupBy(col("__id"), col("topic"))
      .agg(sum(col("weight").cast("long")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__id").orderBy(col("score").desc, col("topic").asc)
    val best = scores
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id"), col("topic"), col("score"))
    docs.select(col(idCol).as("__id"))
      .join(best, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("topic"), lit("unknown")).as("topic_pred"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /**
   * Hybrid retrieval: BM25 (lexical) and hash-embedding cosine
   * (distributional) candidate lists fused by reciprocal-rank fusion —
   * the standard two-tower RAG retrieval stack, composed entirely from
   * this library's own operators ([[bm25TopK]], [[hashEmbed]],
   * [[Similarity.bruteForceTopK]]). Each side contributes its top
   * `kEach`; RRF runs in INTEGER micro-units
   * (`1 000 000 div (60 + rank)` per side, absent side contributes 0 —
   * the Cormack et al. k=60 constant), so fusion is engine-exact with
   * no float anywhere. Emits (query_id, doc_id, bm_rank, cos_rank,
   * rrf_micro, rank) with absent-side ranks reported as 0.
   *
   * Scale: the BM25 side is [[bm25TopK]]'s three linear passes; the
   * embedding side is one [[hashEmbed]] pass plus a broadcast-NLJ
   * (swap in the IVF/LSH path for corpora where brute-force cosine is
   * too wide); the fusion itself joins two ≤ queries×kEach frames —
   * trivial. Zero vectors (token-less docs) are excluded from the
   * cosine side rather than crashing the norm division.
   */
  def hybridTopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
                 kEach: Int = 20, dim: Int = 64,
                 idCol: String = "doc_id"): DataFrame = {
    val bm = bm25TopK(docs, queries, k = kEach)
      .select(col("query_id"), col("doc_id"), col("rank").as("bm_rank"))
    def embed(d: DataFrame) = hashEmbed(d, dim, idCol)
      .select(col(idCol).as("vec_id"),
        expr("transform(split(vec, ','), x -> CAST(x AS FLOAT))")
          .as("embedding"))
      .filter(expr("exists(embedding, x -> x != 0F)"))
    // widen the embedded corpus before the cosine BNLJ: the per-pair
    // 64-dim dots + per-partition top-k otherwise fuse onto hashEmbed's
    // byte-coalesced aggregate (measured: the whole cosine side on 1 of
    // 32 cores, ~2.4 s of task time at sf0.1). Factor 2 because a 1x
    // vec_id pin matches the inherited layout and is elided
    // (Par.widenBy scaladoc); the frame is dim-bounded derived data,
    // never corpus text.
    val vecs = Par.widenBy(embed(docs), 2, col("vec_id"))
    // the hashing-trick embedding is per-document (no corpus statistics),
    // so the query side embeds just the query docs instead of referencing
    // the corpus frame — a second reference would replan the whole corpus
    // hashEmbed pass (measured +1.2 s at sf0.1)
    val qv = embed(queries)
    val cos = Similarity.bruteForceTopK(vecs, qv, k = kEach)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("cos_rank"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
    bm.join(cos, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("bm_rank"), lit(0L)).as("bm_rank"),
        coalesce(col("cos_rank"), lit(0L)).as("cos_rank"))
      .withColumn("rrf_micro",
        when(col("bm_rank") > 0, expr("1000000 DIV (60 + bm_rank)"))
          .otherwise(lit(0L)) +
        when(col("cos_rank") > 0, expr("1000000 DIV (60 + cos_rank)"))
          .otherwise(lit(0L)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "bm_rank", "cos_rank", "rrf_micro",
        "rank")
  }

  /**
   * Tokenizer vocabulary coverage (OOV-rate analysis): build the corpus
   * top-`vocabSize` term vocabulary (by total frequency, ties by term)
   * and measure every document's out-of-vocabulary token fraction — the
   * sizing study run before freezing a tokenizer, and the per-document
   * signal for routing unusual text to byte-fallback handling. Emits
   * (idCol, n_tokens, n_oov, oov_permille) for every document
   * (token-less documents report zeros); the rate is integer permille
   * (n_oov·1000 div n_tokens) so the row is engine-exact.
   *
   * Scale: one vocabulary-bounded term-count aggregate feeding a
   * TakeOrdered top-V (V rows broadcast back), one exploded-token pass
   * with the broadcast membership join and a per-document count
   * aggregate, and a narrow id projection to restore empty documents.
   * Corpus text never shuffles — only (id, counts).
   */
  def oovRate(docs: DataFrame, vocabSize: Int = 256,
              idCol: String = "doc_id"): DataFrame = {
    val exploded = docs
      .withColumn("__t", toks)
      .select(col(idCol).as("__id"), explode(col("__t")).as("term"))
    val vocab = exploded.groupBy("term")
      .agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("term").asc)
      .limit(vocabSize)
      .select(col("term"), lit(1L).as("__v"))
    val perDoc = exploded
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__v").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col(idCol).as("__id"))
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_permille",
        when(col("n_tokens") > 0,
          expr("CAST(n_oov * 1000 DIV n_tokens AS BIGINT)"))
          .otherwise(lit(0L)))
  }

  /**
   * BM25 top-k retrieval (Robertson/Sparck Jones probabilistic ranking,
   * k1 = 1.2, b = 0.75): score every corpus document against each query's
   * distinct terms and keep the k best per query — the retrieval half of
   * a RAG/dedup-screening stack, sitting on the same corpus statistics as
   * [[invertedIndex]]. Emits (query_id, doc_id, n_hit_terms, score_micro,
   * rank); a query from inside the corpus never retrieves itself.
   *
   * Exactness without a log: the classic idf `ln((N-df+0.5)/(df+0.5))`
   * is replaced by the odds ratio it wraps — `(N-df+0.5)/(df+0.5)` — a
   * monotone transform, so rankings agree where idf values are
   * well-separated and every arithmetic step stays a fixed tree of IEEE
   * double ops both engines evaluate identically. Each per-term
   * contribution is floored to integer MICRO-units and summed as BIGINT
   * (associative ⇒ partition- and engine-invariant; the
   * [[Similarity.embeddingCentroids]] fixed-point discipline).
   *
   * Scale: exactly three linear corpus passes, each with ONE consumer —
   * (1) a distinct-explode df pass filtered to the query vocabulary,
   * feeding the materialized per-query term selection; (2) the tf
   * explode pass, filtered to the SELECTED terms before its aggregate
   * and carrying document length through it (no corpus-wide dl join);
   * (3) a narrow no-explode projection for the 1-row corpus stats. The
   * naive shape (tf → dl/df/corpus all by re-aggregation, every frame
   * referenced twice) plans SEVEN-plus corpus scans, because each
   * consumer's column pruning makes the shared subtrees non-identical
   * and defeats ReuseExchange — measured 4.5× slower at sf0.1.
   */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
               maxQueryTerms: Int = 16,
               idCol: String = "doc_id"): DataFrame = {
    val qterms = queries
      .withColumn("__t", toks)
      .select(col(idCol).as("query_id"), explode(col("__t")).as("term"))
      .distinct()
    // Document frequency for the query vocabulary: one distinct-explode
    // corpus pass, term-filtered by the (broadcast) query vocabulary
    // BEFORE the aggregate, so state is query-vocab-bounded.
    val dfq = docs
      .withColumn("__t", toks)
      .select(explode(array_distinct(col("__t"))).as("term"))
      .join(broadcast(qterms.select("term").distinct()), "term")
      .groupBy("term").agg(count(lit(1)).as("df"))
    // More-like-this term selection: keep each query's `maxQueryTerms`
    // RAREST terms (df asc, term asc). A whole document as a query drags
    // in stop-word-grade terms whose postings span the corpus — the
    // scoring join would fan out to |queries| x df(term) rows for every
    // common term. Rare terms carry essentially all of the BM25 mass
    // (idf decays ~1/df), so the cap changes scores marginally and the
    // join volume by orders of magnitude. df RIDES ON the selection so
    // the scoring join needs no separate df branch. The frame is
    // materialized eagerly (bounded: queries x maxQueryTerms rows — the
    // query set is broadcast-small by this operator's contract, exactly
    // like bruteForceTopK's), because its three downstream references
    // would otherwise each re-run the df corpus pass: Catalyst prunes
    // each reference differently, the subplans stop being identical, and
    // ReuseExchange cannot dedupe them — measured as 3 extra corpus
    // scans at sf0.1.
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("df").asc, col("term").asc)
    val qsel = qterms.join(dfq, "term")
      .withColumn("__tr", row_number().over(wq))
      .filter(col("__tr") <= maxQueryTerms)
      .select("query_id", "term", "df")
      .localCheckpoint(true)
    // ONE tf explode pass over the corpus, filtered to the SELECTED
    // terms before the aggregate and carrying document length through it
    // (a separate dl frame would shuffle (id, len) for every document to
    // meet tf in a corpus-wide join).
    val perDoc = docs
      .withColumn("__t", toks)
      .select(col(idCol).as("doc_id"), explode(col("__t")).as("term"))
      .join(broadcast(qsel.select("term").distinct()
        .withColumn("__q", lit(1))), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("dl"),
        collect_list(when(col("__q").isNotNull, col("term"))).as("__qtoks"))
    val tf = perDoc
      .select(col("doc_id"), col("dl"), explode(col("__qtoks")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    // corpus-level stats need no explode: a narrow token-count projection
    // feeding a 1-row aggregate
    val corpus = docs
      .withColumn("__t", toks)
      .select(size(col("__t")).cast("long").as("__dl"))
      .filter(col("__dl") > 0)
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("__dl").cast("long").as("total_dl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    // tf NOT widened (Par.widen scaladoc): steady-state runs measured
    // ~0.5 s faster with a doc_id-pinned scoring stage, but under the
    // interleaved bench protocol the extra exchange + wide aggregate
    // measured ~1 s SLOWER than the fused byte-coalesced plan
    // (trimmed medians 2.89 baseline vs 3.85 pinned) — reverted.
    tf.join(broadcast(qsel), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .crossJoin(broadcast(corpus))
      // one fixed expression tree of IEEE double ops — the oracle SQL
      // repeats this text verbatim so both engines floor the same double
      .withColumn("contrib_micro", expr(
        """CAST(floor(
          |  ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
          |  * ((CAST(tf AS DOUBLE) * 2.2)
          |     / (CAST(tf AS DOUBLE)
          |        + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
          |                                / (CAST(total_dl AS DOUBLE) / n_docs)))))
          |  * 1000000) AS BIGINT)""".stripMargin))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_hit_terms"), sum("contrib_micro").as("score_micro"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "n_hit_terms", "score_micro", "rank")
  }

  /**
   * Per-source encoding health audit — the bookkeeping a web-scale
   * ingest runs before any text transform: how much of each source is
   * non-ASCII (expected for non-English sources; a SPIKE in an English
   * one means an encoding break upstream), how many U+FFFD replacement
   * characters survived transcoding (each one is a destroyed byte
   * sequence), and how many C0 control characters (excluding
   * tab/newline/CR) leaked through. Emits one row per source:
   * (srcCol, n_docs, n_chars, non_ascii_docs, non_ascii_chars,
   * replacement_chars, control_chars, ascii_permille) — counts exact
   * BIGINT, permille floor division.
   *
   * Counting is `length(text) − length(regexp_replace(text, class,
   * ''))` — one narrow codegen projection, no explode; BMP-accurate
   * (an astral code point counts once in `length` but twice as UTF-16
   * units in Java regex classes — quantify astral-heavy corpora with a
   * dedicated pass).
   *
   * Scale: one projection + one hash-aggregate on the source key,
   * map-side combined; nothing corpus-sized shuffles.
   */
  def encodingAudit(docs: DataFrame, srcCol: String = "source",
                    textCol: String = "text"): DataFrame = {
    def removed(pattern: String) =
      length(col(textCol)) -
        length(regexp_replace(col(textCol), pattern, ""))
    docs
      .select(col(srcCol),
        length(col(textCol)).cast("long").as("__len"),
        removed("[^\\x00-\\x7F]").cast("long").as("__na"),
        removed("�").cast("long").as("__re"),
        removed("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]").cast("long")
          .as("__ct"))
      .groupBy(srcCol)
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("__len")), lit(0L)).as("n_chars"),
        coalesce(sum(when(col("__na") > 0, 1L).otherwise(0L)), lit(0L))
          .as("non_ascii_docs"),
        coalesce(sum(col("__na")), lit(0L)).as("non_ascii_chars"),
        coalesce(sum(col("__re")), lit(0L)).as("replacement_chars"),
        coalesce(sum(col("__ct")), lit(0L)).as("control_chars"))
      .withColumn("ascii_permille",
        when(col("n_chars") > 0,
          expr("(n_chars - non_ascii_chars) * 1000 DIV n_chars")))
      .select(col(srcCol), col("n_docs"), col("n_chars"),
        col("non_ascii_docs"), col("non_ascii_chars"),
        col("replacement_chars"), col("control_chars"),
        col("ascii_permille"))
  }

  /**
   * Character-distribution Shannon entropy per document, in micro-bits
   * — the cheap quality tail-filter (low entropy = repeated-char /
   * boilerplate junk, near-max = random-string noise; published rule
   * sets gate on both tails). Emits (idCol, n_cps, entropy_micro).
   *
   * Backed by the native codegen'd [[graft.plans.CharEntropyMicro]]
   * expression: the whole signal is computed inside the scan
   * projection, no explode and no shuffle — at 100 TB the alternative
   * explode-per-character formulation shuffles one row per character
   * of the corpus. Determinism per the dsir_weights precedent: one
   * micro-floored ln term per distinct codepoint, BIGINT sums.
   */
  def charEntropy(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      length(col(textCol)).cast("long").as("n_cps"),
      expr(s"graft_char_entropy($textCol)").as("entropy_micro"))
}
