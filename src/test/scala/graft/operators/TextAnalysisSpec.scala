package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("lmScore: MLE bigram means, formulaic beats gibberish, short doc zero") {
    val docs = Seq(
      (1L, "a b a b a b"),   // bigrams ab x3, ba x2: highly predictable
      (2L, "a b c"),         // ab (p=3/4... counted over corpus), bc unique
      (3L, "x"))             // one token: no bigrams
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.lmScore(docs).orderBy("doc_id"))
    // corpus counts: c(a,b)=4, c(b,a)=2, c(b,c)=1; c(a·)=4, c(b·)=3
    // doc1 terms: 3*ln(4/4) + 2*ln(2/3); doc2: ln(4/4) + ln(1/3)
    def q(x: Double) = math.floor(x * 1e6)
    val d1 = BigDecimal((3 * q(math.log(1.0)) + 2 * q(math.log(2.0 / 3))) / 5 / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d2 = BigDecimal((q(math.log(1.0)) + q(math.log(1.0 / 3))) / 2 / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(Seq(1L, 5L, d1), Seq(2L, 2L, d2), Seq(3L, 0L, 0.0)))
    // the repetitive doc is more probable under the corpus LM
    assert(d1 > d2)
  }

  test("gopherRules: each rule trips on its own pathology") {
    val good = (1 to 60).map(i => s"the of word$i").mkString(" ") // 180 words, stopwords, alpha
    val docs = Seq(
      (1L, good),                                   // passes everything
      (2L, "too short the of"),                     // word-count rule only
      (3L, (1 to 60).map(_ => "a of the").mkString(" ")), // mean len < 3
      (4L, (1 to 60).map(i => s"### the of word$i ...").mkString(" ")), // symbol soup
      (5L, (1 to 60).map(i => s"123 456 the of xword$i").mkString(" ")), // digit words < 80% alpha
      (6L, (1 to 60).map(i => s"word$i blah$i bleh$i").mkString(" "))) // no stopwords
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs).orderBy("doc_id")
      .select("doc_id", "rule_word_count", "rule_mean_word_len",
        "rule_symbol_ratio", "rule_alpha_words", "rule_stopwords", "pass")
    assert(rows(out) == Seq(
      Seq(1L, true, true, true, true, true, true),
      Seq(2L, false, true, true, true, true, false),
      Seq(3L, true, false, true, true, true, false),
      Seq(4L, true, true, false, false, true, false),
      Seq(5L, true, true, true, false, true, false),
      Seq(6L, true, true, true, true, false, false)))
  }

  test("bpeMerges: counts in-word adjacent pairs, ranks with lexical ties") {
    val docs = Seq(
      (1L, "abab ab"),     // pairs: ab,ba,ab + ab  -> ab:3 ba:1
      (2L, "x cd cd"),     // single char emits nothing; cd:2
      (3L, ""))            // empty doc emits nothing
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.bpeMerges(docs, k = 3))
    assert(out == Seq(Seq("ab", 3L), Seq("cd", 2L), Seq("ba", 1L)))
  }

  test("invertedIndex: df/tf exact, postings capped to smallest ids") {
    val docs = (1L to 12L).map(i => (i, s"zz zz common u$i"))
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.invertedIndex(docs, minDf = 5, postingCap = 10))
    // u1..u12 have df=1 -> pruned; common df=12 tf=12; zz df=12 tf=24
    assert(out == Seq(
      Seq("common", 12L, 12L, "1,2,3,4,5,6,7,8,9,10"),
      Seq("zz", 12L, 24L, "1,2,3,4,5,6,7,8,9,10")))
  }

  test("invertedIndex: postings identical across partition layouts") {
    val docs = (1L to 40L).map(i => (i, "tok tok")).toDF("doc_id", "text")
    val a = rows(TextAnalysis.invertedIndex(docs.repartition(1), minDf = 1))
    val b = rows(TextAnalysis.invertedIndex(docs.repartition(7), minDf = 1))
    assert(a == b && a.head(3) == "1,2,3,4,5,6,7,8,9,10")
  }

  test("hashEmbed: signed bucket sums, same token accumulates, empty doc zero") {
    val docs = Seq((1L, "tok tok tok"), (2L, "tok"), (3L, ""))
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.hashEmbed(docs, dim = 8).orderBy("doc_id"))
    val v1 = out(0)(1).asInstanceOf[String].split(",").map(_.toLong)
    val v2 = out(1)(1).asInstanceOf[String].split(",").map(_.toLong)
    val v3 = out(2)(1).asInstanceOf[String].split(",").map(_.toLong)
    assert(v1.length == 8 && v3.forall(_ == 0L))
    // one token -> exactly one nonzero component of magnitude 1;
    // tripling the token triples that component
    assert(v2.map(math.abs).sum == 1L)
    assert(v1.toSeq == v2.map(_ * 3).toSeq)
  }

  test("hashEmbed: partition-layout invariant") {
    val docs = (1L to 30L).map(i => (i, s"w$i shared tokens here"))
      .toDF("doc_id", "text")
    val a = rows(TextAnalysis.hashEmbed(docs.repartition(1)).orderBy("doc_id"))
    val b = rows(TextAnalysis.hashEmbed(docs.repartition(7)).orderBy("doc_id"))
    assert(a == b)
  }

  test("topicClassify: weighted votes, lexical tie-break, unknown fallback") {
    val rules = Seq(("cat", "animals", 2), ("dog", "animals", 1),
      ("car", "autos", 3), ("bus", "autos", 1))
    val docs = Seq(
      (1L, "cat dog cat"),      // animals 5
      (2L, "car cat cat dog"),  // autos 3, animals 5 -> animals
      (3L, "car cat dog"),      // autos 3, animals 3 -> tie -> animals
      (4L, "nothing relevant")) // unknown
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.topicClassify(docs, rules).orderBy("doc_id"))
    assert(out == Seq(
      Seq(1L, "animals", 5L),
      Seq(2L, "animals", 5L),
      Seq(3L, "animals", 3L),
      Seq(4L, "unknown", 0L)))
  }

  test("normalizeUnicode: composes decomposed forms, NFC text unchanged") {
    val composed = "caf\u00e9"      // e-acute as one codepoint
    val decomposed = "cafe\u0301"   // e + combining acute
    val docs = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"))
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.normalizeUnicode(docs).orderBy("doc_id"))
    assert(out == Seq(
      Seq(1L, composed, true),   // normalized to the composed form
      Seq(2L, composed, false),  // already NFC
      Seq(3L, "plain ascii", false)))
    // post-normalization, the two spellings exact-dedup together
    val deduped = Dedup.exactDedup(TextAnalysis.normalizeUnicode(docs)
      .select(col("doc_id"), col("text_nfc").as("text")))
    assert(rows(deduped.orderBy("keep_id")) ==
      Seq(Seq(1L, 2L), Seq(3L, 1L)))
  }

  test("tfidfTopTerms: rarer terms outrank frequent ones, ties break on term") {
    // "common" appears in all 3 docs (df=3); each doc also has a unique term
    // (df=1). Unique terms must rank first despite equal tf.
    val docs = Seq(
      (1L, "common alpha common"),
      (2L, "common beta"),
      (3L, "common gamma"))
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.tfidfTopTerms(docs, k = 2)
      .orderBy("doc_id", "rank"))
    // doc 1: alpha (tf=1, df=1, score 1.0) beats common (tf=2, df=3, 0.667)
    assert(out(0)(1) == "alpha" && out(0)(5) == 1L)
    assert(out(1)(1) == "common" && out(1)(2) == 2L && out(1)(3) == 3L)
    assert(out(2)(1) == "beta" && out(3)(1) == "common")
  }

  test("tfidfTopTerms: equal scores tie-break alphabetically") {
    val docs = Seq((1L, "zebra apple")).toDF("doc_id", "text")
    val out = rows(TextAnalysis.tfidfTopTerms(docs, k = 2).orderBy("rank"))
    assert(out.map(_(1)) == Seq("apple", "zebra"))
  }

  test("repetitionScore: repeated 3-grams raise the ratio, short docs are 0") {
    val docs = Seq(
      (1L, "a b c a b c a b c"), // shingles: 7 total, 3 distinct
      (2L, "all distinct words here now"), // 3 shingles, all distinct
      (3L, "too short")) // < 3 tokens -> no shingles
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.repetitionScore(docs).orderBy("doc_id"))
    assert(out(0) == Seq(1L, 7L, 3L, 1.0 - 3.0 / 7))
    assert(out(1) == Seq(2L, 3L, 3L, 0.0))
    assert(out(2) == Seq(3L, 0L, 0L, 0.0))
  }

  test("bpeTokenStats: subword categories split like a BPE pre-tokenizer") {
    val docs = Seq(
      // don't -> don | 't ; 1234 -> 123 | 4 ; "end." -> end | .
      (1L, "don't stop 1234 end."),
      (2L, "")) // empty: 0/0, null ratio
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.bpeTokenStats(docs).orderBy("doc_id"))
    assert(out(0) == Seq(1L, 7L, 4L, 7.0 / 4)) // don,'t,stop,123,4,end,.
    assert(out(1) == Seq(2L, 0L, 0L, null))
  }

  test("cleanText masks urls, emails and digit runs, collapses whitespace") {
    val docs = Seq(
      (1L, "  Visit https://example.com/x?a=1 or mail Bob@Example.COM now  "),
      (2L, "room 42 costs 1234 dollars"))
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.cleanText(docs).orderBy("doc_id"))
    assert(out(0)(1) == "visit <url> or mail <email> now")
    assert(out(1)(1) == "room <num> costs <num> dollars")
  }

  test("piiRedact replaces typed tags in order and counts each category") {
    val docs = Seq(
      (1L, "mail a.b+c@test.org or b@x.co, site http://x.io/p?q=1 done"),
      // the IP must be redacted as <IP>, NOT swallowed by the phone
      // pattern (order contract), while the trailing run IS a phone
      (2L, "host 192.168.0.1 call +1 (555) 010-4242 end"),
      (3L, "no pii here"))
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.piiRedact(docs).orderBy("doc_id"))
    // columns: doc_id, n_email, n_url, n_ip, n_phone, clean
    assert(out(0) == Seq(1L, 2L, 1L, 0L, 0L,
      "mail <EMAIL> or <EMAIL>, site <URL> done"))
    assert(out(1) == Seq(2L, 0L, 0L, 1L, 1L,
      "host <IP> call <PHONE> end"))
    assert(out(2) == Seq(3L, 0L, 0L, 0L, 0L, "no pii here"))
  }

  test("oovRate: top-V vocabulary, per-doc OOV permille, empty doc zeros") {
    val docs = Seq(
      (1L, "a a a b b c"),   // with V=2 the vocab is {a, b}
      (2L, "a b x y"),       // 2 of 4 tokens OOV -> 500 permille
      (3L, "z z z"),         // all OOV -> 1000
      (4L, ""))              // token-less -> zeros
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.oovRate(docs, vocabSize = 2)
      .orderBy("doc_id"))
    assert(out == Seq(
      Seq(1L, 6L, 1L, 166L),   // the lone c is OOV: 1000 div 6
      Seq(2L, 4L, 2L, 500L),
      Seq(3L, 3L, 3L, 1000L),
      Seq(4L, 0L, 0L, 0L)))
  }

  test("hybridTopK: integer RRF fusion matches hand-fused side lists") {
    val docs = Seq(
      (0L, "alpha beta gamma delta shared words"),
      (1L, "alpha beta gamma delta extra"),
      (2L, "shared words plus unrelated filler"),
      (3L, "totally different content here"),
      (4L, "alpha gamma shared other tokens"))
      .toDF("doc_id", "text")
    val q = docs.filter(col("doc_id") === 0)
    val out = rows(TextAnalysis.hybridTopK(docs, q, k = 10, kEach = 3)
      .orderBy("rank"))
    // recompute the fusion from the two sides independently
    val bm = rows(TextAnalysis.bm25TopK(docs, q, k = 3))
      .map(r => r(1).asInstanceOf[Long] -> r(4).asInstanceOf[Long]).toMap
    val vecs = TextAnalysis.hashEmbed(docs)
      .select(col("doc_id").as("vec_id"),
        org.apache.spark.sql.functions.expr(
          "transform(split(vec, ','), x -> CAST(x AS FLOAT))").as("embedding"))
    val cos = rows(Similarity.bruteForceTopK(vecs,
      vecs.filter(col("vec_id") === 0), k = 3))
      .map(r => r(1).asInstanceOf[Long] -> r(2).asInstanceOf[Long]).toMap
    val expect = (bm.keySet ++ cos.keySet).toSeq.map { d =>
      val rrf = bm.get(d).map(r => 1000000L / (60 + r)).getOrElse(0L) +
        cos.get(d).map(r => 1000000L / (60 + r)).getOrElse(0L)
      (d, bm.getOrElse(d, 0L), cos.getOrElse(d, 0L), rrf)
    }.sortBy { case (d, _, _, rrf) => (-rrf, d) }
    assert(out.map(r => (r(1), r(2), r(3), r(4))) == expect)
    assert(out.map(_(5)) == (1L to expect.size).toSeq)
  }

  test("bm25TopK: term-match ranking, rare-term weight, self excluded") {
    val docs = Seq(
      (0L, "apple banana cherry"),            // the query
      (1L, "apple banana cherry extra"),      // hits all 3 query terms
      (2L, "apple banana other words here"),  // hits 2
      (3L, "apple alone plus filler filler"), // hits 1
      (4L, "nothing in common at all"))       // hits 0 — must not appear
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.bm25TopK(docs,
      docs.filter(col("doc_id") === 0), k = 10).orderBy("rank"))
    // self (doc 0) excluded; doc 4 has no hit; more matched terms = higher
    assert(out.map(_(1)) == Seq(1L, 2L, 3L))
    assert(out.map(_(2)) == Seq(3L, 2L, 1L))        // n_hit_terms
    assert(out.map(_(4)) == Seq(1L, 2L, 3L))        // ranks
    // rare-term weighting: a doc matching one RARE term outscores a doc
    // matching one COMMON term at equal length
    val corpus = Seq(
      (10L, "rare zeta"),
      (11L, "common zeta"), (12L, "common beta"), (13L, "common gamma"),
      (14L, "query doc")).toDF("doc_id", "text")
    val q = Seq((20L, "rare common")).toDF("doc_id", "text")
    val scored = rows(TextAnalysis.bm25TopK(corpus, q, k = 1))
    assert(scored.head(1) == 10L) // the rare-term doc wins rank 1
  }

  test("zipfAudit: ranks by frequency, integer ratio vs n_top/rank") {
    // a: 6, b: 3, c: 2, d: 1 -> perfect-ish zipf: ratios 1000, 1000,
    // 2*3*1000/6 = 1000, 1*4*1000/6 = 666
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a a a b c d"))
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.zipfAudit(docs, k = 10).orderBy("rank"))
    assert(out == Seq(
      Seq(1L, "a", 6L, 1000L),
      Seq(2L, "b", 3L, 1000L),
      Seq(3L, "c", 2L, 1000L),
      Seq(4L, "d", 1L, 666L)))
  }

  test("simpsonScore: hand-computed ordered-pair counts in permille") {
    val docs = Seq(
      (1L, "a a a a"),     // one run of 4: 4·3 = 12 pairs / 12 -> 1000
      (2L, "a b a b"),     // two runs of 2: 2+2 = 4 pairs / 12 -> 333
      (3L, "a b c d"),     // all distinct -> 0
      (4L, "a"),           // < 2 tokens -> 0
      (5L, ""))            // empty -> 0 tokens, 0
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.simpsonScore(docs).orderBy("doc_id"))
    assert(out == Seq(
      Seq(1L, 4L, 1000L), Seq(2L, 4L, 333L), Seq(3L, 4L, 0L),
      Seq(4L, 1L, 0L), Seq(5L, 0L, 0L)))
    // partition-invariant: pure integer per-row projection
    assert(rows(TextAnalysis.simpsonScore(docs.repartition(3))
      .orderBy("doc_id")) == out)
  }

  test("encodingAudit: non-ASCII, replacement and control chars per " +
      "source; tab/newline are not controls") {
    import spark.implicits._
    val d = Seq(
      ("a", "pure ascii text"),
      ("a", "café touché"),
      ("b", "broken �� here\u0001"),
      ("b", "tab\tand\nnewline ok")).toDF("source", "text")
    val out = rows(TextAnalysis.encodingAudit(d).orderBy("source"))
    // a: 15 + 11 chars, one doc with 2 accented chars
    assert(out.head == Seq("a", 2L, 26L, 1L, 2L, 0L, 0L, 923L))
    // b: U+FFFD counts as BOTH non-ascii and replacement; U+0001 is a
    // control; \t and \n are not
    assert(out(1) == Seq("b", 2L, 33L, 1L, 2L, 2L, 1L, 939L))
  }

  test("charEntropy: closed-form values, codepoint classes, empty = 0") {
    import graft.plans.CharEntropyMicro.entropyMicro
    // degenerate single-class string carries zero bits
    assert(entropyMicro("aaaa") == 0L)
    assert(entropyMicro("") == 0L)
    // two equiprobable classes = exactly 1 bit (each term is an exact
    // 500000·log2(2) = 500000, no floor loss)
    assert(entropyMicro("ab") == 1000000L)
    assert(entropyMicro("aabb") == 1000000L)
    // four equiprobable classes = 2 bits
    assert(entropyMicro("abcd") == 2000000L)
    // surrogate pairs are ONE codepoint class: 😀 + a = two classes =
    // 1 bit, not the three UTF-16-unit classes a char loop would count
    assert(entropyMicro("😀a") == 1000000L)
    assert(entropyMicro("😀😀") == 0L)
    // the DataFrame wrapper rides the native expression
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd"))
      .toDF("doc_id", "text")
    val out = rows(TextAnalysis.charEntropy(docs).orderBy("doc_id"))
    assert(out == Seq(Seq(1L, 4L, 0L), Seq(2L, 4L, 1000000L),
      Seq(3L, 4L, 2000000L)))
    // and through SQL with codegen: same value as the interpreted path
    val sqlOut = rows(spark.sql(
      "SELECT graft_char_entropy('abcdabcd') AS e"))
    assert(sqlOut == Seq(Seq(2000000L)))
  }
}
