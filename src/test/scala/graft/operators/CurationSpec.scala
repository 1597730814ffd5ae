package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, percent_rank, round}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("sampleStratified: deterministic, per-stratum rates, no RNG") {
    val docs = (1L to 200L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "lang")
    val a = rows(Curation.sampleStratified(docs, "lang",
      Map("en" -> 50), defaultRate = 10).orderBy("doc_id"))
    val b = rows(Curation.sampleStratified(docs, "lang",
      Map("en" -> 50), defaultRate = 10).orderBy("doc_id"))
    assert(a == b) // reproducible across runs
    val en = a.count(_(1) == "en"); val fr = a.count(_(1) == "fr")
    assert(en > fr) // 50% vs 10% rates separate clearly at n=100 each
    // rate 0 keeps nothing; rate 100 keeps everything
    assert(Curation.sampleStratified(docs, "lang", Map(), 0).count() == 0)
    assert(Curation.sampleStratified(docs, "lang", Map(), 100).count() == 200)
  }

  test("weightedSample: equals the naive E-S ghost-copy computation, " +
      "clamps weights, caps per group") {
    def mix(id: Long, r: Int): Long = {
      val s = s"$id:$r"
      var acc = 0L
      s.foreach(c => acc = (acc * 31 + c.toLong) % 1000000007L)
      (1103515245L * acc + 12345L) % 1000000007L
    }
    val rows0 = Seq(
      (1L, "a", 1), (2L, "a", 8), (3L, "a", 3), (4L, "a", 1), (5L, "a", 200),
      (6L, "b", 0), (7L, "b", 2)) // 0 clamps to 1; 200 clamps to 64
    val df = rows0.toDF("doc_id", "source", "w")
    val out = rows(Curation.weightedSample(df, k = 3, weightCol = "w")
      .orderBy("source", "rank"))
    val naive = rows0.groupBy(_._2).flatMap { case (src, rs) =>
      rs.map { case (id, _, w) =>
        val wc = math.min(math.max(w, 1), 64)
        (src, id, wc.toLong, (1 to wc).map(mix(id, _)).max)
      }.sortBy { case (_, id, _, key) => (-key, id) }
        .take(3).zipWithIndex
        .map { case ((src2, id, wc, _), i) => Seq[Any](src2, id, wc, i + 1L) }
    }.toSeq.sortBy(r => (r(0).asInstanceOf[String], r(3).asInstanceOf[Long]))
    assert(out == naive)
    // per-group cap holds and both groups are present
    assert(out.count(_(0) == "a") == 3 && out.count(_(0) == "b") == 2)
    // deterministic across runs
    assert(out == rows(Curation.weightedSample(df, k = 3, weightCol = "w")
      .orderBy("source", "rank")))
  }

  test("capPerGroup: quota per group, hash-ordered, partition-invariant") {
    // ids span digit-lengths so the poly hash wraps and is NOT id-ordered
    val pairs = (1L to 100L).map(i => (i * 987654L + 13L, s"src${i % 3}"))
    val docs = pairs.toDF("doc_id", "source")
    val kept = rows(Curation.capPerGroup(docs, "source", maxPerGroup = 10)
      .orderBy("doc_id"))
    val perGroup = kept.groupBy(_(1)).view.mapValues(_.size).toMap
    assert(perGroup == Map("src0" -> 10, "src1" -> 10, "src2" -> 10))
    // exact selection: the 10 lowest (polyHash, id) per group, recomputed
    def polyHash(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val expected = pairs.groupBy(_._2).values.flatMap(g =>
      g.map(_._1).sortBy(i => (polyHash(i.toString), i)).take(10))
      .toSeq.sorted
    assert(kept.map(_(0)) == expected)
    // physical layout must not change the selection
    val repart = rows(Curation.capPerGroup(docs.repartition(7), "source",
      maxPerGroup = 10).orderBy("doc_id"))
    assert(repart == kept)
    // a cap above the group size keeps everything
    assert(Curation.capPerGroup(docs, "source", 1000).count() == 100)
  }

  test("upsampleCorpus: integer + fractional-hash replicas, layout-stable") {
    val docs = (1L to 300L).map(i => (i, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val out = rows(Curation.upsampleCorpus(docs,
      Map("s0" -> 2500, "s1" -> 0), defaultPermille = 1000)
      .orderBy("doc_id", "replica"))
    val bySrc = out.groupBy(_(1)).view.mapValues(_.size).toMap
    assert(bySrc.getOrElse("s1", 0) == 0)           // weight 0: dropped
    assert(bySrc("s2") == 100)                      // weight 1000: exactly 1x
    assert(bySrc("s0") > 220 && bySrc("s0") < 280)  // ~2.5x of 100 docs
    // every s0 doc appears at least twice with 0-based replica ids
    val s0 = out.filter(_(1) == "s0").groupBy(_(0)).values
    assert(s0.forall(rs => rs.map(_(2)) == (0L until rs.size.toLong)))
    assert(s0.forall(rs => rs.size == 2 || rs.size == 3))
    val again = rows(Curation.upsampleCorpus(docs.repartition(7),
      Map("s0" -> 2500, "s1" -> 0), 1000).orderBy("doc_id", "replica"))
    assert(again == out)
  }

  test("qualityBand: percentile band keeps the expected fraction, edges exact") {
    // scores rise with token count; 11 docs -> pct_rank = 0,10,..,100
    val docs = (1L to 11L).map(i =>
      (i, Seq.fill(i.toInt)("word").mkString(" "))).toDF("doc_id", "text")
    val out = rows(Curation.qualityBand(docs, minPct = 10.0, maxPct = 90.0)
      .orderBy("doc_id"))
    // drops the lowest (pct 0) and highest (pct 100) scorers
    assert(out.map(_(0)) == (2L to 10L))
    assert(out.forall { r =>
      val p = r(2).asInstanceOf[Double]; p >= 10.0 && p <= 90.0 })
    // full band keeps everything
    assert(Curation.qualityBand(docs, 0.0, 100.0).count() == 11L)
  }

  test("qualityBand: assembled rank equals percent_rank across partitions") {
    // enough rows that the range exchange produces MANY partitions — the
    // per-partition row_number + global-offset assembly must agree with
    // the textbook single-window percent_rank on every row
    val docs = (1L to 500L).map(i =>
      (i, Seq.fill((i % 37 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text").repartition(7)
    val got = rows(Curation.qualityBand(docs, 0.0, 100.0)
      .orderBy("doc_id")).map(r => (r(0), r(2)))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality_score").asc, col("doc_id").asc)
    val want = rows(graft.operators.TextAnalysis.qualityScore(docs, "doc_id")
      .withColumn("pct_rank", round(percent_rank().over(w) * 100, 6))
      .select(col("doc_id"), col("pct_rank")).orderBy("doc_id"))
      .map(r => (r(0), r(1)))
    assert(got == want)
  }

  test("cdcChunks: reconstruction, and boundaries survive a prepended edit") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, "x " + base), (3L, "")).toDF("doc_id", "text")
    val out = Curation.cdcChunks(docs, avgTokens = 2)
    // empty doc: no chunks
    assert(out.filter($"doc_id" === 3L).count() == 0L)
    def chunks(id: Long): Seq[String] =
      rows(out.filter($"doc_id" === id).orderBy("chunk_id"))
        .map(_(3).asInstanceOf[String])
    // chunks reassemble the document exactly, in order
    assert(chunks(1L).mkString(" ") == base)
    assert(chunks(2L).mkString(" ") == "x " + base)
    // the CDC property: boundaries are per-token content, so prepending a
    // token perturbs only the region before the first boundary — every
    // chunk after it is bit-identical (fixed windows would shift and
    // re-cut all of them). The prepended token either joins doc 1's first
    // chunk or becomes its own, so compare the common suffix.
    val a = chunks(1L); val b = chunks(2L)
    assert(a.size > 3, s"want several chunks, got ${a.size}")
    assert(b.takeRight(a.size - 1) == a.drop(1))
    // per-chunk token counts add up
    val counts = rows(out.filter($"doc_id" === 1L))
      .map(_(2).asInstanceOf[Long]).sum
    assert(counts == 60L)
  }

  test("chunkDocuments: overlapping windows, short tail, empty doc skipped") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7"),  // 7 tokens: chunks at 0, 3, 6
      (2L, "a b"),                    // single short chunk
      (3L, "   "))                    // no tokens -> no chunks
      .toDF("doc_id", "text")
    val out = rows(Curation.chunkDocuments(docs, chunkTokens = 5,
      overlapTokens = 2).orderBy("doc_id", "chunk_id"))
    assert(out == Seq(
      Seq(1L, 0L, 5L, "t1 t2 t3 t4 t5"),
      Seq(1L, 1L, 4L, "t4 t5 t6 t7"),
      Seq(1L, 2L, 1L, "t7"),
      Seq(2L, 0L, 2L, "a b")))
  }

  test("mixCorpus: rates follow weights, cap at 100%, zero stays empty") {
    // 3 sources x 20 docs x 5 tokens = 100 tokens per source
    val docs = (1L to 60L).map(i =>
      (i * 7919L, s"s${i % 3}", "a b c d e")).toDF("doc_id", "source", "text")
    // budget 100: s0 weight 500 -> target 50 -> rate 50%; s1 weight 1000
    // -> target 100 -> rate 100%; s2 default 0 -> rate 0%
    val out = rows(Curation.mixCorpus(docs,
      Map("s0" -> 500, "s1" -> 1000), defaultPermille = 0,
      tokenBudget = 100L).orderBy("doc_id"))
    val bySrc = out.groupBy(_(1)).view.mapValues(_.size).toMap
    assert(bySrc.getOrElse("s2", 0) == 0)
    assert(bySrc("s1") == 20)                    // rate capped at 100%
    assert(bySrc("s0") > 2 && bySrc("s0") < 18)  // ~50% hash selection
    // deterministic under re-layout
    val again = rows(Curation.mixCorpus(docs.repartition(7),
      Map("s0" -> 500, "s1" -> 1000), 0, 100L).orderBy("doc_id"))
    assert(again == out)
  }

  test("datasetCard: exact one-row profile") {
    val docs = Seq(
      (1L, "a b c", "en"), (2L, "a b c", "en"), (3L, "d e", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = rows(Curation.datasetCard(docs))
    assert(out == Seq(Seq(3L, 8L, 5L, 1L, 1.0 / 3, 8.0 / 3, "en:2,fr:1")))
    // empty corpus: zeros, not a crash or a divide-by-zero
    val empty = rows(Curation.datasetCard(docs.filter("1 = 0")))
    assert(empty.head.take(4) == Seq(0L, 0L, 0L, 0L))
  }

  test("corpusDiff: added/removed/changed, unchanged suppressed") {
    val oldSnap = Seq((1L, "same"), (2L, "gone"), (3L, "before"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "same"), (3L, "after"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val out = rows(Curation.corpusDiff(oldSnap, newSnap).orderBy("doc_id"))
    assert(out == Seq(
      Seq(2L, "removed"), Seq(3L, "changed"), Seq(4L, "added")))
  }

  test("shuffleCorpus: reproducible, epoch-dependent permutations") {
    val docs = (1L to 50L).toDF("doc_id")
    val e1 = rows(Curation.shuffleCorpus(docs, epoch = 1)).map(_(0))
    val e1Again = rows(Curation.shuffleCorpus(docs.repartition(7), epoch = 1))
      .map(_(0))
    assert(e1 == e1Again)            // run- and layout-stable
    assert(e1.toSet == (1L to 50L).toSet)
    val e2 = rows(Curation.shuffleCorpus(docs, epoch = 2)).map(_(0))
    assert(e1 != e2)                 // epochs are independent permutations
    assert(e1 != (1L to 50L).toSeq)  // and it actually shuffles
  }

  test("lengthBuckets: power-of-two bins with exact stats") {
    val docs = Seq(
      (1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"),
      (5L, "a b c d e f g h")).toDF("doc_id", "text")
    val out = rows(Curation.lengthBuckets(docs).orderBy("bucket"))
    assert(out == Seq(
      Seq(1L, 1L, 1L, 1L, 1L),   // n=1
      Seq(2L, 2L, 5L, 2L, 3L),   // n=2,3
      Seq(3L, 1L, 4L, 4L, 4L),   // n=4..7
      Seq(4L, 1L, 8L, 8L, 8L)))  // n=8..15
  }

  test("packSequences: budget boundaries within shard, shards independent") {
    val docs = Seq(
      (1L, "s1", "a b c"), (2L, "s1", "d e f"), (3L, "s1", "g h"),
      (10L, "s2", "x y z w"))
      .toDF("doc_id", "source", "text")
    val out = rows(Curation.packSequences(docs, budget = 4)
      .orderBy("source", "doc_id"))
    // s1: cum excl = 0, 3, 6 -> packs 0, 0, 1; s2 starts fresh at pack 0
    assert(out == Seq(
      Seq("s1", 1L, 3L, 0L), Seq("s1", 2L, 3L, 0L), Seq("s1", 3L, 2L, 1L),
      Seq("s2", 10L, 4L, 0L)))
  }

  test("curate: drops dups, short/long docs, and low-alpha docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again today"), // dup of 1
      (3L, "too short"),                                               // < 10 tokens
      (4L, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15"),                     // low alpha
      (5L, "many plain english words fill this document nicely for the test"))
      .toDF("doc_id", "text")
    val out = rows(Curation.curate(docs, minTokens = 10, maxTokens = 2000,
      minAlphaRatio = 0.5).orderBy("doc_id"))
    assert(out.map(_(0)) == Seq(1L, 5L))
  }

  test("trainValSplit: stable under corpus growth, roughly valPct sized") {
    val small = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val big = (0L until 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val sSmall = Curation.trainValSplit(small, valPct = 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val sBig = Curation.trainValSplit(big, valPct = 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // adding documents never reassigns existing ones
    assert(sSmall.forall { case (id, sp) => sBig(id) == sp })
    val nVal = sBig.values.count(_ == "val")
    assert(nVal > 10 && nVal < 90, s"val fraction off: $nVal/400")
  }

  test("intakePipeline: dedups, filters, drops higher near-dup ids, splits") {
    val base = "the quick brown fox jumps over the lazy dog again today"
    val docs = Seq(
      (1L, base),
      (2L, base),              // exact dup of 1 -> dropped
      (3L, base + " extra"),   // near-dup of 1 (high jaccard) -> higher id dropped
      (4L, "too short"),       // quality-dropped
      (5L, "many plain english words fill this document nicely for the test"))
      .toDF("doc_id", "text")
    val out = rows(Curation.intakePipeline(docs).orderBy("doc_id"))
    assert(out.map(_(0)) == Seq(1L, 5L))
    assert(out.forall(r => r(2) == "train" || r(2) == "val"))
  }

  test("intakePipelineV3: gopher, LM floor, exact dedup and split compose") {
    // doc 1: repeated phrase — gopher-clean, near-deterministic bigrams
    val good = Seq.fill(4)("a castle stands of a bigger mighty barnyard")
      .mkString(" ")
    // doc 4: gopher-clean but every stopword continuation varies, so its
    // corpus bigram probabilities are low (the perplexity-filter target)
    val vary = (1 to 12)
      .map(i => (if (i % 2 == 1) "the" else "of") + s" qu${i}x")
      .mkString(" ")
    val docs = Seq(
      (1L, good, "s0"),
      (2L, good, "s0"),            // exact dup -> keeper is id 1
      (3L, "tiny doc here", "s0"), // gopher word-count fail
      (4L, vary, "s0"))            // passes gopher, fails the LM floor
      .toDF("doc_id", "text", "source")
    val strict = rows(
      Curation.intakePipelineV3(docs, minLm = -0.5).orderBy("doc_id"))
    assert(strict.map(_(0)) == Seq(1L))
    assert(strict.head(2) == 32L) // n_words
    assert(strict.forall(r => r(4) == "train" || r(4) == "val"))
    // relaxing the floor readmits exactly the low-LM doc
    val loose = rows(
      Curation.intakePipelineV3(docs, minLm = -10.0).orderBy("doc_id"))
    assert(loose.map(_(0)) == Seq(1L, 4L))
  }

  test("topNgrams: df-ranked with alphabetical ties, distinct per doc") {
    val docs = Seq(
      (1L, "a b c a b c"),     // "a b c" counted once for this doc
      (2L, "a b c x y z"),
      (3L, "x y z q r s"))
      .toDF("doc_id", "text")
    val out = rows(Curation.topNgrams(docs, n = 3, k = 3))
    assert(out(0)(0) == "a b c" && out(0)(1) == 2L) // df=2, ties: "a b c" < "x y z"
    assert(out(1)(0) == "x y z" && out(1)(1) == 2L)
  }

  test("splitLeakage: cross-boundary near-dup pairs counted; degenerate splits leak 0") {
    import org.apache.spark.sql.functions.col
    val base = "one two three four five six seven eight nine ten eleven twelve"
    // three near-dup copies + one unrelated doc -> 3 near-dup pairs
    val docs = Seq(
      (1L, base), (2L, base + " extra"), (3L, base),
      (4L, "completely different words live here in this other document now"))
      .toDF("doc_id", "text")
    // valPct 0 and 100 put everything in one split: pairs exist, leak = 0
    val all = rows(Curation.splitLeakage(docs, valPct = 0))
    assert(all.head == Seq(3L, 0L, 0.0))
    val none = rows(Curation.splitLeakage(docs, valPct = 100))
    assert(none.head == Seq(3L, 0L, 0.0))
    // generic split: n_cross must equal the count derived independently
    // from trainValSplit + the pair list
    val split = rows(Curation.trainValSplit(docs, valPct = 50)
      .select(col("doc_id"), col("split"))).map(r => r(0) -> r(1)).toMap
    val expectedCross = Seq((1L, 2L), (1L, 3L), (2L, 3L))
      .count { case (a, b) => split(a) != split(b) }
    val out = rows(Curation.splitLeakage(docs, valPct = 50))
    assert(out.head(0) == 3L && out.head(1) == expectedCross.toLong)
  }

  test("qualityCalibrate: per-source ranks, per-source drop fraction") {
    // source A: 4 docs with strictly increasing quality (longer text,
    // no punctuation); source B: 2 docs. dropPermille 250 cuts
    // floor(4 * 0.25) = 1 doc from A and floor(2 * 0.25) = 0 from B —
    // a global cutoff could never produce that shape.
    def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, doc(10), "A"), (2L, doc(20), "A"),
      (3L, doc(30), "A"), (4L, doc(40), "A"),
      (5L, doc(5), "B"), (6L, doc(50), "B"))
      .toDF("doc_id", "text", "source")
    val out = rows(Curation.qualityCalibrate(docs, dropPermille = 250)
      .orderBy("doc_id"))
    // (doc_id, src_rank, n_src, kept)
    assert(out.map(r => (r(0), r(3), r(4), r(5))) == Seq(
      (1L, 1L, 4L, false), (2L, 2L, 4L, true),
      (3L, 3L, 4L, true), (4L, 4L, 4L, true),
      (5L, 1L, 2L, true), (6L, 2L, 2L, true)))
    // assembled grouped rank is partition-invariant
    val rep = rows(Curation.qualityCalibrate(docs.repartition(5),
      dropPermille = 250).orderBy("doc_id"))
    assert(rep == out)
  }

  test("mixPlanner: exact ceil-epoch feasibility per source") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words(6), "A"), (2L, words(4), "A"), // A: 10 tokens
      (3L, words(100), "B"))                    // B: 100 tokens
      .toDF("doc_id", "text", "source")
    val out = rows(Curation.mixPlanner(docs,
      weightsPermille = Map("A" -> 500), defaultPermille = 100,
      tokenBudget = 100L, maxEpochsMilli = 4000L).orderBy("source"))
    // A: target 50 of 10 available -> needs 5.0 epochs > 4.0 cap:
    // infeasible, achieves 40. B: target 10 of 100 -> 0.1 epochs, fine.
    assert(out == Seq(
      Seq("A", 2L, 10L, 50L, 5000L, 4000L, 40L, false),
      Seq("B", 1L, 100L, 10L, 100L, 100L, 10L, true)))
  }

  test("kfoldSplit: stable folds in range, invariant under corpus growth") {
    val docs = (1L to 100L).toDF("doc_id")
    val out = rows(Curation.kfoldSplit(docs, k = 5).orderBy("doc_id"))
    assert(out.forall(r => (0L until 5L).contains(r(1))))
    // all 5 folds populated on 100 docs
    assert(out.map(_(1)).distinct.size == 5)
    // growing the corpus never reassigns existing documents
    val grown = rows(Curation.kfoldSplit((1L to 200L).toDF("doc_id"), k = 5)
      .orderBy("doc_id")).take(100)
    assert(grown == out)
  }

  test("clusterSplit: near-dup cluster members never cross the boundary") {
    // docs 1/2/4 are a near-dup cluster (from the DedupSpec fixture),
    // 3 and 5 are singletons
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and AGAIN"),
      (3L, "completely different words about spark query engines at scale"),
      (4L, "the quick brown fox jumps over the lazy dog again and again"),
      (5L, "unrelated short text but long enough to carry some shingles"))
      .toDF("doc_id", "text")
    // valPct = 50 so both sides are actually populated
    val out = rows(Curation.clusterSplit(docs, valPct = 50)
      .orderBy("doc_id"))
    assert(out.map(_(0)) == Seq(1L, 2L, 3L, 4L, 5L))
    // one split value per cluster
    val byCluster = out.groupBy(_(1)).values
    assert(byCluster.forall(g => g.map(_(2)).distinct.size == 1))
    // the near-dup cluster {1,2,4} shares cluster id 1 and one side
    val c124 = out.filter(r => Seq(1L, 2L, 4L).contains(r(0)))
    assert(c124.map(_(1)).distinct == Seq(1L)
      && c124.map(_(2)).distinct.size == 1)
  }

  test("calibrationCurve: equal-width bins, per-bin positive permille") {
    // scores 0..9, label = score >= 5; 5 bins of width 2
    val scored = (0L to 9L).map(s => (s, s >= 5)).toDF("score", "label")
    val out = rows(Curation.calibrationCurve(scored, "score", "label",
      buckets = 5).orderBy("bin"))
    assert(out == Seq(
      Seq(0L, 0L, 1L, 2L, 0L, 0L),
      Seq(1L, 2L, 3L, 2L, 0L, 0L),
      Seq(2L, 4L, 5L, 2L, 1L, 500L),
      Seq(3L, 6L, 7L, 2L, 2L, 1000L),
      Seq(4L, 8L, 9L, 2L, 2L, 1000L)))
    // constant score -> single bin 0, no division error
    val const = Seq((7L, true), (7L, false)).toDF("score", "label")
    assert(rows(Curation.calibrationCurve(const, "score", "label"))
      == Seq(Seq(0L, 7L, 7L, 2L, 1L, 500L)))
  }

  test("classifierAuc: hand-computed wins/ties, integer micro result") {
    // positives score {3, 2}, negatives {1, 2}: wins = 3 (3>1, 3>2, 2>1),
    // ties = 1 (2=2) -> AUC = (3 + 0.5)/4 = 0.875
    val scored = Seq((3L, true), (2L, true), (1L, false), (2L, false))
      .toDF("score", "label")
    val out = rows(Curation.classifierAuc(scored, "score", "label"))
    assert(out == Seq(Seq(2L, 2L, 1L, 875000L)))
    // partition-invariant (integer arithmetic only)
    assert(rows(Curation.classifierAuc(scored.repartition(3),
      "score", "label")) == out)
    // perfect separation -> 1.0; inverted -> 0.0
    val perfect = Seq((5L, true), (1L, false)).toDF("score", "label")
    assert(rows(Curation.classifierAuc(perfect, "score", "label"))
      .head(3) == 1000000L)
    val inverted = Seq((1L, true), (5L, false)).toDF("score", "label")
    assert(rows(Curation.classifierAuc(inverted, "score", "label"))
      .head(3) == 0L)
    // degenerate single-class input -> NULL auc, counts still reported
    val onlyPos = Seq((1L, true), (2L, true)).toDF("score", "label")
    val d = rows(Curation.classifierAuc(onlyPos, "score", "label"))
    assert(d.head.take(3) == Seq(2L, 0L, 0L) && d.head(3) == null)
  }

  test("ksDrift: exact cross statistic on hand-computed samples") {
    // a = {1,1,2,3}, b = {2,3,3,4}: at v=1 |2*4 - 0*4| = 8 (the max);
    // D = 8/16 = 0.5
    val a = Seq(1L, 1L, 2L, 3L).toDF("v")
    val b = Seq(2L, 3L, 3L, 4L).toDF("v")
    val out = rows(Curation.ksDrift(a, b, "v")).head
    assert(out == Seq(4L, 4L, 4L, 8L, 500000L))
    // identical samples: D = 0
    assert(rows(Curation.ksDrift(a, a, "v")).head ==
      Seq(4L, 4L, 3L, 0L, 0L))
    // one side empty: d_micro null, counts still reported
    val e = rows(Curation.ksDrift(a, b.limit(0), "v")).head
    assert(e(0) == 4L && e(1) == 0L && e(4) == null)
    // disjoint supports: D = 1
    val c = Seq(10L, 11L).toDF("v")
    assert(rows(Curation.ksDrift(a, c, "v")).head(4) == 1000000L)
    // partition-invariance of the integer path
    assert(rows(Curation.ksDrift(a.repartition(5), b.repartition(3), "v")) ==
      rows(Curation.ksDrift(a, b, "v")))
    // nulls in the metric column are DROPPED, not smuggled in as the
    // smallest value (a null bucket would enter the CDF first and skew
    // D): null-padded side with identical non-null content -> D = 0
    val an = Seq[java.lang.Long](1L, 1L, 2L, 3L, null, null).toDF("v")
    assert(rows(Curation.ksDrift(an, a, "v")).head ==
      Seq(4L, 4L, 3L, 0L, 0L))
  }

  test("classifierAucByGroup: each group's statistic equals " +
      "classifierAuc on that slice; single-class groups read null") {
    val d = Seq(
      ("x", 3L, true), ("x", 1L, false), ("x", 2L, true), ("x", 2L, false),
      ("y", 5L, true), ("y", 4L, false), ("y", 6L, true),
      ("z", 9L, true), ("z", 8L, true)).toDF("g", "s", "y")
    val got = rows(Curation.classifierAucByGroup(d, "s", "y", "g")
      .orderBy("g"))
    Seq("x", "y").foreach { gv =>
      val want = rows(
        Curation.classifierAuc(d.filter(col("g") === gv), "s", "y")).head
      assert(got.find(_.head == gv).get.tail == want, s"group $gv")
    }
    // only positives in z: AUC undefined, counts still reported
    val z = got.find(_.head == "z").get
    assert(z(1) == 2L && z(2) == 0L && z(4) == null)
  }

  test("datasetCardSketch: below-k vocab is exact and every other card " +
      "field matches the exact card") {
    val d = Seq((1L, "alpha beta gamma", "en"), (2L, "alpha beta", "fr"),
      (3L, "alpha beta gamma", "en")).toDF("doc_id", "text", "lang")
    val ex = rows(Curation.datasetCard(d)).head
    val sk = rows(Curation.datasetCardSketch(d)).head
    // 3 distinct tokens < k = 256: the sketch IS the exact count
    assert(sk(2) == ex(2).asInstanceOf[Long].toDouble)
    // all non-vocab fields identical to the exact card
    assert(sk.patch(2, Nil, 1) == ex.patch(2, Nil, 1))
  }

  test("ksDriftByGroup: each group's statistic equals ksDrift on that " +
      "slice; one-sided groups read d_micro null") {
    val a = Seq(("x", 1L), ("x", 1L), ("x", 2L), ("x", 3L), ("y", 5L),
      ("y", 6L), ("z", 1L)).toDF("g", "v")
    val b = Seq(("x", 2L), ("x", 3L), ("x", 3L), ("x", 4L), ("y", 5L),
      ("y", 7L)).toDF("g", "v")
    val got = rows(Curation.ksDriftByGroup(a, b, "v", "g").orderBy("g"))
    // group x mirrors the ksDrift hand-computed case: D = 8/16
    assert(got.find(_.head == "x").get.tail == Seq(4L, 4L, 4L, 8L, 500000L))
    // per-group equality with the ungrouped operator
    Seq("x", "y").foreach { gv =>
      val want = rows(Curation.ksDrift(
        a.filter(col("g") === gv).select("v"),
        b.filter(col("g") === gv).select("v"), "v")).head
      assert(got.find(_.head == gv).get.tail == want, s"group $gv")
    }
    // group only in side a: zero cross statistic, undefined d_micro
    val z = got.find(_.head == "z").get
    assert(z(1) == 1L && z(2) == 0L && z(4) == 0L && z(5) == null)
  }

  test("annotatorAgreement: kappa matches the closed form, sign-correct") {
    // 2x2: cells (y,y)=4, (y,n)=1, (n,y)=1, (n,n)=4 -> n=10, agree=8,
    // m1 = (5,5), m2 = (5,5), S = 50; kappa = (80-50)/(100-50) = 0.6
    val df = (Seq.fill(4)(("y", "y")) ++ Seq(("y", "n"), ("n", "y")) ++
      Seq.fill(4)(("n", "n"))).toDF("r1", "r2")
    val out = rows(Curation.annotatorAgreement(df, "r1", "r2")).head
    assert(out == Seq(10L, 8L, 800000L, 30L, 50L, 600000L))
    // systematic DISagreement: kappa negative, floored (not truncated)
    val bad = (Seq.fill(4)(("y", "n")) ++ Seq.fill(4)(("n", "y")) ++
      Seq(("y", "y"), ("n", "n"))).toDF("r1", "r2")
    val o2 = rows(Curation.annotatorAgreement(bad, "r1", "r2")).head
    // n=10, agree=2, S=50: kappa = (20-50)/(100-50) = -0.6
    assert(o2(3) == -30L && o2(4) == 50L && o2(5) == -600000L)
    // negative kappa WITH a remainder: cells (y,y)=1,(n,n)=1,(y,n)=5,
    // (n,y)=3 -> S=48, kappa = -28/52 = -7/13; the exact DECIMAL floor
    // is -538462 where plain truncating DIV would give -538461
    val rem = (Seq(("y", "y"), ("n", "n")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(3)(("n", "y"))).toDF("r1", "r2")
    val o3 = rows(Curation.annotatorAgreement(rem, "r1", "r2")).head
    assert(o3(3) == -28L && o3(4) == 52L && o3(5) == -538462L)
    // both raters constant: pe = 1, kappa undefined -> null
    val const = Seq(("y", "y"), ("y", "y")).toDF("r1", "r2")
    assert(rows(Curation.annotatorAgreement(const, "r1", "r2")).head(5) == null)
  }

  test("lDiversityAudit: homogeneous groups flagged with their row mass") {
    // group (a,1): 3 rows, 1 distinct sensitive -> below l=2;
    // group (b,2): 2 rows, 2 distinct -> diverse
    val d = Seq(("a", 1L, "s1"), ("a", 1L, "s1"), ("a", 1L, "s1"),
      ("b", 2L, "s1"), ("b", 2L, "s2")).toDF("q1", "q2", "sv")
    val out = rows(Curation.lDiversityAudit(d, Seq("q1", "q2"), "sv", 2L))
      .head
    assert(out == Seq(5L, 2L, 1L, 3L, 600L))
    // l = 1 is always satisfied by a non-empty group
    assert(rows(Curation.lDiversityAudit(d, Seq("q1"), "sv", 1L))
      .head(4) == 0L)
    // empty input: zero counts, undefined permille
    val e = rows(Curation.lDiversityAudit(d.limit(0), Seq("q1"), "sv", 2L))
      .head
    assert(e(0) == 0L && e(4) == null)
  }

  test("kAnonymityAudit: groups below k and rows at risk") {
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 1L), // group of 3: safe at k=2
      ("b", 1L), ("b", 1L),            // group of 2: safe
      ("c", 2L)                        // singleton: at risk
    ).toDF("qt", "qz")
    val out = rows(Curation.kAnonymityAudit(df, Seq("qt", "qz"), 2L)).head
    assert(out == Seq(6L, 3L, 1L, 1L, 166L))
    // k=4: every group (3, 2, 1) is below k
    val o2 = rows(Curation.kAnonymityAudit(df, Seq("qt", "qz"), 4L)).head
    assert(o2 == Seq(6L, 3L, 3L, 6L, 1000L))
    // k=3 flags the 2- and 1-groups
    val o3 = rows(Curation.kAnonymityAudit(df, Seq("qt", "qz"), 3L)).head
    assert(o3 == Seq(6L, 3L, 2L, 3L, 500L))
  }

  test("dsirWeights: in-domain documents outweigh out-of-domain; " +
      "gram counts include unigrams + bigrams; empty docs weigh 0") {
    import org.apache.spark.sql.functions.col
    val raw = Seq(
      (1L, "spark shuffle exchange plan"),
      (2L, "spark shuffle partition"),
      (3L, "banana smoothie recipe blender"),
      (4L, "")).toDF("doc_id", "text")
    val target = Seq((10L, "spark shuffle exchange"),
      (11L, "shuffle plan exchange")).toDF("doc_id", "text")
    val out = Curation.dsirWeights(raw, target, buckets = 64)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    // unigrams + bigrams: "spark shuffle exchange plan" = 4 + 3 grams
    assert(out(0).getLong(1) == 7L)
    assert(out(3).getLong(1) == 0L && out(3).getLong(2) == 0L)
    // per-gram in-domain score beats out-of-domain (doc 3 shares no
    // vocabulary with the target, so its grams only pay the raw-side
    // denominator)
    val perGram = out.map(r =>
      if (r.getLong(1) == 0) 0.0 else r.getLong(2).toDouble / r.getLong(1))
    assert(perGram(0) > perGram(2),
      s"in-domain doc must outweigh out-of-domain: ${perGram.toSeq}")
    assert(perGram(1) > perGram(2))
  }

  test("tClosenessAudit: variational distance matches the closed form; " +
      "absent sensitive values charge the full global mass") {
    // A: x,x,x,y  B: x,y,y,y — global x:4 y:4 N:8
    // d(A) = d(B) = ½(|3/4−½| + |1/4−½|) = 0.25 → 250000 micro
    val df = (Seq.fill(3)(("A", "x")) ++ Seq(("A", "y")) ++
      Seq(("B", "x")) ++ Seq.fill(3)(("B", "y"))).toDF("q", "s")
    val flagged = rows(Curation.tClosenessAudit(df, Seq("q"), "s",
      tMicro = 200000L)).head
    assert(flagged == Seq(8L, 2L, 2L, 8L, 1000L, 250000L))
    // strict inequality: t exactly at the max distance flags nothing
    val clear = rows(Curation.tClosenessAudit(df, Seq("q"), "s",
      tMicro = 250000L)).head
    assert(clear == Seq(8L, 2L, 0L, 0L, 0L, 250000L))
    // disjoint supports: A holds only x, B only y — each class is
    // missing half the global mass, d = ½(½ + ½) = 0.5. The absent
    // value's |0 − n_s/N| term comes from the (N − Σ_present n_s)·N_c
    // remainder, the identity that keeps the plan off a classes ×
    // domain cross join.
    val dj = (Seq.fill(2)(("A", "x")) ++ Seq.fill(2)(("B", "y")))
      .toDF("q", "s")
    val out = rows(Curation.tClosenessAudit(dj, Seq("q"), "s",
      tMicro = 499999L)).head
    assert(out == Seq(4L, 2L, 2L, 4L, 1000L, 500000L))
  }

  test("budgetSelect: greedy best-first prefix per group, crossing doc " +
      "excluded, zero budget keeps nothing") {
    val df = Seq(
      // group a: quality order 3 (0.9), 1 (0.8), 2 (0.5); costs 5, 4, 2
      ("a", 1L, 0.8, 4L), ("a", 2L, 0.5, 2L), ("a", 3L, 0.9, 5L),
      // group b: one doc bigger than the budget -> excluded, next fits
      ("b", 4L, 0.9, 20L), ("b", 5L, 0.1, 6L))
      .toDF("grp", "doc_id", "score", "cost")
    val out = rows(Curation.budgetSelect(df, "grp", "score", "cost",
      budget = 9L).orderBy("grp", "pick_rank"))
    // a: 3 (cum 5), 1 (cum 9); 2 would make 11 -> cut
    // b: 4 crosses at 20 -> cut, AND everything after it (prefix rule)
    assert(out == Seq(
      Seq("a", 3L, 0.9, 5L, 1L, 5L),
      Seq("a", 1L, 0.8, 4L, 2L, 9L)))
    assert(Curation.budgetSelect(df, "grp", "score", "cost", 0L)
      .count() == 0L)
  }

  test("privacyAuditFromCounts = the three row-level audits over the " +
      "rows the counts summarize") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val df = (Seq.fill(5)(("A", 0L, "x")) ++ Seq(("A", 0L, "y")) ++
      Seq(("B", 1L, "x"), ("B", 1L, "y"), ("B", 1L, "z")) ++
      Seq.fill(2)(("C", 2L, "z"))).toDF("qt", "qz", "s")
    val counts = df.groupBy(col("qt"), col("qz"), col("s"))
      .agg(count(lit(1)).as("n"))
    val got = rows(Curation.privacyAuditFromCounts(counts,
      Seq("qt", "qz"), "s", "n", k = 3L, l = 2L, tMicro = 300000L)).head
    val ka = rows(Curation.kAnonymityAudit(df, Seq("qt", "qz"), 3L)).head
    val ld = rows(Curation.lDiversityAudit(df, Seq("qt", "qz"), "s",
      2L)).head
    val tc = rows(Curation.tClosenessAudit(df, Seq("qt", "qz"), "s",
      300000L)).head
    assert(got == Seq(ka(0), ka(1), ka(2), ka(3), ld(2), ld(3),
      tc(2), tc(3), tc(5)))
    // and the combined gate actually discriminates on this fixture
    assert(got(2).asInstanceOf[Long] > 0L &&
      got(2).asInstanceOf[Long] < got(1).asInstanceOf[Long])
  }

  test("privacy audits: an ALL-null-sensitive class still counts as an " +
      "equivalence class (agrees with kAnonymityAudit), null rows " +
      "carry no distribution mass") {
    import org.apache.spark.sql.functions.{col, count, lit}
    // class A: 3 rows, all null-sensitive; class B: 2 x, 1 y; class C:
    // 2 rows with one null (mixed)
    val df = (Seq.fill(3)(("A", null: String)) ++
      Seq(("B", "x"), ("B", "x"), ("B", "y")) ++
      Seq(("C", "x"), ("C", null: String))).toDF("q", "s")
    val ka = rows(Curation.kAnonymityAudit(df, Seq("q"), 3L)).head
    // k-anonymity sees 3 classes of sizes 3, 3, 2 -> one below k = 3
    assert(ka == Seq(8L, 3L, 1L, 2L, 250L))
    val counts = df.groupBy(col("q"), col("s"))
      .agg(count(lit(1)).as("n"))
    val got = rows(Curation.privacyAuditFromCounts(counts, Seq("q"),
      "s", "n", k = 3L, l = 2L, tMicro = 999999L)).head
    // n_rows and the k fields must MATCH the row-level k audit — the
    // all-null class A must not vanish from the counts-derived gate
    assert(got(0) == ka(0) && got(1) == ka(1) &&
      got(2) == ka(2) && got(3) == ka(3), s"got $got vs ka $ka")
    // l-diversity: A has 0 distinct sensitive values, C has 1 -> both
    // below l = 2; B has 2
    assert(got(4) == 2L && got(5) == 5L, s"got $got")
    // t-closeness of the all-null class is the empty-present-set
    // degenerate: dist = 1/2 exactly (500000 micro); global x:3 y:1
    // (nulls excluded from the distribution), N = 8
    val tc = rows(Curation.tClosenessAudit(df, Seq("q"), "s",
      tMicro = 499999L)).head
    assert(tc(1) == 3L, s"all-null class dropped from t-closeness: $tc")
    assert(tc.last.asInstanceOf[Long] >= 500000L)
  }

  test("budgetSelect: literal prefix semantics under a negative cost " +
      "(no re-entry after the crossing row); null cost fails loudly") {
    // cum costs: 5, 25 (crosses 10), 7 (dips back under) — the prefix
    // rule excludes the crossing row AND the dip-back row
    val df = Seq(("g", 1L, 0.9, 5L), ("g", 2L, 0.8, 20L),
      ("g", 3L, 0.7, -18L)).toDF("grp", "doc_id", "score", "cost")
    val out = rows(Curation.budgetSelect(df, "grp", "score", "cost",
      budget = 10L).orderBy("pick_rank"))
    assert(out == Seq(Seq("g", 1L, 0.9, 5L, 1L, 5L)),
      s"post-crossing rows must stay excluded, got $out")
    val withNull = Seq(("g", 1L, 0.9, Some(5L)), ("g", 2L, 0.8, None))
      .toDF("grp", "doc_id", "score", "cost")
    val e = intercept[Exception] {
      Curation.budgetSelect(withNull, "grp", "score", "cost", 10L)
        .collect()
    }
    assert(e.toString.contains("budgetSelect") ||
      Option(e.getCause).exists(_.toString.contains("budgetSelect")),
      s"expected the null-cost raise_error, got $e")
  }
}
