package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/**
 * Corpus-curation operators: the selection/packing passes that turn a raw
 * document table into training-ready data.
 */
object Curation {

  /**
   * Deterministic stratified sampling: keep a per-stratum percentage of
   * documents, chosen by a reproducible hash of the id — the same rows
   * survive on every run, cluster size, and engine (the sampling hash is
   * the oracle-checkable polynomial hash, not a seeded RNG). `rates` maps
   * stratum value -> keep percentage [0,100]; `defaultRate` covers
   * unlisted strata. One narrow filter, no shuffle.
   */
  def sampleStratified(docs: DataFrame, strataCol: String,
                       rates: Map[String, Int], defaultRate: Int,
                       idCol: String = "doc_id"): DataFrame = {
    val rate: Column = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    docs.filter(
      expr(s"graft_poly_hash(CAST($idCol AS STRING), 31, 1000000007) % 100")
        < rate)
  }

  /**
   * EXACT weighted sampling without replacement — the k rows per group
   * with the Efraimidis–Spirakis reservoir order (rank by u^(1/w)),
   * realized in pure integer arithmetic: each row draws `w` independent
   * uniform integer keys (its "ghost copies") from the reproducible
   * mixed polynomial hash of (id, copy) and ranks by the LARGEST. The
   * max of w iid uniforms follows exactly the law u^(1/w) induces, so
   * the selection is distributionally E-S — without the float `pow`
   * whose last ulp differs between libms and would make the selection
   * engine-dependent (not oracle-checkable). Hash-equality ties
   * (astronomically rare) break on id. Emits
   * (groupCol, idCol, weight, rank), rank 1 = highest key.
   *
   * Scale: one narrow projection computing <= `maxWeight` hashes per
   * row, one shuffle on the group key for the ranking window. Weights
   * clamp to [1, maxWeight]: per-row work stays bounded, and beyond
   * ~64 tickets the inclusion-probability curve is flat anyway (use
   * [[upsampleCorpus]] when large multiplicities are the actual goal).
   */
  def weightedSample(docs: DataFrame, k: Int, weightCol: String,
                     groupCol: String = "source", idCol: String = "doc_id",
                     maxWeight: Int = 64): DataFrame = {
    require(k >= 1, "k >= 1")
    val w = s"LEAST(GREATEST(CAST($weightCol AS INT), 1), $maxWeight)"
    val key = expr(
      s"""array_max(transform(sequence(1, $w),
         |  r -> (1103515245 * graft_poly_hash(
         |          CAST($idCol AS STRING) || ':' || CAST(r AS STRING),
         |          31, 1000000007) + 12345) % 1000000007))""".stripMargin)
    val win = Window.partitionBy(groupCol)
      .orderBy(col("__wk").desc, col(idCol).asc)
    docs.withColumn("__wk", key)
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= k)
      .select(col(groupCol), col(idCol),
        expr(w).cast("long").as("weight"), col("rank"))
  }

  /**
   * Sequence packing: assign documents to fixed-token-budget packs within
   * each shard (`shardCol`), in deterministic `idCol` order — the standard
   * streaming pack `pack = floor(exclusive_prefix_tokens / budget)`.
   *
   * Scale: the running sum is a window per shard, so parallelism =
   * shard count (at 100 TB shards are file groups or sources, thousands
   * wide); a single global pack order would serialize and is deliberately
   * not offered.
   */
  def packSequences(docs: DataFrame, budget: Int, shardCol: String = "source",
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", size(TextFns.tokens(textCol)).cast("long"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        ((col("__cum") - col("n_tokens")) / budget).cast("long"))
      .select(col(shardCol), col(idCol), col("n_tokens"), col("pack_id"))
  }

  /**
   * Deterministic train/validation split by reproducible id hash: a
   * document's assignment never changes with cluster size, run, engine,
   * or corpus growth (new docs don't reshuffle old assignments — the
   * property a seeded `randomSplit` does NOT have). `valPct` percent of
   * the hash space goes to "val", the rest to "train". One narrow
   * projection.
   */
  def trainValSplit(docs: DataFrame, valPct: Int = 10,
                    idCol: String = "doc_id"): DataFrame =
    docs.withColumn("split",
      when(
        expr(s"graft_poly_hash(CAST($idCol AS STRING), 31, 1000000007) % 100")
          < valPct, lit("val"))
        .otherwise(lit("train")))

  /**
   * Train/val contamination check: near-duplicate pairs that CROSS the
   * split boundary leak evaluation data into training — the eval-set
   * hygiene number a pipeline must drive to ~0 (e.g. by splitting on
   * near-dup cluster id instead of doc id). Near-dup edges come from
   * [[Dedup.minhashLshPairs]] (the O(n) scale path); the split is
   * [[trainValSplit]]'s reproducible hash, so the whole metric is
   * deterministic and oracle-checkable. One row: n_pairs, n_cross,
   * leak_rate.
   *
   * Scale: pair volume is the minhash candidate bound; the split columns
   * join on the 8-byte id — nothing here exceeds the dedup pass the
   * pipeline already runs.
   */
  def splitLeakage(docs: DataFrame, valPct: Int = 10, n: Int = 3,
                   threshold: Double = 0.5, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val split = trainValSplit(docs, valPct, idCol)
      .select(col(idCol), col("split"))
    Dedup.minhashLshPairs(docs, n = n, threshold = threshold,
      idCol = idCol, textCol = textCol)
      .join(split.select(col(idCol).as("doc_a"), col("split").as("split_a")),
        "doc_a")
      .join(split.select(col(idCol).as("doc_b"), col("split").as("split_b")),
        "doc_b")
      .agg(
        count(lit(1)).as("n_pairs"),
        coalesce(sum(when(col("split_a") =!= col("split_b"), 1L)
          .otherwise(0L)), lit(0L)).as("n_cross"))
      .select(col("n_pairs"), col("n_cross"),
        when(col("n_pairs") > 0,
          col("n_cross").cast("double") / col("n_pairs")).as("leak_rate"))
  }

  /**
   * Deterministic k-fold assignment for cross-validation: fold =
   * reproducible id hash mod k — every document's fold is stable under
   * corpus growth, partitioning, and engine (the [[trainValSplit]]
   * property, generalized from a binary split to k folds). Emits the
   * input plus a `fold` column in [0, k). Compose with
   * [[Dedup.nearDupClusters]] ids (as [[clusterSplit]] does) when folds
   * must be leakage-free.
   */
  def kfoldSplit(docs: DataFrame, k: Int = 5,
                 idCol: String = "doc_id"): DataFrame = {
    require(k >= 2, s"need k >= 2 folds, got $k")
    docs.withColumn("fold",
      expr(s"graft_poly_hash(CAST($idCol AS STRING), 31, 1000000007) % $k"))
  }

  /**
   * Stratification-balance audit of a fold assignment — is every fold
   * a faithful miniature of the corpus class mix (a skewed fold makes
   * its validation round unrepresentative, the quiet way k-fold
   * numbers go wrong): per (fold, class), the class's permille share
   * WITHIN the fold against its corpus-wide share, and the signed
   * deviation. All integer permilles by truncating division. Emits
   * (foldCol, classCol, n, fold_permille, corpus_permille,
   * dev_permille).
   *
   * Scale: one corpus pass to the (folds × classes) cell frame; fold,
   * class, and corpus totals all derive from the cells — nothing
   * downstream rescans rows.
   */
  def foldBalance(df: DataFrame, foldCol: String = "fold",
                  classCol: String = "lang"): DataFrame = {
    val cell = df.groupBy(col(foldCol), col(classCol))
      .agg(count(lit(1)).as("n"))
    val foldTot = cell.groupBy(foldCol).agg(sum("n").as("__fn"))
    val clsTot = cell.groupBy(classCol).agg(sum("n").as("__cn"))
    val tot = cell.agg(sum("n").as("__tn"))
    cell.join(foldTot, Seq(foldCol))
      .join(broadcast(clsTot), Seq(classCol))
      .crossJoin(broadcast(tot))
      .select(col(foldCol), col(classCol), col("n"),
        expr("n * 1000 DIV __fn").as("fold_permille"),
        expr("__cn * 1000 DIV __tn").as("corpus_permille"),
        expr("n * 1000 DIV __fn - __cn * 1000 DIV __tn")
          .as("dev_permille"))
  }

  /**
   * Leakage-FREE train/validation split: hash the near-dup CLUSTER id
   * instead of the document id, so every member of a connected near-dup
   * cluster lands on the same side of the boundary — by construction,
   * [[splitLeakage]] on this assignment is exactly zero. This is the
   * split a benchmark-honest pipeline actually ships: [[trainValSplit]]
   * alone leaks whenever a val document has a training near-twin (the
   * classic eval-contamination failure). Emits
   * (idCol, cluster_id, split); singleton documents are their own
   * cluster, so their assignment matches the same hash rule applied to
   * their own id — corpus growth still never reshuffles old clusters'
   * assignments.
   *
   * Scale: [[Dedup.nearDupClusters]]' cost (the dedup pass the pipeline
   * already runs) plus one narrow hash projection — no extra shuffle.
   */
  def clusterSplit(docs: DataFrame, valPct: Int = 10, n: Int = 3,
                   numHashes: Int = 128, bands: Int = 32,
                   threshold: Double = 0.5, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    Dedup.nearDupClusters(docs, n, numHashes, bands, threshold, idCol,
      textCol)
      .withColumn("split",
        when(
          expr("graft_poly_hash(CAST(cluster_id AS STRING), 31, 1000000007) % 100")
            < valPct, lit("val"))
          .otherwise(lit("train")))

  /**
   * Mixing-recipe feasibility planner — the sizing report computed
   * BEFORE [[mixCorpus]] runs: per source, the available token mass,
   * the recipe's target share of the budget, the epochs (repeats, in
   * integer milli-epochs) needed to hit it, and whether the target is
   * reachable under the repeat cap — the "can this mix exist without
   * over-repeating a small source" audit that decides recipe
   * renegotiation (the practical constraint behind every published
   * data-mixture table). Emits one row per source:
   * (srcCol, n_docs, n_tokens, target_tokens, needed_epochs_milli,
   * epochs_milli, achieved_tokens, feasible); ceil-division for the
   * needed epochs so `feasible` is exact, not a floor artifact. All
   * BIGINT arithmetic.
   *
   * Scale: one token-count aggregate per source (map-side combined) —
   * the planning pass is one scan regardless of corpus size.
   */
  def mixPlanner(docs: DataFrame, weightsPermille: Map[String, Int],
                 defaultPermille: Int, tokenBudget: Long,
                 maxEpochsMilli: Long = 4000L,
                 srcCol: String = "source",
                 textCol: String = "text"): DataFrame = {
    require(tokenBudget >= 0 && defaultPermille >= 0 && maxEpochsMilli >= 0)
    val w: Column = weightsPermille.foldLeft(lit(defaultPermille.toLong)) {
      case (acc, (k, v)) =>
        when(col(srcCol) === k, lit(v.toLong)).otherwise(acc)
    }
    docs
      .withColumn("__n", size(TextFns.tokens(textCol)).cast("long"))
      .groupBy(srcCol)
      .agg(count(lit(1)).as("n_docs"), sum("__n").as("n_tokens"))
      .select(col(srcCol), col("n_docs"), col("n_tokens"), w.as("__w"))
      .withColumn("target_tokens", expr(s"(${tokenBudget}L * __w) DIV 1000"))
      .withColumn("needed_epochs_milli",
        when(col("target_tokens") === 0, lit(0L))
          .when(col("n_tokens") > 0,
            expr("(1000 * target_tokens + n_tokens - 1) DIV n_tokens")))
      .withColumn("epochs_milli",
        least(col("needed_epochs_milli"), lit(maxEpochsMilli)))
      .withColumn("achieved_tokens",
        least(col("target_tokens"),
          expr(s"(n_tokens * ${maxEpochsMilli}L) DIV 1000")))
      .withColumn("feasible",
        col("needed_epochs_milli").isNotNull &&
          col("needed_epochs_milli") <= maxEpochsMilli)
      .select(col(srcCol), col("n_docs"), col("n_tokens"),
        col("target_tokens"), col("needed_epochs_milli"),
        col("epochs_milli"), col("achieved_tokens"), col("feasible"))
  }

  /**
   * Per-group document quota (the RefinedWeb/Gopher-style per-domain
   * cap): keep at most `maxPerGroup` documents from each value of
   * `groupCol`, selected by the reproducible polynomial id hash (ties on
   * the id) rather than by id order — so the survivors are an unbiased,
   * run- and engine-stable sample of each group, and adding documents to
   * a group only ever displaces the highest-hash survivors. Emits
   * (idCol, groupCol) for the kept documents.
   *
   * Scale: the rank is a per-group window, but it runs on a NARROW
   * (group, hash, id) projection with the id list joined back to the
   * full rows afterward — the wide text/payload columns never ride
   * through the sort. A single pathological group (one domain = half the
   * corpus) still sorts in one task, but as 16-byte rows that spill; if
   * that is the workload, pre-thin with [[sampleStratified]] at a rate
   * near cap/count first — the hash ordering makes the two selections
   * consistent (both keep low-hash rows).
   */
  def capPerGroup(docs: DataFrame, groupCol: String, maxPerGroup: Int,
                  idCol: String = "doc_id"): DataFrame = {
    require(maxPerGroup >= 1, "maxPerGroup >= 1")
    val h = expr(s"graft_poly_hash(CAST($idCol AS STRING), 31, 1000000007)")
    val w = Window.partitionBy(groupCol).orderBy(h.asc, col(idCol).asc)
    docs.select(col(idCol), col(groupCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxPerGroup)
      .select(col(idCol), col(groupCol))
  }

  /**
   * Top-k corpus n-grams by document frequency — the corpus-level
   * vocabulary report (boilerplate detection, stop-shingle candidates for
   * [[Dedup.ngramJaccardPairs]]'s DF cap). Ties break on the n-gram
   * string, so top-k is deterministic. One hash-aggregate over exploded
   * distinct-per-doc shingles + a global top-k (TakeOrderedAndProject).
   */
  /**
   * DSIR importance weights (Xie et al., "Data Selection for Language
   * Models via Importance Resampling", NeurIPS 2023): score each RAW
   * document by how much more likely its hashed n-gram profile is under
   * the TARGET corpus's bucket distribution than under the raw corpus's
   * own — the published recipe for selecting in-domain pre-training
   * data without a trained classifier. Features are the paper's
   * unigrams + bigrams, hashed into `buckets` buckets (the
   * oracle-checkable polynomial hash, not a seeded hasher); each
   * bucket's log-likelihood ratio uses add-1 smoothing and is floored
   * to integer micro-units ONCE per bucket, so every document weight
   * is an associative BIGINT sum — engine-exact, like every scoring
   * path here. Emits (idCol, n_grams, dsir_weight_micro); a document
   * with no grams carries weight 0. Selection composes downstream:
   * top-k by weight, [[weightedSample]], or [[capPerGroup]].
   *
   * Scale: two corpus-side gram explosions reduce to bucket counts
   * (map-side partial aggregation, `buckets`-bounded frames); the
   * per-bucket LLR table is tiny and BROADCASTS into the per-document
   * sum — the raw corpus never shuffles on anything wider than the
   * final per-id aggregate.
   */
  def dsirWeights(raw: DataFrame, target: DataFrame, buckets: Int = 1024,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(buckets >= 2, "buckets >= 2")

    // Inherently two-pass over raw (pass 1: global bucket counts;
    // pass 2: per-doc scoring against the finished LLR table), each
    // pass ONE scan + ONE explode (unigrams and bigrams concat into a
    // single array — a union of two explodes would scan the corpus
    // twice per pass). The bucket-bounded count frames localCheckpoint
    // (the repo's small-frame/expensive-lineage pin rule): without it,
    // every consumer of the counts — the two totals and the two LLR
    // join legs — re-executes the whole corpus subtree, because HOF
    // lambdas defeat exchange-reuse canonicalization (measured: 10
    // documents scans in the executed plan; 4 after this shape).
    val docB = dsirGramBuckets(gramStream(raw, textCol, Seq(col(idCol))),
      buckets)
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("c"))
    val rawCnt = docB.groupBy("b").agg(sum("c").as("n")).localCheckpoint()
    val tgtCnt = dsirBucketCounts(target, buckets, textCol)
      .localCheckpoint()
    val llr = dsirLlrFromCounts(rawCnt, tgtCnt, buckets)
    val per = docB.join(broadcast(llr), Seq("b"))
      .groupBy(idCol)
      .agg(sum("c").as("n_grams"), sum(col("c") * col("w")).as("w"))
    raw.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("w"), lit(0L)).as("dsir_weight_micro"))
  }

  /** Attach the DSIR bucket id to a gram frame: the oracle-checkable
   * polynomial hash mod `buckets`. */
  private def dsirGramBuckets(gramsDf: DataFrame, buckets: Int): DataFrame =
    gramsDf.withColumn("b", expr(
      s"CAST(graft_poly_hash(g, 31, ${TextFns.HashMod}) % $buckets AS INT)"))
      .drop("g")

  /**
   * One corpus's DSIR bucket-count profile — (b, n) over the hashed
   * unigram+bigram stream. ADDITIVE: profiles of disjoint corpus slices
   * merge by plain summation per bucket, which is what makes the LLR
   * table incrementally maintainable (the [[graft.streaming.Streams
   * .dsirSink]] partials protocol).
   */
  def dsirBucketCounts(df: DataFrame, buckets: Int = 1024,
                       textCol: String = "text"): DataFrame =
    dsirGramBuckets(gramStream(df, textCol, Seq.empty), buckets)
      .groupBy("b").agg(count(lit(1)).as("n"))

  /** The DSIR feature stream: unigrams + bigrams in ONE explode per
   * scan (`concat` of the token array and its 2-shingles — a union of
   * two explodes would read the corpus twice). Empty docs contribute
   * no grams. */
  private def gramStream(df: DataFrame, textCol: String,
                         idCols: Seq[Column]): DataFrame =
    df.withColumn("__t", TextFns.tokens(textCol))
      .select(idCols :+ explode(
        concat(col("__t"), TextFns.shingles("__t", 2))).as("g"): _*)

  /**
   * The per-bucket DSIR log-likelihood-ratio table from two
   * [[dsirBucketCounts]] profiles — (b, w) for every bucket in
   * [0, buckets): `floor((ln((tc+1)·(R+B)) − ln((rc+1)·(T+B))) · 1e6)`
   * with add-1 smoothing. Both ln arguments are exact integer-valued
   * doubles (< 2^53), so the only rounding is the two lns and the
   * final floor — identical on the DuckDB side, which is what makes
   * every downstream document weight engine-exact.
   */
  def dsirLlrFromCounts(rawCounts: DataFrame, tgtCounts: DataFrame,
                        buckets: Int = 1024): DataFrame = {
    val totals = rawCounts.agg(coalesce(sum("n"), lit(0L)).as("R"))
      .crossJoin(tgtCounts.agg(coalesce(sum("n"), lit(0L)).as("T")))
    rawCounts.sparkSession.range(buckets)
      .select(col("id").cast("int").as("b"))
      .join(rawCounts.withColumnRenamed("n", "rc"), Seq("b"), "left")
      .join(tgtCounts.withColumnRenamed("n", "tc"), Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"), expr(
        s"""CAST(floor((ln((coalesce(tc, 0L) + 1L) * (R + $buckets))
           |          - ln((coalesce(rc, 0L) + 1L) * (T + $buckets)))
           |          * 1000000) AS BIGINT)""".stripMargin).as("w"))
  }

  def topNgrams(docs: DataFrame, n: Int = 3, k: Int = 20,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("__t", TextFns.tokens(textCol))
      .select(explode(array_distinct(TextFns.shingles("__t", n))).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("ngram").asc)
      .limit(k)

  /**
   * End-to-end intake pipeline — the full pre-training document intake as
   * ONE composed plan: exact dedup (keep lowest id per text) + quality
   * band ([[curate]]), then greedy near-dup removal (every verified
   * MinHash pair drops its higher id — the standard one-pass policy; use
   * [[graft.operators.Dedup.nearDupClusters]] when transitive cluster
   * membership matters), then the reproducible train/val split.
   * Emits (doc_id, n_tokens, split) for surviving documents.
   *
   * Scale: strictly the union of its parts — one dedup aggregate, narrow
   * quality predicates, O(n) banded candidates + verification on the
   * already-curated survivor set (run the expensive near-dup stage on the
   * smallest frame), one anti-join, one narrow split projection.
   */
  def intakePipeline(docs: DataFrame, minTokens: Int = 10,
                     maxTokens: Int = 2000, minAlphaRatio: Double = 0.5,
                     valPct: Int = 10, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val curated = curate(docs, minTokens, maxTokens, minAlphaRatio, idCol, textCol)
    val kept = docs.join(curated.select(idCol), idCol)
    val pairs = Dedup.minhashLshPairs(kept, idCol = idCol, textCol = textCol)
    val survivors = curated.join(
      pairs.select(col("doc_b").as(idCol)).distinct(), Seq(idCol), "left_anti")
    trainValSplit(survivors, valPct, idCol)
      .select(col(idCol), col("n_tokens"), col("split"))
  }

  /**
   * Deterministic source upsampling — the complement of [[mixCorpus]]:
   * repeat each document `weightPermille / 1000` times, with the
   * fractional remainder resolved per document by the reproducible id
   * hash (weight 2500 = every doc twice, and the stable half of each
   * source a third time). Emits one row per replica:
   * (idCol, srcCol, replica), replica 0-based — downstream shuffling
   * ([[shuffleCorpus]] keyed by (id, replica)) interleaves the copies.
   *
   * A seeded `sample(withReplacement)` gives none of this: its copies
   * move with partitioning and its fraction drifts per run. One narrow
   * generate, no shuffle.
   */
  def upsampleCorpus(docs: DataFrame, weightsPermille: Map[String, Int],
                     defaultPermille: Int = 1000,
                     srcCol: String = "source",
                     idCol: String = "doc_id"): DataFrame = {
    require(defaultPermille >= 0 &&
      weightsPermille.values.forall(_ >= 0), "weights >= 0")
    val w: Column = weightsPermille.foldLeft(lit(defaultPermille.toLong)) {
      case (acc, (k, v)) => when(col(srcCol) === k, lit(v.toLong)).otherwise(acc)
    }
    docs.select(col(idCol), col(srcCol))
      .withColumn("__w", w)
      // LCG-mixed hash (see shuffleCorpus): the raw polynomial hash is
      // monotonic on short keys, which skews `% 1000` badly on small-id
      // corpora — the mix step makes the fractional selector uniform
      .withColumn("__n", expr("__w div 1000") +
        when(
          expr(s"(graft_poly_hash(CAST($idCol AS STRING), 31, 1000000007)" +
            " * 1103515245 + 12345) % 2147483647")
            % 1000 < expr("__w % 1000"), 1L).otherwise(0L))
      .filter(col("__n") > 0)
      .select(col(idCol), col(srcCol),
        explode(expr("sequence(0, __n - 1)")).as("replica"))
  }

  /**
   * Percentile-band quality selection: keep the documents whose
   * [[TextAnalysis.qualityScore]] falls inside a corpus-relative
   * percentile band — selection by quantile rather than an absolute
   * threshold, so the filter keeps the same FRACTION as score
   * distributions drift between crawls (the production framing of
   * "drop the worst X%"). Ranks are percent_rank semantics ordered by
   * (score, id) — the id tie-break makes band edges deterministic.
   * Emits (idCol, quality_score, pct_rank) for kept documents.
   *
   * Scale: an UNPARTITIONED window would sort the whole corpus in one
   * task, so the rank is assembled instead: range-exchange on the sort
   * key (parallel, the same shape as any total sort), `row_number`
   * WITHIN each range partition, plus each partition's exact global
   * offset. The offsets come from a per-partition count aggregate —
   * numShufflePartitions rows — so the only unpartitioned window runs
   * over that tiny frame, never the corpus, and the offset join is a
   * broadcast. (score, id) is unique, so rank = row_number and
   * percent_rank = (global_rank - 1) / (n - 1) exactly.
   */
  def qualityBand(docs: DataFrame, minPct: Double = 10.0,
                  maxPct: Double = 100.0,
                  idCol: String = "doc_id"): DataFrame = {
    require(minPct <= maxPct, "minPct <= maxPct")
    val ranged = TextAnalysis.qualityScore(docs, idCol)
      .select(col(idCol), col("quality_score"))
      .repartitionByRange(col("quality_score").asc, col(idCol).asc)
      .withColumn("__pid", spark_partition_id())
    val perPart = Window.partitionBy("__pid")
      .orderBy(col("quality_score").asc, col(idCol).asc)
    val tiny = Window.orderBy("__pid")
    val offsets = ranged.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .select(col("__pid"),
        coalesce(sum("__cnt").over(
          tiny.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("__off"),
        sum("__cnt").over(
          tiny.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)).as("__n"))
    ranged
      .withColumn("__rn", row_number().over(perPart).cast("long"))
      .join(broadcast(offsets), "__pid")
      .withColumn("pct_rank", round(
        when(col("__n") > 1L,
          (col("__off") + col("__rn") - 1L).cast("double")
            / (col("__n") - 1L).cast("double") * 100)
          .otherwise(0.0), 6))
      .filter(col("pct_rank") >= minPct && col("pct_rank") <= maxPct)
      .select(col(idCol), col("quality_score"), col("pct_rank"))
  }

  /**
   * Per-source quality calibration: rank documents by
   * [[TextAnalysis.qualityScore]] WITHIN each source and drop the worst
   * `dropPermille`‰ of every source independently — the FineWeb-style
   * per-dump threshold. A single global cutoff lets one
   * systematically-low-scoring source (different boilerplate, different
   * language mix) absorb the whole drop budget; calibrating per source
   * removes the same fraction everywhere, which is the behavior that
   * survives distribution drift between crawls. Emits every document as
   * (idCol, srcCol, quality_score, src_rank, n_src, kept) — rank 1 = the
   * source's worst document; callers filter on `kept`.
   *
   * Exactness: ranks are integers ordered by the engine-invariant
   * (quality_score, id) key, and the cutoff `src_rank > floor(n_src ·
   * p/1000)` is evaluated on BIGINTs — no percentile float crosses an
   * engine boundary.
   *
   * Scale: grouped ranks come from [[Relational.groupedRanks]] (the
   * assembled-rank shape of [[qualityBand]], generalized to groups) —
   * no single task ever sorts a whole source.
   */
  def qualityCalibrate(docs: DataFrame, dropPermille: Int = 100,
                       srcCol: String = "source",
                       idCol: String = "doc_id"): DataFrame = {
    val scored = docs.select(col(idCol), col(srcCol))
      .join(TextAnalysis.qualityScore(docs, idCol)
        .select(col(idCol), col("quality_score")), idCol :: Nil)
    Relational.groupedRanks(scored, srcCol,
      Seq(col("quality_score").asc, col(idCol).asc), "src_rank", "n_src")
      .withColumn("kept",
        col("src_rank") > floor(col("n_src") * dropPermille / 1000))
      .select(col(idCol), col(srcCol), col("quality_score"),
        col("src_rank"), col("n_src"), col("kept"))
  }

  /**
   * Context-window chunking: split each document's token stream into
   * windows of `chunkTokens` starting every `chunkTokens - overlapTokens`
   * positions (trailing chunks may be short; consecutive chunks share
   * `overlapTokens` tokens — the standard long-document preprocessing
   * for a bounded-context model). Emits one row per chunk:
   * (idCol, chunk_id, n_chunk_tokens, chunk_text), chunk ids 0-based in
   * document order. Empty/whitespace documents produce no chunks.
   *
   * Scale: a single generate (chunk starts per doc) + slice projection —
   * no shuffle at all; chunk rows inherit the input partitioning. The
   * token array is built once per document and sliced per chunk.
   */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 512,
                     overlapTokens: Int = 64,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(chunkTokens >= 1 && overlapTokens >= 0
      && overlapTokens < chunkTokens,
      "need 0 <= overlapTokens < chunkTokens")
    val step = chunkTokens - overlapTokens
    docs
      .withColumn("__t", TextFns.tokens(textCol))
      .withColumn("__n", size(col("__t")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__t"),
        posexplode(expr(s"sequence(0, __n - 1, $step)")))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        expr(s"slice(__t, col + 1, $chunkTokens)").as("__c"))
      .select(col(idCol), col("chunk_id"),
        size(col("__c")).cast("long").as("n_chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /**
   * Content-defined chunking (CDC): split a document after every token
   * whose reproducible polynomial hash is ≡ 0 (mod `avgTokens`), giving
   * chunks of `avgTokens` expected length whose boundaries depend only on
   * LOCAL content. That is the property fixed windows lack: inserting a
   * token early in a document shifts every downstream fixed window (so
   * all its chunks re-hash as "new" in chunk-level dedup), while CDC
   * boundaries after the edit point are unchanged — the rolling-hash
   * cut-point idea of LBFS/FastCDC applied at token granularity, which is
   * what makes chunk-level dedup stable on mutable corpora.
   *
   * Scale: one explode + one per-document window (document-bounded
   * partitions, never corpus-wide) + one hash aggregate back to chunks.
   * The boundary hash is the same fold the DuckDB oracle recomputes, so
   * chunk boundaries are engine- and partitioning-invariant.
   *
   * Emits (idCol, chunk_id, n_chunk_tokens, chunk_text); documents with
   * zero tokens are skipped (no chunks exist).
   */
  def cdcChunks(docs: DataFrame, avgTokens: Int = 16, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    require(avgTokens >= 2, "avgTokens >= 2")
    val w = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("__t", TextFns.tokens(textCol))
      .filter(size(col("__t")) > 0)
      .select(col(idCol).as("id"), posexplode(col("__t")))
      .withColumn("__b",
        (expr(s"${TextFns.polyHashFragment("col", 31, TextFns.HashMod)}")
          % avgTokens === 0).cast("long"))
      // chunk index = boundary tokens strictly BEFORE this one
      .withColumn("chunk_id", coalesce(sum("__b").over(w), lit(0L)))
      .groupBy(col("id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_chunk_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("col")))),
          s => s("col")), " ").as("chunk_text"))
      .select(col("id").as(idCol), col("chunk_id"),
        col("n_chunk_tokens"), col("chunk_text"))
  }

  /**
   * Deterministic corpus mixing to a token budget: given per-source
   * mixture weights (permille) and a total token budget, keep a
   * reproducible-hash sample of each source sized so its kept tokens
   * approximate `budget * weight / 1000` — the "data mixing" step that
   * turns raw source dumps into a recipe-weighted training corpus.
   *
   * All arithmetic is exact integer (targets and keep-rates by floor
   * division, selection by the polynomial id hash), so the kept set is
   * run-, engine-, and partitioning-invariant, and sources larger than
   * their target thin down while sources at or under it keep everything
   * (rate caps at 100%). Keep-rate granularity is 1% — the standard
   * hash-bucket tradeoff ([[sampleStratified]]).
   *
   * Scale: one per-source token aggregate (tiny — source-cardinality),
   * broadcast back as the rate dimension; selection is a narrow filter.
   * No driver round-trip.
   */
  def mixCorpus(docs: DataFrame, weightsPermille: Map[String, Int],
                defaultPermille: Int, tokenBudget: Long,
                srcCol: String = "source", idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    require(tokenBudget >= 0 && defaultPermille >= 0)
    val tok = docs.withColumn("__n",
      size(TextFns.tokens(textCol)).cast("long"))
    val w: Column = weightsPermille.foldLeft(lit(defaultPermille.toLong)) {
      case (acc, (k, v)) => when(col(srcCol) === k, lit(v.toLong)).otherwise(acc)
    }
    val rates = tok.groupBy(srcCol).agg(sum(col("__n")).as("__t"))
      .withColumn("__w", w)
      .withColumn("__target", expr(s"($tokenBudget * __w) div 1000"))
      .withColumn("__rate",
        least(lit(100L), when(col("__t") > 0,
          expr("(100 * __target) div __t")).otherwise(lit(0L))))
      .select(col(srcCol), col("__rate"))
    tok.join(broadcast(rates), srcCol)
      .filter(
        expr(s"graft_poly_hash(CAST($idCol AS STRING), 31, 1000000007) % 100")
          < col("__rate"))
      .select(col(idCol), col(srcCol), col("__n").as("n_tokens"))
  }

  /**
   * One-row dataset card: the corpus summary a dataset release ships —
   * document/token totals, exact vocabulary size, exact-duplicate rate,
   * and the language mix as a deterministic `lang:count` string (sorted
   * by language; scalar-typed row end to end). Every figure is exact
   * integer arithmetic or a division of exact integers, so the card is
   * engine- and partitioning-invariant.
   *
   * Scale: three independent aggregates (doc stats, exploded-vocab
   * distinct, language rollup) cross-joined as 1-row frames. Vocabulary
   * uses countDistinct over exploded tokens — one shuffle of the token
   * stream; swap in the KMV sketch ([[graft.functions.KmvSketch]]) when
   * an estimate is acceptable at 100 TB.
   */
  def datasetCard(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  langCol: String = "lang"): DataFrame = {
    val vocab = docs
      .select(explode(TextFns.tokens(textCol)).as("__tok"))
      .agg(countDistinct(col("__tok")).as("vocab"))
    cardBase(docs, textCol).crossJoin(vocab)
      .crossJoin(cardLangs(docs, langCol))
      .select(col("n_docs"), col("n_tokens"), col("vocab"),
        col("n_dup_docs"), col("dup_rate"), col("mean_tokens"),
        col("lang_counts"))
  }

  /**
   * [[datasetCard]] with the vocabulary measured by the KMV sketch
   * instead of an exact countDistinct — the 100 TB variant the exact
   * card's scaladoc promises. The exact vocab is one shuffle of the
   * full distinct token stream; the sketch replaces it with a single
   * aggregate whose partial buffers never exceed `k` longs (map-side
   * combined — NO token shuffle: only ≤ k-long buffers move), at a
   * relative error ~1/√(k−2) (~6% at k = 256, Beyer et al. SIGMOD'07).
   * The hashes are the reproducible polynomial, so the estimate is
   * bit-deterministic across partitionings and engines and the oracle
   * recomputes it closed-form (the k smallest distinct hashes). All
   * other card figures stay exact; `vocab_estimate` is DOUBLE by
   * contract (it is an estimate, not a count).
   */
  def datasetCardSketch(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text",
                        langCol: String = "lang",
                        k: Int = 256): DataFrame = {
    val kmv = graft.functions.KmvSketch.udaf(k)
    val vocab = docs
      .select(explode(TextFns.tokens(textCol)).as("__tok"))
      .select(TextFns.polyHash("__tok").as("__h"))
      .agg(kmv(col("__h")).as("vocab_estimate"))
    cardBase(docs, textCol).crossJoin(vocab)
      .crossJoin(cardLangs(docs, langCol))
      .select(col("n_docs"), col("n_tokens"), col("vocab_estimate"),
        col("n_dup_docs"), col("dup_rate"), col("mean_tokens"),
        col("lang_counts"))
  }

  /** Shared 1-row doc-stats aggregate of the dataset cards. */
  private def cardBase(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("__n", size(TextFns.tokens(textCol)).cast("long"))
      .agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("__n")), lit(0L)).as("n_tokens"),
        countDistinct(col(textCol)).as("n_distinct_texts"))
      .withColumn("n_dup_docs", col("n_docs") - col("n_distinct_texts"))
      .withColumn("dup_rate",
        when(col("n_docs") > 0,
          col("n_dup_docs").cast("double") / col("n_docs"))
          .otherwise(lit(0.0)))
      .withColumn("mean_tokens",
        when(col("n_docs") > 0,
          col("n_tokens").cast("double") / col("n_docs"))
          .otherwise(lit(0.0)))

  /** Shared 1-row sorted `lang:count` rollup of the dataset cards. */
  private def cardLangs(docs: DataFrame, langCol: String): DataFrame =
    docs.groupBy(col(langCol).as("__lang"))
      .agg(count(lit(1)).as("__c"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__lang"), col("__c")))),
        s => concat(s("__lang"), lit(":"), s("__c").cast("string"))), ",")
        .as("lang_counts"))

  /**
   * Snapshot diff for dataset versioning: which documents were added,
   * removed, or changed between two corpus snapshots keyed by `idCol`.
   * "Changed" means the 63-bit content hash of `textCol` differs — the
   * full-outer join carries only (id, hash, presence), never the text,
   * so a 100 TB snapshot pair diffs with 17-byte shuffle rows. The hash
   * is the reproducible composite polynomial ([[TextFns.token63Fragment]]),
   * so the diff is engine- and run-stable (and oracle-checkable);
   * unchanged documents are filtered out (a diff is sparse by contract).
   * Emits (idCol, status) with status in added | removed | changed.
   */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    def sideFrame(df: DataFrame, h: String, p: String) = df.select(
      col(idCol).as("id"),
      expr(TextFns.token63Fragment(textCol)).as(h), lit(1).as(p))
    sideFrame(oldDocs, "ho", "po")
      .join(sideFrame(newDocs, "hn", "pn"), Seq("id"), "full_outer")
      .withColumn("status",
        when(col("po").isNull, "added")
          .when(col("pn").isNull, "removed")
          .when(!(col("ho") <=> col("hn")), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(col("id").as(idCol), col("status"))
  }

  /**
   * Deterministic, epoch-aware corpus shuffle for training order: each
   * epoch orders documents by the reproducible hash of (id, epoch), so
   * every epoch sees an independent permutation, every run/engine/
   * cluster-size sees the SAME permutation, and resuming mid-epoch is
   * just a key-range predicate. Emits (idCol, shuffle_key) sorted by
   * (shuffle_key, id).
   *
   * The polynomial hash alone is monotonic on short keys (it only mixes
   * once its value wraps the modulus), which would leave a small-id
   * corpus nearly unshuffled — so the key takes one LCG mixing step
   * (`(h * 1103515245 + 12345) mod 2^31-1`) after it: adjacent hashes
   * land far apart, and the arithmetic stays exact 64-bit integer on
   * every engine (max product ~1.1e18 < 2^63).
   *
   * Scale: the sort is a range exchange (total order across output
   * files without a single-partition sort); the key is computed in one
   * narrow projection. This replaces `ORDER BY rand()` — which is
   * neither reproducible nor resumable — as the shuffle stage of an
   * intake pipeline.
   */
  /** The epoch-aware reproducible shuffle key: poly-hash of `id:eN`
   * mixed through one LCG step. ONE definition — shuffleCorpus and both
   * intake pipelines share it, and its DuckDB twin is duplicated only in
   * the oracle strings (any change here must update those twins). */
  private def shuffleKeyExpr(idCol: String, epoch: Int): Column =
    expr(s"(graft_poly_hash(CAST($idCol AS STRING) || ':e$epoch', " +
      "31, 1000000007) * 1103515245 + 12345) % 2147483647")

  def shuffleCorpus(docs: DataFrame, epoch: Int = 0,
                    idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      shuffleKeyExpr(idCol, epoch).as("shuffle_key"))
      .orderBy(col("shuffle_key"), col(idCol))

  /**
   * Token-length histogram in power-of-two buckets — the
   * padding-efficiency report batch assembly needs (docs batched within
   * a bucket pad to at most 2x their own length). `bucket` =
   * bit-length of the token count (`length(bin(n))`, so 1..1→1, 2..3→2,
   * 4..7→3, …) — integer arithmetic only, no transcendental log2 whose
   * last-ulp could flip a boundary between engines. One narrow
   * projection + one tiny hash aggregate.
   */
  def lengthBuckets(docs: DataFrame,
                    textCol: String = "text"): DataFrame =
    docs
      .withColumn("__n", size(TextFns.tokens(textCol)).cast("long"))
      .withColumn("bucket", length(bin(col("__n"))).cast("long"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n")).as("total_tokens"),
        min(col("__n")).as("min_tokens"),
        max(col("__n")).as("max_tokens"))
      .select(col("bucket"), col("n_docs"), col("total_tokens"),
        col("min_tokens"), col("max_tokens"))

  /**
   * The v2 end-to-end intake: the modern pre-training recipe as ONE
   * composed plan — quality curation ([[curate]]), per-source quota
   * ([[capPerGroup]]), greedy MinHash near-dup removal, the
   * reproducible train/val split, and the epoch-aware shuffle key —
   * emitting (doc_id, source, n_tokens, split, shuffle_key) for
   * surviving documents, ready to range-sort and write.
   *
   * Stage order is the cost order: cheap narrow filters first, the
   * quota next (bounds every later stage by sources × cap), the
   * expensive near-dup candidate join only on the capped survivor set.
   * Every stage is individually oracle-checked elsewhere; this query's
   * oracle recomputes the whole chain in one CTE pipeline.
   */
  def intakePipelineV2(docs: DataFrame, minTokens: Int = 10,
                       maxTokens: Int = 2000, minAlphaRatio: Double = 0.5,
                       maxPerSource: Int = 15, valPct: Int = 10,
                       epoch: Int = 1, idCol: String = "doc_id",
                       textCol: String = "text",
                       srcCol: String = "source"): DataFrame = {
    val curated = curate(docs, minTokens, maxTokens, minAlphaRatio,
      idCol, textCol)
    val withSrc = docs.select(col(idCol), col(srcCol)).join(curated, idCol)
    val capped = withSrc.join(
      capPerGroup(withSrc, srcCol, maxPerSource, idCol).select(idCol), idCol)
    val keptDocs = docs.join(capped.select(idCol), idCol)
    val pairs = Dedup.minhashLshPairs(keptDocs, idCol = idCol,
      textCol = textCol)
    val survivors = capped.join(
      pairs.select(col("doc_b").as(idCol)).distinct(), Seq(idCol), "left_anti")
    trainValSplit(survivors, valPct, idCol)
      .withColumn("shuffle_key", shuffleKeyExpr(idCol, epoch))
      .select(col(idCol), col(srcCol), col("n_tokens"), col("split"),
        col("shuffle_key"))
  }

  /**
   * The v3 intake recipe — v2's skeleton with the round-6 model-based
   * quality stages swapped in: the Gopher rule battery
   * ([[TextAnalysis.gopherRules]]) replaces the single alpha-ratio
   * heuristic, and an in-corpus bigram-LM floor
   * ([[TextAnalysis.lmScore]] >= `minLm`) replaces nothing the v2 chain
   * had — it is the perplexity-filter stage modern recipes add. Then
   * exact dedup (first-id winner per identical text), the per-source
   * quota, and the reproducible split + epoch shuffle key.
   *
   * LM scores are computed against the FULL corpus counts before any
   * filtering — the scoring model is fixed first, the way a shipped
   * perplexity filter is trained once and then applied — so the floor
   * is stable under reordering of the other stages. Stage order is cost
   * order: both model filters are aggregate-light and run before the
   * joins; the quota bounds the output at sources × cap.
   */
  def intakePipelineV3(docs: DataFrame, minWords: Int = 20,
                       maxWords: Int = 100000, minLm: Double = -3.4,
                       maxPerSource: Int = 15, valPct: Int = 10,
                       epoch: Int = 1, idCol: String = "doc_id",
                       textCol: String = "text",
                       srcCol: String = "source"): DataFrame = {
    val gr = TextAnalysis.gopherRules(docs, idCol, minWords, maxWords)
      .filter(col("pass"))
      .select(col(idCol), col("n_words"))
    val lm = TextAnalysis.lmScore(docs, idCol)
      .filter(col("lm_score") >= minLm)
      .select(col(idCol), col("lm_score"))
    val keepers = docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol)).select(col(idCol))
    val kept = docs.select(col(idCol), col(srcCol))
      .join(gr, Seq(idCol))
      .join(lm, Seq(idCol))
      .join(keepers, Seq(idCol), "left_semi")
    val capped = kept.join(
      capPerGroup(kept, srcCol, maxPerSource, idCol).select(col(idCol)),
      Seq(idCol))
    trainValSplit(capped, valPct, idCol)
      .withColumn("shuffle_key", shuffleKeyExpr(idCol, epoch))
      .select(col(idCol), col(srcCol), col("n_words"), col("lm_score"),
        col("split"), col("shuffle_key"))
  }

  /**
   * Composed curation pass: drop exact duplicates (keep the lowest id per
   * text), keep documents inside a token-count band with enough alphabetic
   * content. The shape of a real intake filter: one dedup aggregate plus
   * narrow predicates, all oracle-checkable.
   */
  def curate(docs: DataFrame, minTokens: Int = 10, maxTokens: Int = 2000,
             minAlphaRatio: Double = 0.5, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    val keepers = docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    docs.join(keepers, idCol)
      .withColumn("__t", TextFns.tokens(textCol))
      .withColumn("n_tokens", size(col("__t")).cast("long"))
      .filter(col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("__alpha",
        length(regexp_replace(col(textCol), "[^a-zA-Z]", "")).cast("double"))
      .filter(col("__alpha") / greatest(length(col(textCol)), lit(1)) >= minAlphaRatio)
      .select(col(idCol), col("n_tokens"))
  }

  /**
   * Binary-classifier ROC AUC by the Mann–Whitney rank-sum identity, in
   * exact integer arithmetic: AUC = P(score_pos > score_neg) + ½·P(tie).
   * The curation use: score every document with a cheap quality/language
   * heuristic, label a held-out slice, and gate the classifier's
   * deployment on its AUC — the standard eval before a scorer is allowed
   * to drop corpus mass. Emits ONE row
   * (n_pos, n_neg, n_tie_pairs, auc_micro) with
   * `auc_micro = (2·wins + ties)·1 000 000 DIV (2·n_pos·n_neg)` — every
   * quantity a BIGINT, so the result is partition- and engine-invariant
   * (no float ranks, no averaged-tie-rank doubles). NULL `auc_micro`
   * when either class is empty (ANSI-safe; the oracle mirrors the CASE).
   *
   * Scale: one hash-aggregate collapses the corpus to its DISTINCT score
   * values (p = positives, q = negatives per score); the cumulative
   * negatives-below pass then runs over that collapsed frame via
   * [[graft.operators.Relational.rangedCumSums]] (range-partitioned
   * per-partition sums + broadcast offsets) — NO single-task window, so
   * a caller passing raw high-cardinality scores degrades to a normal
   * shuffle, not a one-task funnel. Integer heuristic scores keep the
   * frame KB-sized anyway; a continuous-score classifier must be
   * bucketed (micro-units) before this operator — which its caller
   * already does, because floats crossing an engine boundary are banned
   * corpus-wide.
   */
  def classifierAuc(scored: DataFrame, scoreCol: String,
                    labelCol: String): DataFrame = {
    val g = scored
      .select(col(scoreCol).cast("long").as("__s"),
        when(col(labelCol), 1L).otherwise(0L).as("__y"))
      .groupBy("__s")
      .agg(sum(col("__y")).as("__p"),
        sum(lit(1L) - col("__y")).as("__q"))
    // negatives STRICTLY below = inclusive running sum minus own count
    graft.operators.Relational.rangedCumSums(g, Nil, Seq(col("__s").asc),
        Seq(("__q", "__cqi", "__qt")))
      .withColumn("__cq", col("__cqi") - col("__q"))
      .agg(sum(col("__p")).as("n_pos"),
        sum(col("__q")).as("n_neg"),
        sum(col("__p") * col("__q")).as("n_tie_pairs"),
        sum(col("__p") * (lit(2L) * col("__cq") + col("__q"))).as("__num"))
      .select(coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_neg"), lit(0L)).as("n_neg"),
        coalesce(col("n_tie_pairs"), lit(0L)).as("n_tie_pairs"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("__num * 1000000 DIV (2 * n_pos * n_neg)"))
          .as("auc_micro"))
  }

  /**
   * Per-group [[classifierAuc]] — the scorer eval sliced by
   * source/slice: a classifier can rank well corpus-wide while being
   * no better than chance on one source (exactly the slice whose mass
   * it then mis-drops), so deployment gates check the WORST slice, not
   * the average. One row per group with the same exact-integer
   * Mann–Whitney statistic [[classifierAuc]] reports on that group's
   * rows alone; single-class groups read auc_micro = null.
   *
   * Scale: one hash-aggregate to (group, score) cells, then the grouped
   * assembled cumulative pass ([[graft.operators.Relational
   * .rangedCumSums]]) — no single-task window at any group/score
   * cardinality.
   */
  def classifierAucByGroup(scored: DataFrame, scoreCol: String,
                           labelCol: String, grpCol: String): DataFrame = {
    val g = scored
      .select(col(grpCol).as("__g"), col(scoreCol).cast("long").as("__s"),
        when(col(labelCol), 1L).otherwise(0L).as("__y"))
      .groupBy("__g", "__s")
      .agg(sum(col("__y")).as("__p"),
        sum(lit(1L) - col("__y")).as("__q"))
    graft.operators.Relational.rangedCumSums(g, Seq("__g"),
        Seq(col("__s").asc), Seq(("__q", "__cqi", "__qt")))
      .withColumn("__cq", col("__cqi") - col("__q"))
      .groupBy("__g")
      .agg(sum(col("__p")).as("n_pos"),
        sum(col("__q")).as("n_neg"),
        sum(col("__p") * col("__q")).as("n_tie_pairs"),
        sum(col("__p") * (lit(2L) * col("__cq") + col("__q"))).as("__num"))
      .select(col("__g").as(grpCol), col("n_pos"), col("n_neg"),
        col("n_tie_pairs"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("__num * 1000000 DIV (2 * n_pos * n_neg)"))
          .as("auc_micro"))
  }

  /**
   * Calibration curve (reliability diagram) in exact integers: bucket
   * the integer score range into `buckets` equal-width bins over the
   * observed [min, max] and report each bin's size and positive rate —
   * [[classifierAuc]] says whether a scorer RANKS well; this says
   * whether its magnitudes mean anything (monotone, roughly linear
   * pos_permille across bins = calibrated; a cliff = the scorer is a
   * thresholded feature). Emits one row per NON-EMPTY bin:
   * (bin, score_lo, score_hi, n, n_pos, pos_permille) with
   * `pos_permille = n_pos·1000 DIV n` and [score_lo, score_hi] the
   * bin's closed integer score range.
   *
   * Scale: the [min, max] bounds ride a broadcast 1-row aggregate (the
   * zorderLayout pattern), bin assignment is a narrow integer
   * projection `(s − min)·buckets DIV (max − min + 1)`, and the result
   * is one hash-aggregate on ≤ `buckets` groups. A constant score
   * degenerates to a single bin 0, not a division error.
   */
  def calibrationCurve(scored: DataFrame, scoreCol: String,
                       labelCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val base = scored.select(col(scoreCol).cast("long").as("__s"),
      when(col(labelCol), 1L).otherwise(0L).as("__y"))
    val bounds = base.agg(min(col("__s")).as("__lo"),
      max(col("__s")).as("__hi"))
    base.crossJoin(broadcast(bounds))
      .withColumn("bin",
        expr(s"(__s - __lo) * $buckets DIV (__hi - __lo + 1)"))
      .groupBy("bin")
      .agg(min(col("__s")).as("score_lo"), max(col("__s")).as("score_hi"),
        count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
      .withColumn("pos_permille", expr("n_pos * 1000 DIV n"))
      .select("bin", "score_lo", "score_hi", "n", "n_pos", "pos_permille")
  }

  /**
   * Two-sample Kolmogorov–Smirnov drift statistic in exact integers —
   * the distribution-shift monitor a corpus pipeline runs between
   * ingest generations (did the length / quality / score distribution
   * move?): D = max over x of |F_a(x) − F_b(x)| = `d_cross / (n_a·n_b)`
   * where `d_cross = max |cum_a(x)·n_b − cum_b(x)·n_a|` is an exact
   * BIGINT (no float CDFs, so the result is bit-stable across
   * partitionings and engines); `d_micro` is the floored micro-unit D.
   *
   * Scale: one hash-aggregate per side collapses each corpus to
   * per-VALUE counts — the only corpus-sized pass, map-side combined.
   * The cumulative window then runs over DISTINCT values only; a
   * drifting metric column is quantized (the caller passes an integer
   * metric, e.g. micro-units), so the ordered pass is value-space-sized,
   * not corpus-sized. Emits one row:
   * (n_a, n_b, n_values, d_cross, d_micro).
   */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: String): DataFrame =
    ksDriftFromCounts(valueCounts(a, valueCol), valueCounts(b, valueCol))

  /** Per-value BIGINT counts of `valueCol` — the reduced form both
   * [[ksDrift]] sides collapse to, and the PERSISTABLE reference state
   * for the streaming drift monitor (aggregate the reference corpus
   * once, compare every batch against the counts): (v, n).
   *
   * Nulls (and values the long cast nulls out) are DROPPED: a KS
   * statistic is over an ordered value domain, and a null bucket would
   * silently sort first — entering the cumulative sums as "the
   * smallest value" and skewing D. The drift statistic is therefore
   * over NON-NULL values only; callers tracking null-rate drift should
   * monitor it as its own counter, not smuggled into the CDF. */
  def valueCounts(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("n"))

  /** [[ksDrift]] with BOTH sides already reduced to [[valueCounts]]
   * frames — the streaming shape, where the reference is a persisted
   * counts table and the observed side accumulates per batch.
   *
   * Overflow posture (the cross term reaches n_a·n_b, and corpora at
   * 100 TB can push that and d_cross·10⁶ past BIGINT): the cross term
   * and the micro quotient compute in DECIMAL(38,0) — exact to 10³⁸ —
   * so `d_micro` (≤ 10⁶ by construction) is ALWAYS exact; `d_cross` is
   * reported as BIGINT via try_cast and reads null, not garbage, in
   * the (n_a·n_b > 2⁶³) regime where it cannot fit.
   *
   * The cumulative sums ride [[graft.operators.Relational
   * .rangedCumSums]] — range-partitioned per-partition sums with
   * broadcast offsets — NOT an unpartitioned window: the operator
   * accepts any long-castable column, and a caller passing raw
   * (unquantized) values would otherwise funnel corpus-cardinality
   * distinct values through one task. Totals fall out of the same
   * offsets frame, so there is still no second scan and no crossJoin.
   */
  def ksDriftFromCounts(aCounts: DataFrame,
                        bCounts: DataFrame): DataFrame = {
    def shape(df: DataFrame, as: String) =
      df.select(col("v").cast("long").as("__v"),
        col("n").cast("long").as(as))
    val merged = shape(aCounts, "__ca").join(shape(bCounts, "__cb"),
        Seq("__v"), "full_outer")
      .select(col("__v"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val dec = "decimal(38,0)"
    graft.operators.Relational.rangedCumSums(merged, Nil,
        Seq(col("__v").asc),
        Seq(("__ca", "__cumaL", "__naL"), ("__cb", "__cumbL", "__nbL")))
      .select(
        col("__cumaL").cast(dec).as("__cuma"),
        col("__cumbL").cast(dec).as("__cumb"),
        col("__naL").cast(dec).as("__na"),
        col("__nbL").cast(dec).as("__nb"))
      .agg(max(col("__na")).as("__naM"), max(col("__nb")).as("__nbM"),
        count(lit(1)).as("n_values"),
        coalesce(max(abs(col("__cuma") * col("__nb") -
            col("__cumb") * col("__na"))),
          lit(0L).cast(dec)).as("__dc"))
      .select(
        coalesce(col("__naM"), lit(0L).cast(dec)).cast("long").as("n_a"),
        coalesce(col("__nbM"), lit(0L).cast(dec)).cast("long").as("n_b"),
        col("n_values"), col("__dc"))
      .withColumn("d_cross", expr("try_cast(__dc AS BIGINT)"))
      .withColumn("d_micro",
        when(col("n_a") > 0 && col("n_b") > 0, expr(
          "CAST((__dc * 1000000) DIV " +
            "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")))
      .select("n_a", "n_b", "n_values", "d_cross", "d_micro")
  }

  /**
   * Per-group two-sample KS drift — [[ksDrift]] sliced by a group
   * column: real pipelines watch distribution shift PER SOURCE or per
   * slice, not only corpus-wide (one upstream feed going bad hides
   * inside a whole-corpus statistic). Emits one row per group present
   * in EITHER side: (grpCol, n_a, n_b, n_values, d_cross, d_micro),
   * each group's statistic identical to what [[ksDrift]] would report
   * on that group's rows alone; a group present in only one side reads
   * d_cross = 0 and d_micro = null (the statistic is undefined there —
   * callers should treat a one-sided group as maximal drift).
   *
   * Scale: one hash-aggregate per side to (group, value, n), then the
   * grouped assembled cumulative pass of [[graft.operators.Relational
   * .rangedCumSums]] — no single-task window at ANY group/value
   * cardinality, and the whole statistic is one shuffle deeper than
   * the per-side aggregates. Same DECIMAL(38,0) overflow posture as
   * [[ksDriftFromCounts]].
   */
  def ksDriftByGroup(a: DataFrame, b: DataFrame, valueCol: String,
                     grpCol: String): DataFrame =
    ksDriftByGroupFromCounts(valueCountsByGroup(a, valueCol, grpCol),
      valueCountsByGroup(b, valueCol, grpCol), grpCol)

  /** Per-(group, value) BIGINT counts — the grouped [[valueCounts]]:
   * the reduced form both [[ksDriftByGroup]] sides collapse to, and
   * the persistable reference state for the per-group streaming drift
   * monitor ([[graft.streaming.Streams.driftByGroupSink]]). Nulls drop
   * under the same contract as [[valueCounts]]. Emits (grpCol, v, n). */
  def valueCountsByGroup(df: DataFrame, valueCol: String,
                         grpCol: String): DataFrame =
    df.select(col(grpCol), col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(grpCol, "v").agg(count(lit(1)).as("n"))

  /** [[ksDriftByGroup]] with both sides already reduced to
   * [[valueCountsByGroup]] frames (grpCol, v, n) — the streaming shape,
   * mirroring [[ksDriftFromCounts]]. */
  def ksDriftByGroupFromCounts(aCounts: DataFrame, bCounts: DataFrame,
                               grpCol: String): DataFrame = {
    def shape(df: DataFrame, as: String) =
      df.select(col(grpCol).as("__g"), col("v").cast("long").as("__v"),
        col("n").cast("long").as(as))
    val merged = shape(aCounts, "__ca")
      .join(shape(bCounts, "__cb"), Seq("__g", "__v"), "full_outer")
      .select(col("__g"), col("__v"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val dec = "decimal(38,0)"
    graft.operators.Relational.rangedCumSums(merged, Seq("__g"),
        Seq(col("__v").asc),
        Seq(("__ca", "__cuma", "__na"), ("__cb", "__cumb", "__nb")))
      .withColumn("__dcr", abs(col("__cuma").cast(dec) * col("__nb") -
        col("__cumb").cast(dec) * col("__na")))
      .groupBy("__g")
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        count(lit(1)).as("n_values"), max(col("__dcr")).as("__dc"))
      .select(col("__g").as(grpCol), col("n_a"), col("n_b"),
        col("n_values"),
        expr("try_cast(__dc AS BIGINT)").as("d_cross"),
        when(col("n_a") > 0 && col("n_b") > 0, expr(
          "CAST((__dc * 1000000) DIV " +
            "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"))
          .as("d_micro"))
  }

  /**
   * Two-sample chi-square drift over a CATEGORICAL column — the
   * companion to [[ksDrift]]: KS watches an ORDERED value domain (a
   * CDF has to exist), this watches the category MIX (language, source,
   * event type, topic label — the columns a corpus pipeline actually
   * slices by). X² = Σ_cells d_c²/(n_a·n_b·(a_c+b_c)) with
   * d_c = a_c·n_b − b_c·n_a, over every category observed in EITHER
   * side (a one-sided category contributes its full imbalance — that
   * IS the drift signal).
   *
   * Exactness contract: d_c and d_c² DIV (a_c+b_c) compute in
   * DECIMAL(38,0) — exact while d_c² ≤ 10³⁸, i.e. per-side totals up
   * to ~3·10⁹ rows (a monitoring slice, not a whole 100 TB corpus —
   * beyond that the square fails loudly under ANSI rather than
   * silently rounding; pre-aggregate or sample the slice first). The
   * emitted `chi2_micro` = floor(Σ_c floor(d_c²/(a_c+b_c)) · 10⁶ /
   * (n_a·n_b)) is a deterministic, engine-invariant quantization of
   * X²·10⁶, within n_cells/(n_a·n_b) · 10⁶ micro-units of the
   * real-valued statistic (the per-cell floor loses < 1 per cell);
   * null when either side is empty. Nulls in the category column drop
   * under the [[valueCounts]] contract (monitor null-rate as its own
   * counter).
   *
   * Scale: one hash-aggregate per side to (category, n) — the only
   * corpus-sized passes, map-side combined — then a
   * category-cardinality full-outer merge and a 1-row aggregate.
   * Emits (n_a, n_b, n_cells, chi2_micro).
   */
  def chi2Drift(a: DataFrame, b: DataFrame, catCol: String): DataFrame =
    chi2DriftFromCounts(catCounts(a, catCol), catCounts(b, catCol))

  /** Per-category BIGINT counts of `catCol` as a STRING domain — the
   * reduced form both [[chi2Drift]] sides collapse to, and the
   * persistable reference state for a streaming category-mix monitor.
   * Nulls drop (same contract as [[valueCounts]]): (cat, n). */
  def catCounts(df: DataFrame, catCol: String): DataFrame =
    df.select(col(catCol).cast("string").as("cat"))
      .filter(col("cat").isNotNull)
      .groupBy("cat").agg(count(lit(1)).as("n"))

  /** [[chi2Drift]] with both sides already reduced to [[catCounts]]
   * frames — the streaming shape (persisted reference counts vs
   * accumulated observed counts). */
  def chi2DriftFromCounts(aCounts: DataFrame,
                          bCounts: DataFrame): DataFrame = {
    def shape(df: DataFrame, as: String) =
      df.select(col("cat").cast("string").as("__c"),
        col("n").cast("long").as(as))
    val dec = "decimal(38,0)"
    val merged = shape(aCounts, "__ca").join(shape(bCounts, "__cb"),
        Seq("__c"), "full_outer")
      .select(coalesce(col("__ca"), lit(0L)).cast(dec).as("__ca"),
        coalesce(col("__cb"), lit(0L)).cast(dec).as("__cb"))
    val totals = merged.agg(
      coalesce(sum(col("__ca")), lit(0L).cast(dec)).as("__na"),
      coalesce(sum(col("__cb")), lit(0L).cast(dec)).as("__nb"))
    merged.crossJoin(broadcast(totals))
      .withColumn("__d", col("__ca") * col("__nb") -
        col("__cb") * col("__na"))
      .withColumn("__s", expr("(__d * __d) DIV (__ca + __cb)"))
      .agg(max(col("__na")).as("__naM"), max(col("__nb")).as("__nbM"),
        count(lit(1)).as("n_cells"),
        coalesce(sum(col("__s")), lit(0L).cast(dec)).as("__ss"))
      .select(
        coalesce(col("__naM"), lit(0L).cast(dec)).cast("long").as("n_a"),
        coalesce(col("__nbM"), lit(0L).cast(dec)).cast("long").as("n_b"),
        col("n_cells"), col("__ss"))
      .withColumn("chi2_micro",
        when(col("n_a") > 0 && col("n_b") > 0, expr(
          "CAST((__ss * 1000000) DIV " +
            "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")))
      .select("n_a", "n_b", "n_cells", "chi2_micro")
  }

  /**
   * Per-category drift ATTRIBUTION — the frame behind [[chi2Drift]]'s
   * scalar: one row per category with its exact cell counts and its
   * micro-unit contribution to X², so the monitor can answer "WHICH
   * category moved" the moment the corpus-wide statistic trips.
   * `contrib_micro` floors each cell's term independently
   * (floor(floor(d²/(a+b)) · 10⁶ / (n_a·n_b))), so the contributions
   * sum to within n_cells micro-units of [[chi2Drift]]'s `chi2_micro`
   * — attribution, not a second definition of the statistic. Null when
   * either side is empty. Same exactness bound and null-drop contract
   * as [[chi2Drift]]. Emits (cat, n_a_cat, n_b_cat, contrib_micro).
   */
  def chi2Cells(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    def shape(df: DataFrame, as: String) =
      catCounts(df, catCol).select(col("cat").as("__c"),
        col("n").cast("long").as(as))
    val dec = "decimal(38,0)"
    val merged = shape(a, "__ca").join(shape(b, "__cb"),
        Seq("__c"), "full_outer")
      .select(col("__c"),
        coalesce(col("__ca"), lit(0L)).cast(dec).as("__ca"),
        coalesce(col("__cb"), lit(0L)).cast(dec).as("__cb"))
    val totals = merged.agg(
      coalesce(sum(col("__ca")), lit(0L).cast(dec)).as("__na"),
      coalesce(sum(col("__cb")), lit(0L).cast(dec)).as("__nb"))
    merged.crossJoin(broadcast(totals))
      .withColumn("__d", col("__ca") * col("__nb") -
        col("__cb") * col("__na"))
      .select(col("__c").as("cat"),
        col("__ca").cast("long").as("n_a_cat"),
        col("__cb").cast("long").as("n_b_cat"),
        when(col("__na") > 0 && col("__nb") > 0, expr(
          "CAST((((__d * __d) DIV (__ca + __cb)) * 1000000) DIV " +
            "(__na * __nb) AS BIGINT)")).as("contrib_micro"))
  }

  /** Per-group [[chi2Drift]] — category-mix drift sliced by a group
   * column (the per-source monitor shape, mirroring
   * [[ksDriftByGroup]]): one row per group present in either side,
   * each group's statistic identical to [[chi2Drift]] on that group's
   * rows alone; a group present in only one side reads
   * chi2_micro = null (undefined — treat as maximal drift). Emits
   * (grpCol, n_a, n_b, n_cells, chi2_micro).
   *
   * Scale: per-side hash-aggregates to (group, cat, n), a
   * (group, cat)-cardinality merge, per-group totals joined back on
   * the group key — no window, no single-task stage at any group or
   * category cardinality.
   */
  def chi2DriftByGroup(a: DataFrame, b: DataFrame, catCol: String,
                       grpCol: String): DataFrame =
    chi2DriftByGroupFromCounts(catCountsByGroup(a, catCol, grpCol),
      catCountsByGroup(b, catCol, grpCol), grpCol)

  /** Grouped [[catCounts]]: (grpCol, cat, n), nulls dropped. */
  def catCountsByGroup(df: DataFrame, catCol: String,
                       grpCol: String): DataFrame =
    df.select(col(grpCol), col(catCol).cast("string").as("cat"))
      .filter(col("cat").isNotNull)
      .groupBy(grpCol, "cat").agg(count(lit(1)).as("n"))

  /** [[chi2DriftByGroup]] with both sides already reduced to
   * [[catCountsByGroup]] frames (grpCol, cat, n). */
  def chi2DriftByGroupFromCounts(aCounts: DataFrame, bCounts: DataFrame,
                                 grpCol: String): DataFrame = {
    def shape(df: DataFrame, as: String) =
      df.select(col(grpCol).as("__g"), col("cat").cast("string").as("__c"),
        col("n").cast("long").as(as))
    val dec = "decimal(38,0)"
    val merged = shape(aCounts, "__ca")
      .join(shape(bCounts, "__cb"), Seq("__g", "__c"), "full_outer")
      .select(col("__g"),
        coalesce(col("__ca"), lit(0L)).cast(dec).as("__ca"),
        coalesce(col("__cb"), lit(0L)).cast(dec).as("__cb"))
    val totals = merged.groupBy("__g").agg(
      sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"))
    merged.join(totals, Seq("__g"))
      .withColumn("__d", col("__ca") * col("__nb") -
        col("__cb") * col("__na"))
      .withColumn("__s", expr("(__d * __d) DIV (__ca + __cb)"))
      .groupBy("__g")
      .agg(max(col("__na")).as("__naD"), max(col("__nb")).as("__nbD"),
        count(lit(1)).as("n_cells"), sum(col("__s")).as("__ss"))
      .select(col("__g").as(grpCol),
        col("__naD").cast("long").as("n_a"),
        col("__nbD").cast("long").as("n_b"),
        col("n_cells"),
        when(col("__naD") > 0 && col("__nbD") > 0, expr(
          "CAST((__ss * 1000000) DIV (__naD * __nbD) AS BIGINT)"))
          .as("chi2_micro"))
  }

  /**
   * Inter-annotator agreement (Cohen's kappa) in exact rationals — the
   * label-quality gate for labeled training data: observed agreement
   * `po` against chance agreement `pe` from the raters' marginals.
   * With n items, `agree` exact matches, and S = Σ_k m1_k·m2_k (the
   * marginal product over the label space),
   * kappa = (po − pe)/(1 − pe) = (agree·n − S)/(n² − S) — emitted as
   * the exact BIGINT pair (kappa_num, kappa_den) plus a floored
   * micro-unit quotient (floor is sign-correct for negative kappa,
   * unlike truncating integer division). `kappa_micro` is null when
   * the denominator is 0 (pe = 1: both raters constant — kappa is
   * undefined there, not 0).
   *
   * Scale: one hash-aggregate to the label-space contingency cells
   * (|labels|² rows — tiny), marginals and S derive from the cells,
   * never from the corpus again.
   */
  def annotatorAgreement(labeled: DataFrame, rater1: String,
                         rater2: String): DataFrame = {
    val cell = labeled
      .select(col(rater1).cast("string").as("__r1"),
        col(rater2).cast("string").as("__r2"))
      .groupBy("__r1", "__r2").agg(count(lit(1)).as("__n"))
    val m1 = cell.groupBy("__r1").agg(sum(col("__n")).as("__m1"))
    val m2 = cell.groupBy("__r2").agg(sum(col("__n")).as("__m2"))
    val s = m1.join(m2, m1("__r1") === m2("__r2"))
      .agg(coalesce(sum(col("__m1").cast("decimal(38,0)") * col("__m2")),
        lit(0L).cast("decimal(38,0)")).as("__S"))
    // n², S, and agree·n can pass BIGINT for corpora beyond ~3e9 labeled
    // items: the rational computes in DECIMAL(38,0) (exact to 10³⁸);
    // kappa_num/kappa_den read null via try_cast — never garbage — in
    // the regime where they cannot fit BIGINT, while kappa_micro (a
    // bounded quotient) stays valid throughout
    cell
      .agg(coalesce(sum(col("__n")), lit(0L)).as("n_items"),
        coalesce(sum(when(col("__r1") === col("__r2"), col("__n"))
          .otherwise(lit(0L))), lit(0L)).as("n_agree"))
      .crossJoin(broadcast(s))
      .withColumn("__numD", expr(
        "CAST(n_agree AS DECIMAL(38,0)) * n_items - CAST(__S AS DECIMAL(38,0))"))
      .withColumn("__denD", expr(
        "CAST(n_items AS DECIMAL(38,0)) * n_items - CAST(__S AS DECIMAL(38,0))"))
      .select(col("n_items"), col("n_agree"),
        when(col("n_items") > 0, expr(
          "CAST(CAST(n_agree AS DECIMAL(38,0)) * 1000000 DIV n_items " +
            "AS BIGINT)")).as("po_micro"),
        expr("try_cast(__numD AS BIGINT)").as("kappa_num"),
        expr("try_cast(__denD AS BIGINT)").as("kappa_den"),
        // exact DECIMAL floor division (the d_micro pattern): DIV
        // truncates toward zero, so a negative kappa with a remainder
        // needs the -1 floor correction — double math here could shift
        // the floored quotient by one past ~2^53, under-delivering the
        // exactness the DECIMAL(38,0) plumbing promises. __denD >= 0
        // always (n² ≥ Σ m1·m2 by Cauchy–Schwarz), so only __numD's
        // sign matters.
        when(col("__denD") =!= 0, expr(
          """CAST(__numD * 1000000 DIV __denD -
            |  (CASE WHEN __numD < 0 AND (__numD * 1000000) % __denD <> 0
            |   THEN 1 ELSE 0 END) AS BIGINT)""".stripMargin))
          .as("kappa_micro"))
  }

  /**
   * l-diversity audit — [[kAnonymityAudit]]'s companion gate: a group
   * can be k-anonymous (big enough) yet still leak when every row in it
   * shares the SAME sensitive value (the homogeneity attack — knowing
   * someone is in the group reveals their attribute). A group is
   * l-diverse when its rows carry at least `l` DISTINCT sensitive
   * values; this reports the groups and row mass below that bar. Emits
   * one row: (n_rows, n_groups, n_below_l, rows_at_risk,
   * risk_permille).
   *
   * Scale: one hash-aggregate on (quasi columns) with a distinct count
   * of the sensitive column per group, then a second aggregate over the
   * group frame — the corpus is read once, same shape as
   * [[kAnonymityAudit]].
   */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        countDistinct(col(sensitiveCol)).as("__d"))
      .agg(coalesce(sum(col("__n")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("__d") < l, 1L).otherwise(0L)), lit(0L))
          .as("n_below_l"),
        coalesce(sum(when(col("__d") < l, col("__n")).otherwise(0L)),
          lit(0L)).as("rows_at_risk"))
      .withColumn("risk_permille",
        when(col("n_rows") > 0, expr("rows_at_risk * 1000 DIV n_rows")))
  }

  /**
   * k-anonymity audit over a quasi-identifier column set — the privacy
   * gate before a corpus ships: every row whose quasi-identifier
   * combination is shared by fewer than `k` rows is re-identifiable to
   * a group smaller than k. Emits one row:
   * (n_rows, n_groups, n_below_k, rows_at_risk, risk_permille).
   *
   * Scale: one hash-aggregate on the quasi-identifier columns (map-side
   * combined), then a second aggregate over the group-count frame —
   * the corpus is read once, nothing corpus-sized shuffles twice.
   */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("__n") < k, 1L).otherwise(0L)), lit(0L))
          .as("n_below_k"),
        coalesce(sum(when(col("__n") < k, col("__n")).otherwise(0L)),
          lit(0L)).as("rows_at_risk"))
      .withColumn("risk_permille",
        when(col("n_rows") > 0, expr("rows_at_risk * 1000 DIV n_rows")))
  }

  /**
   * t-closeness audit (Li et al., ICDE 2007) — the third privacy gate
   * after [[kAnonymityAudit]] and [[lDiversityAudit]]: a group can be
   * big (k-anonymous) and varied (l-diverse) yet still leak when its
   * sensitive-value DISTRIBUTION differs sharply from the corpus-wide
   * one (the skewness attack — "90% of this group has value X" is a
   * disclosure even with 3 distinct values present). Per equivalence
   * class c the distance is the variational distance (EMD under the
   * uniform ground metric on a categorical sensitive attribute):
   * d(c) = ½ · Σ_s |n_cs/N_c − n_s/N|; the class fails when
   * d(c) · 1e6 > tMicro. Emits one row: (n_rows, n_groups, n_above_t,
   * rows_at_risk, risk_permille, max_dist_micro).
   *
   * Integer-exact throughout: the per-class numerator is
   * Σ_s |n_cs·N − n_s·N_c| over present values plus (N − Σ_present n_s)
   * · N_c for the absent remainder of the domain (each absent value
   * contributes n_s/N exactly), and d_micro = num · 1e6 DIV (2·N_c·N)
   * in DECIMAL(38,0) — no doubles anywhere, so the audit is
   * partition-invariant and oracle-checkable bit-for-bit.
   *
   * NULL sensitive values: rows with a NULL sensitive column count
   * toward class sizes and the global total but carry no distribution
   * mass, and a class whose rows are ALL null-sensitive still counts
   * as an equivalence class (class size/existence come from the full
   * counts frame; only the distribution legs drop null keys — so the
   * audits agree with [[kAnonymityAudit]] over the same rows).
   * Pre-coalesce NULLs to a sentinel value when missingness itself is
   * the sensitive signal.
   *
   * Scale: one hash-aggregate on (quasi, sensitive) — map-side
   * combined, state bounded by |classes|·|domain| not by rows — then a
   * broadcast join against the |domain|-row global frame and a
   * per-class aggregate; the corpus is read once and nothing
   * corpus-sized shuffles twice. The absent-remainder identity is what
   * keeps the plan off a classes × domain cross join.
   */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, tMicro: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tMicro >= 0, s"tMicro must be >= 0, got $tMicro")
    classDistanceFrame(
      df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
        .agg(count(lit(1)).as("__ncs")),
      quasiCols, sensitiveCol, "__ncs")
      .agg(coalesce(sum(col("__nc")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("dist_micro") > tMicro, 1L).otherwise(0L)),
          lit(0L)).as("n_above_t"),
        coalesce(sum(when(col("dist_micro") > tMicro, col("__nc"))
          .otherwise(0L)), lit(0L)).as("rows_at_risk"),
        max(col("dist_micro")).as("max_dist_micro"))
      .withColumn("risk_permille",
        when(col("n_rows") > 0, expr("rows_at_risk * 1000 DIV n_rows")))
      .select("n_rows", "n_groups", "n_above_t", "rows_at_risk",
        "risk_permille", "max_dist_micro")
  }

  /**
   * Best-first selection under a per-group additive budget — the step
   * that turns a mix PLAN ([[mixPlanner]]) into an actual document
   * pick: within each `groupCol` (source/domain), rows are taken in
   * descending `orderCol` order (ties broken by ascending `idCol`, so
   * the pick is total and reproducible) while the running sum of
   * `costCol` stays within `budget`. The web-pipeline shape: "keep the
   * best documents of every domain up to N tokens each". Emits the
   * kept rows with (pick_rank, cum_cost) appended.
   *
   * Greedy prefix semantics, ENFORCED literally: a row survives only
   * when every cumulative cost up to and including it stays within the
   * budget (max of the running sum over the prefix) — so the first row
   * crossing the budget is excluded AND everything after it in that
   * group, even if a later negative cost pulled the running sum back
   * under. For the normal non-negative-cost corpus the prefix max IS
   * the running sum and the check is the plain `cum_cost <= budget`.
   * A NULL cost is an unknown document size — summing it as 0 would
   * silently admit the row — so it fails loudly (raise_error inside
   * the same window pass; no separate validation scan).
   *
   * Scale: one hash partition per group + an in-partition sort (the
   * classic per-group window; all three window columns share the one
   * sort); groups are domains — thousands, not corpus-sized — but a
   * single pathological mega-group serializes its own sort (measured
   * 34.6 s for 10M rows in one group, BENCH_scaling round 16). For
   * that shape pass `preThin = true`: before the exact window pass,
   * each group is cut at an approximate `orderCol` percentile and only
   * rows STRICTLY ABOVE the cut enter the sort. The thin is EXACT, not
   * best-effort, by a prefix argument: the thinned set T = {orderCol >
   * q} is prefix-closed under the pick's total order, and the cut is
   * only applied after an exact verification that sum(costCol over T)
   * exceeds the budget — the running sum's prefix max at the end of T
   * equals that sum, so the first budget-crossing row lies INSIDE T,
   * and the kept rows (the prefix strictly before the crossing, since
   * the prefix max is monotone) plus their pick_rank/cum_cost values
   * are identical to the unthinned pass. Groups where no percentile
   * cut retains provably enough cost (small groups, or a budget that
   * admits most of the group — where thinning could not have helped)
   * fall back to the full sort unchanged. Two extra scans (grouped
   * percentile sketch + verification sum), both map-side combined;
   * the thresholds frame is |groups|-bounded and broadcast.
   *
   * The thin is SELF-GATING (round 17): before any sketch, one cheap
   * count+sum pre-pass (map-side combined, no percentile state) keeps
   * only groups that could possibly choose a cut — total cost ≥ 4×
   * budget (the shallowest candidate percentile, p = 0.5, must retain
   * 2× budget) and more than `preThinMinRows` rows (thinning only pays
   * when the group's serialized sort hurts; the r16 A/B measured the
   * sketch at 2.4× on can't-benefit groups). Everything else skips the
   * sketch entirely, so a 50%-admit group runs at plain-sort parity
   * even with preThin on. The gate can only SKIP a group the chooser
   * would also have left uncut (total < 4× budget fails every
   * percentile's retained-cost test), so output is unchanged — and a
   * wrongly-skipped group merely falls back to the exact full sort.
   */
  def budgetSelect(df: DataFrame, groupCol: String, orderCol: String,
                   costCol: String, budget: Long,
                   idCol: String = "doc_id",
                   preThin: Boolean = false,
                   preThinMinRows: Long = 0L): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val nullCost = expr(s"raise_error('budgetSelect: null $costCol — " +
      "every candidate row needs a cost (a null would silently count " +
      "as 0 toward the budget)')")
    val safeCost = when(col(costCol).isNull, nullCost)
      .otherwise(col(costCol))
    lazy val thinned = {
      // self-gate: one count+sum pre-pass (no sketch) keeps only groups
      // that could possibly choose a cut — see the scaladoc. safeCost
      // keeps the null-cost guard local to this sum too.
      val feasible = df.groupBy(groupCol).agg(
          count(lit(1)).as("__n"), sum(safeCost).as("__t"))
        .filter(col("__n") > preThinMinRows &&
          col("__t").cast("double") >= lit(4.0) * lit(budget.toDouble))
        .select(groupCol)
      // bounded driver action (the frame is |groups|-rows at most —
      // domains, not documents): when NO group qualifies, skip every
      // thin stage outright, so preThin = true on a can't-benefit shape
      // costs exactly one map-side agg scan beyond the plain pass
      // (measured: the lazy-plan version still paid ~4 extra corpus
      // scans through the no-op semi joins)
      if (feasible.isEmpty) df else {
      val cand = df.join(broadcast(feasible), Seq(groupCol), "left_semi")
      // candidate cuts, deepest first; the chooser keeps the deepest
      // whose PROPORTIONAL retained-cost estimate still covers 2x the
      // budget (a heuristic — the exact verification below decides)
      val pcts = Seq(0.5, 0.75, 0.9, 0.99, 0.999)
      val stats = cand.groupBy(groupCol).agg(
        sum(safeCost).as("__total"),
        percentile_approx(col(orderCol),
          typedLit(pcts), lit(10000)).as("__qs"))
      val pctArr = pcts.mkString("array(", "D, ", "D)")
      val chosen = stats.select(col(groupCol), expr(
        s"""try_element_at(filter(
           |  zip_with($pctArr, __qs, (p, q) -> named_struct('p', p, 'q', q)),
           |  x -> __total * (1.0D - x.p) >= 2.0D * ${budget}L), -1).q"""
          .stripMargin).as("__q"))
        .filter(col("__q").isNotNull)
      // EXACT verification: apply a cut only where the strictly-above
      // mass really exceeds the budget (the prefix-closure guarantee)
      // safeCost here too (not raw costCol): the null-cost guard must
      // hold locally at every cost sum, not lean on the stats pass
      // having raised first (ADVICE r16)
      val above = df.join(broadcast(chosen), Seq(groupCol))
        .filter(col(orderCol) > col("__q"))
        .groupBy(groupCol).agg(sum(safeCost).as("__above"))
      val thr = chosen.join(above, Seq(groupCol), "left")
        .filter(col("__above") > budget)
        .select(col(groupCol), col("__q").as("__thr"))
      df.join(broadcast(thr), Seq(groupCol), "left")
        .filter(col("__thr").isNull || col(orderCol) > col("__thr"))
        .drop("__thr")
      }
    }
    val base = if (!preThin) df else thinned
    val w = Window.partitionBy(groupCol)
      .orderBy(col(orderCol).desc, col(idCol).asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("pick_rank", row_number().over(w).cast("long"))
      .withColumn("cum_cost", sum(safeCost).over(run).cast("long"))
      .withColumn("__pfx_max", max(col("cum_cost")).over(run))
      .filter(col("__pfx_max") <= budget)
      .drop("__pfx_max")
  }

  /**
   * Per-class frame behind the privacy audits, computed from a
   * PRE-AGGREGATED counts frame — one row per (quasi…, sensitive) with
   * its positive row count in `nCol`. Emits one row per equivalence
   * class: (quasi…, __nc class size, __d distinct sensitive values,
   * dist_micro t-closeness variational distance). Shared by
   * [[tClosenessAudit]] (counts = one groupBy of the rows) and
   * [[privacyAuditFromCounts]] (counts = additive partials a streaming
   * sink folded — the whole point: every audit re-derives from
   * (classes × domain)-bounded counters, never from the corpus).
   *
   * __ncsum (the class size) must be visible inside the per-class |·|
   * sum, so it rides a window over the counts frame —
   * |classes|·|domain| rows, never corpus rows.
   *
   * Class EXISTENCE survives null-sensitive rows: the glob attach is a
   * LEFT join, so an equivalence class whose rows are ALL
   * null-sensitive still emits (it would vanish from every field under
   * an inner join's NULL-key drop, diverging from [[kAnonymityAudit]],
   * which groups by the quasi columns alone and counts such classes).
   * The distribution legs (__presAbs, __gsum) sum only the matched
   * (non-null sensitive) rows — null sensitive values carry no
   * distribution mass — so an all-null class gets __presAbs = 0,
   * __gsum = 0 and the formula degenerates to
   * dist = N·N_c / (2·N_c·N) = ½ (the whole domain is "absent"),
   * exactly the formula's extension to an empty present set.
   */
  private def classDistanceFrame(counts: DataFrame, quasiCols: Seq[String],
                                 sensitiveCol: String,
                                 nCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val glob = counts.groupBy(col(sensitiveCol))
      .agg(sum(col(nCol)).as("__ns"))
    val tot = glob.agg(coalesce(sum(col("__ns")), lit(0L)).as("__N"))
    val w = Window.partitionBy(quasiCols.map(col): _*)
    counts.withColumn("__ncsum", sum(col(nCol)).over(w))
      .join(broadcast(glob), Seq(sensitiveCol), "left")
      .crossJoin(broadcast(tot))
      .groupBy(quasiCols.map(col): _*)
      .agg(max(col("__ncsum")).as("__nc"),
        countDistinct(col(sensitiveCol)).as("__d"),
        max(col("__N")).as("__N"),
        coalesce(sum(expr(
          s"CASE WHEN __ns IS NOT NULL THEN abs(CAST($nCol AS $dec) " +
            s"* __N - CAST(__ns AS $dec) * __ncsum) " +
            s"ELSE CAST(0 AS $dec) END")), expr(s"CAST(0 AS $dec)"))
          .as("__presAbs"),
        coalesce(sum(col("__ns")), lit(0L)).as("__gsum"))
      .withColumn("__num", expr(
        s"__presAbs + CAST(__N - __gsum AS $dec) * __nc"))
      .withColumn("dist_micro", expr(
        s"try_cast(__num * 1000000 DIV (CAST(2 AS $dec) * __nc * __N) " +
          "AS BIGINT)"))
  }

  /**
   * The COMBINED privacy gate from a pre-aggregated counts frame: one
   * row with the k-anonymity, l-diversity, and t-closeness verdicts —
   * (n_rows, n_groups, n_below_k, rows_below_k, n_below_l,
   * rows_below_l, n_above_t, rows_above_t, max_dist_micro) — each
   * field equal to the corresponding row-level audit over the rows the
   * counts summarize ([[kAnonymityAudit]] / [[lDiversityAudit]] /
   * [[tClosenessAudit]]; CurationSpec pins the equality, StreamLaws
   * pins it for the streaming fold). Counts rows must be unique per
   * (quasi…, sensitive) with `nCol` > 0 — the shape a groupBy-count or
   * a sum-folded partial tree produces. NULL sensitive values follow
   * [[tClosenessAudit]]'s contract (class/total mass only, no
   * distribution mass; coalesce to a sentinel to change that).
   *
   * Scale: the input is already (classes × domain)-bounded; everything
   * here is one window + one broadcast join + two aggregates over it.
   * This is what lets a STREAMING privacy monitor re-derive the full
   * verdict per micro-batch without ever re-reading the corpus.
   */
  def privacyAuditFromCounts(counts: DataFrame, quasiCols: Seq[String],
                             sensitiveCol: String, nCol: String,
                             k: Long, l: Long, tMicro: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    require(tMicro >= 0, s"tMicro must be >= 0, got $tMicro")
    classDistanceFrame(counts, quasiCols, sensitiveCol, nCol)
      .agg(coalesce(sum(col("__nc")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("__nc") < k, 1L).otherwise(0L)), lit(0L))
          .as("n_below_k"),
        coalesce(sum(when(col("__nc") < k, col("__nc")).otherwise(0L)),
          lit(0L)).as("rows_below_k"),
        coalesce(sum(when(col("__d") < l, 1L).otherwise(0L)), lit(0L))
          .as("n_below_l"),
        coalesce(sum(when(col("__d") < l, col("__nc")).otherwise(0L)),
          lit(0L)).as("rows_below_l"),
        coalesce(sum(when(col("dist_micro") > tMicro, 1L).otherwise(0L)),
          lit(0L)).as("n_above_t"),
        coalesce(sum(when(col("dist_micro") > tMicro, col("__nc"))
          .otherwise(0L)), lit(0L)).as("rows_above_t"),
        max(col("dist_micro")).as("max_dist_micro"))
  }
}
