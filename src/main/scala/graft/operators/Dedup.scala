package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFns, VectorFns}

/**
 * Deduplication operators for LLM training-data pipelines: exact, n-gram
 * Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
 *
 * Shared design for 100 TB:
 *  - shingles are hashed to 8-byte keys ([[TextFns.shingleHash]]) before any
 *    shuffle, so exchange volume is bounded by token count, not text size;
 *  - candidate generation is always O(n·sig) (LSH banding / band buckets),
 *    never all-pairs, except where the operator *is* defined as exact;
 *  - the exact-Jaccard verification joins only candidate pairs against
 *    per-doc shingle sets (documents are bounded, so the sets are small
 *    arrays, not skew hazards).
 */
object Dedup {

  /** (id, shingle-hash) pairs, distinct per document. */
  private def docShingles(docs: DataFrame, idCol: String, n: Int): DataFrame =
    docs
      .withColumn("__t", TextFns.tokens("text"))
      .select(col(idCol),
        explode(array_distinct(TextFns.shingles("__t", n))).as("__s"))
      .select(col(idCol), TextFns.shingleHash(col("__s")).as("sh"))

  /** (id, hs: sorted shingle-hash set, sz) — for exact-Jaccard verification
   * of candidate pairs. */
  private def shingleSets(docs: DataFrame, idCol: String, n: Int): DataFrame =
    docShingles(docs, idCol, n)
      .groupBy(idCol).agg(collect_set(col("sh")).as("hs"))
      .withColumn("sz", size(col("hs")))

  /** Join candidate pairs (a, b) with both shingle sets and keep pairs whose
   * exact Jaccard >= threshold. */
  private def jaccardFilter(cand: DataFrame, sets: DataFrame, idCol: String,
                            threshold: Double): DataFrame =
    cand
      .join(sets.select(col(idCol).as("a"), col("hs").as("hsa"), col("sz").as("sza")), "a")
      .join(sets.select(col(idCol).as("b"), col("hs").as("hsb"), col("sz").as("szb")), "b")
      .withColumn("inter", size(array_intersect(col("hsa"), col("hsb"))))
      .withColumn("jac", col("inter") / (col("sza") + col("szb") - col("inter")).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("a").as("doc_a"), col("b").as("doc_b"))

  /**
   * Exact dedup: group identical texts, keep the lowest id. Plain
   * hash-aggregate — one shuffle on a text hash at scale (Spark's
   * HashAggregate partial/final split gives map-side combine for free).
   */
  def exactDedup(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /**
   * Exact n-gram Jaccard duplicate pairs: explode distinct word-n-gram
   * shingle hashes, self-join on the shingle, count intersections, filter
   * `|A∩B| / |A∪B| >= threshold`. Emits (doc_a, doc_b) with doc_a < doc_b.
   *
   * Scale: the shingle self-join shuffles on an 8-byte hash; a frequent
   * shingle appearing in d docs contributes d² join rows, so production runs
   * at 100 TB should cap document frequency (`maxShingleDF`) — off by
   * default because it changes semantics (oracle is exact).
   */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
                        idCol: String = "doc_id",
                        maxShingleDF: Option[Int] = None): DataFrame = {
    val sh0 = docShingles(docs, idCol, n)
    val sh = maxShingleDF match {
      case Some(cap) =>
        val df = sh0.groupBy("sh").agg(count(lit(1)).as("__df")).filter(col("__df") <= cap)
        sh0.join(df.select("sh"), "sh")
      case None => sh0
    }
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("sz"))
    val left  = sh.select(col(idCol).as("a"), col("sh"))
    val right = sh.select(col(idCol).as("b"), col("sh"))
    left.join(right, "sh")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col(idCol).as("b"), col("sz").as("szb")), "b")
      .filter(col("inter") / (col("sza") + col("szb") - col("inter")).cast("double") >= threshold)
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
  }

  /**
   * MinHash + LSH near-dup pairs: k independent min-hashes over shingle
   * hashes, banded `bands × rowsPerBand`; docs sharing any band bucket are
   * candidates; candidates are verified by exact Jaccard >= threshold so the
   * output is deterministic (LSH affects recall only, and with
   * 32 bands × 4 rows the miss probability at Jaccard 0.85+ is < 1e-12).
   *
   * Scale: signatures are one hash-aggregate over (doc, shingle); banding
   * explodes to `bands` rows/doc; the bucket self-join shuffles on
   * (band, bucket) — strictly O(n) candidate generation vs the exact
   * operator's O(shingle-df²).
   */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, numHashes: Int = 128,
                      bands: Int = 32, threshold: Double = 0.5,
                      idCol: String = "doc_id"): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val sh = docShingles(docs, idCol, n)
    val params = TextFns.minhashParams(numHashes)
    val sig = sh.groupBy(idCol).agg(
      params.head match { case (a, b) => min(TextFns.minhashComponent(col("sh"), a, b)).as("mh_0") },
      params.zipWithIndex.tail.map { case ((a, b), i) =>
        min(TextFns.minhashComponent(col("sh"), a, b)).as(s"mh_$i")
      }: _*)
    val bandStructs = (0 until bands).map { j =>
      val cols = (j * r until (j + 1) * r).map(i => col(s"mh_$i"))
      struct(lit(j).as("band"), hash(cols: _*).as("bucket"))
    }
    val buckets = sig
      .select(col(idCol), explode(array(bandStructs: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = buckets.select(col(idCol).as("a"), col("band"), col("bucket"))
      .join(buckets.select(col(idCol).as("b"), col("band"), col("bucket")), Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    jaccardFilter(cand, shingleSets(docs, idCol, n), idCol, threshold)
  }

  /**
   * SimHash near-dup pairs: 64-bit token-frequency SimHash computed per row
   * with higher-order functions (zero shuffle for the signature), banded
   * into four 16-bit bands for candidate generation, Hamming-distance
   * pre-filter, then exact-Jaccard verification (same determinism argument
   * as [[minhashLshPairs]]).
   */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 16, n: Int = 3,
                   threshold: Double = 0.5, idCol: String = "doc_id"): DataFrame = {
    val bits = docs
      .withColumn("__t", TextFns.tokens("text"))
      .withColumn("__th", expr("transform(__t, w -> xxhash64(w))"))
      .withColumn("__sums", expr(
        """aggregate(__th, array_repeat(0, 64),
          |  (acc, h) -> zip_with(acc, sequence(0, 63),
          |    (a, b) -> a + CASE WHEN (shiftright(h, CAST(b AS INT)) & 1) = 1
          |                   THEN 1 ELSE -1 END))""".stripMargin))
      .withColumn("bits", expr(
        "transform(__sums, s -> CASE WHEN s > 0 THEN 1 ELSE 0 END)"))
      .select(col(idCol), col("bits"))
    val banded = bits.select(
      col(idCol), col("bits"),
      explode(array((0 until 4).map { j =>
        struct(lit(j).as("band"),
          expr(s"aggregate(sequence(0, 15), 0, (acc, k) -> acc + shiftleft(element_at(bits, ${16 * j} + k + 1), k))")
            .as("bucket"))
      }: _*)).as("bb"))
      .select(col(idCol), col("bits"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = banded.select(col(idCol).as("a"), col("bits").as("ba"), col("band"), col("bucket"))
      .join(banded.select(col(idCol).as("b"), col("bits").as("bb2"), col("band"), col("bucket")),
            Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .withColumn("hamming", expr("size(filter(zip_with(ba, bb2, (x, y) -> x != y), d -> d))"))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b").distinct()
    jaccardFilter(cand, shingleSets(docs, idCol, n), idCol, threshold)
  }

  /**
   * Embedding-cosine near-duplicate pairs by exact all-pairs comparison over
   * an (optionally modulo-sampled) slice. Quadratic by definition — this is
   * the exact/verification variant; the scale path is
   * [[Similarity.hyperplaneLshPairs]] (O(n) bucketed candidates).
   */
  def embeddingNearDupPairs(emb: DataFrame, threshold: Double = 0.4,
                            sampleMod: Int = 1, idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val base0 = if (sampleMod > 1) emb.filter(col(idCol) % sampleMod === 0) else emb
    val base = base0.select(col(idCol), col(vecCol),
      VectorFns.norm(vecCol).as("nrm"))
    val a = base.select(col(idCol).as("a"), col(vecCol).as("va"), col("nrm").as("na"))
    val b = base.select(col(idCol).as("b"), col(vecCol).as("vb"), col("nrm").as("nb"))
    a.crossJoin(b)
      .filter(col("a") < col("b"))
      .withColumn("cos", VectorFns.dot("va", "vb") / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a").as("vec_a"), col("b").as("vec_b"))
  }
}
