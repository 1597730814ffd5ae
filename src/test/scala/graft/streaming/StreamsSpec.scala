package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedCounts: tumbling windows close after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = Streams.windowedCounts(
      mem.toDF().toDF("ts", "event_type"), "ts", "event_type",
      windowLength = "10 minutes", watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("wc")
      .outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 00:01:00"), "a"), (ts("2024-01-01 00:02:00"), "a"),
        (ts("2024-01-01 00:03:00"), "b"))
      q.processAllAvailable()
      // advance watermark far past the first window
      mem.addData((ts("2024-01-01 01:00:00"), "a"))
      q.processAllAvailable()
      val rows0 = spark.table("wc").select("event_type", "n").orderBy("event_type")
      assert(rows(rows0) == Seq(Seq("a", 2L), Seq("b", 1L)))
    } finally q.stop()
  }

  test("windowedCounts over FileTopicSource e2e: watermark closes windows " +
      "and late rows are dropped, not resurrected") {
    import graft.sources.topic.FileTopicSource
    val topic = Files.createTempDirectory("wm-topic").toString
    val cp = Files.createTempDirectory("wm-cp").toString
    def rec(t: String, e: String) = s"""{"ts":"$t","event_type":"$e"}"""
    FileTopicSource.append(topic, 0, Seq(
      rec("2024-01-01 00:01:00", "a"), rec("2024-01-01 00:02:00", "a"),
      rec("2024-01-01 00:03:00", "b")))
    val parsed = spark.readStream.format(classOf[FileTopicSource].getName)
      .option("path", topic).load()
      .select(
        get_json_object(col("value"), "$.ts").cast("timestamp").as("ts"),
        get_json_object(col("value"), "$.event_type").as("event_type"))
    val out = Streams.windowedCounts(parsed, "ts", "event_type",
      windowLength = "10 minutes", watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("wmtopic")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      q.processAllAvailable()
      // watermark has not passed any window end: nothing emitted yet
      assert(spark.table("wmtopic").isEmpty)
      // 01:00 advances the watermark to 00:55 -> [00:00, 00:10) closes
      FileTopicSource.append(topic, 0, Seq(rec("2024-01-01 01:00:00", "a")))
      q.processAllAvailable()
      assert(rows(spark.table("wmtopic").select("event_type", "n")
        .orderBy("event_type")) == Seq(Seq("a", 2L), Seq("b", 1L)))
      // one batch carrying a LATE row (00:04, behind the 00:55 watermark)
      // plus an on-time 02:00 row: the late row must be dropped at the
      // watermark — the closed window's counts stay as emitted — while
      // 02:00 pushes the watermark to 01:55 and closes [01:00, 01:10)
      FileTopicSource.append(topic, 0, Seq(
        rec("2024-01-01 00:04:00", "b"), rec("2024-01-01 02:00:00", "c")))
      q.processAllAvailable()
      assert(rows(spark.table("wmtopic")
        .select("window_start", "event_type", "n")
        .orderBy("window_start", "event_type")) == Seq(
        Seq(ts("2024-01-01 00:00:00"), "a", 2L),
        Seq(ts("2024-01-01 00:00:00"), "b", 1L),
        Seq(ts("2024-01-01 01:00:00"), "a", 1L)))
    } finally q.stop()
  }

  test("narrow batch operators run unchanged on streaming frames") {
    // gopherRules is a stateless narrow projection, so the SAME function
    // accepts a streaming DataFrame — no stream-specific variant needed.
    // This pins that property: a regression that sneaks an aggregate,
    // sort, or driver collect into it would fail here with a
    // non-streamable-plan AnalysisException at start().
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = graft.operators.TextAnalysis.gopherRules(
      mem.toDF().toDF("doc_id", "text"))
      .select("doc_id", "n_words", "rule_stopwords")
    val q = out.writeStream.format("memory").queryName("gr")
      .outputMode("append").start()
    try {
      mem.addData((1L, "the cat sat on a mat of it"), (2L, "x"))
      q.processAllAvailable()
      assert(rows(spark.table("gr").orderBy("doc_id")) ==
        Seq(Seq(1L, 8L, true), Seq(2L, 1L, false)))
    } finally q.stop()
  }

  test("normalizeStream applies the batch rule table to a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val out = Streams.normalizeStream(mem.toDF().toDF("user_id", "note"))
    val q = out.writeStream.format("memory").queryName("ns")
      .outputMode("append").start()
    try {
      mem.addData(("7", "x"), ("bad", null))
      q.processAllAvailable()
      assert(rows(spark.table("ns").orderBy(col("user_id").asc_nulls_last)) ==
        Seq(Seq(7L, "x"), Seq(null, "")))
    } finally q.stop()
  }

  test("upsertSink merges micro-batches into a managed table") {
    implicit val sqlCtx = spark.sqlContext
    Tables.dropTable(spark, "stream_up")
    val mem = MemoryStream[(Long, String, Timestamp)]
    val cp = Files.createTempDirectory("cp").toString
    val q = Streams.upsertSink(mem.toDF().toDF("id", "v", "ts"),
      "stream_up", "id", "ts", cp)
    try {
      mem.addData((1L, "a", ts("2024-01-01 00:00:00")),
        (2L, "b", ts("2024-01-01 00:00:01")))
      q.processAllAvailable()
      assert(spark.table("stream_up").count() == 2)
      // second batch: update id=2 (two versions in one batch; latest wins),
      // insert id=3
      mem.addData((2L, "stale", ts("2024-01-01 00:10:00")),
        (2L, "B", ts("2024-01-01 00:11:00")),
        (3L, "c", ts("2024-01-01 00:12:00")))
      q.processAllAvailable()
      assert(rows(spark.table("stream_up").select("id", "v").orderBy("id")) ==
        Seq(Seq(1L, "a"), Seq(2L, "B"), Seq(3L, "c")))
    } finally q.stop()
    Tables.dropTable(spark, "stream_up")
  }

  test("intakeSink: quality gate, first-seen near-dup admission vs batch " +
      "and corpus") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val idx = Files.createTempDirectory("inidx").toString
    val out = Files.createTempDirectory("inout").toString
    val cp = Files.createTempDirectory("incp").toString
    val good = "the quick brown fox jumps over the lazy dog again and " +
      "again while the evening sun is setting over the quiet river valley"
    // 0.25 gate: "tiny" scores 0.2025 (fails), the 19-token prose docs
    // score ~0.295 (pass) under the integer-count quality formula
    val q = Streams.intakeSink(mem.toDF().toDF("doc_id", "text"),
      idx, out, cp, minQualityMicro = 250000L)
    try {
      // batch 0: 1 admitted; 2 is its near-dup (rejected, larger id);
      // 3 fails the quality gate (too short); 4 is novel and admitted
      mem.addData(
        (1L, good),
        (2L, good + " with a small trailing edit"),
        (3L, "tiny"),
        (4L, "completely different words about spark query engines at " +
          "scale with plenty of additional tokens to pass the gate"))
      q.processAllAvailable()
      assert(rows(spark.read.parquet(out).select("doc_id").orderBy("doc_id"))
        .flatten == Seq(1L, 4L))
      // batch 1: 5 duplicates the ADMITTED corpus doc 1 -> rejected;
      // 6 is novel -> admitted
      mem.addData(
        (5L, good),
        (6L, "fresh unrelated content about benchmark protocols and " +
          "median statistics with enough words to clear the quality bar"))
      q.processAllAvailable()
      assert(rows(spark.read.parquet(out).select("doc_id").orderBy("doc_id"))
        .flatten == Seq(1L, 4L, 6L))
      // the signature index holds every quality-surviving doc (the
      // rejected near-dups still signed - they were compared), but the
      // quality-failed doc was never signed
      assert(spark.read.parquet(idx).count() == 5L)
    } finally q.stop()
  }

  test("intakeSink tiered: admission rejects near-dups of BULK-tier docs " +
      "after the index is folded into bucketed tables") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val idx = Files.createTempDirectory("intieridx").toString
    val out = Files.createTempDirectory("intierout").toString
    val cp = Files.createTempDirectory("intiercp").toString
    Tables.dropTable(spark, "inbulk_bands")
    Tables.dropTable(spark, "inbulk_sigs")
    val good = "the quick brown fox jumps over the lazy dog again and " +
      "again while the evening sun is setting over the quiet river valley"
    def start() = Streams.intakeSink(mem.toDF().toDF("doc_id", "text"),
      idx, out, cp, minQualityMicro = 250000L,
      bucketedBase = Some("inbulk"))
    val q1 = start()
    try {
      mem.addData(
        (1L, good),
        (2L, "completely different words about spark query engines at " +
          "scale with plenty of additional tokens to pass the gate"))
      q1.processAllAvailable()
      assert(rows(spark.read.parquet(out).select("doc_id").orderBy("doc_id"))
        .flatten == Seq(1L, 2L))
    } finally q1.stop()
    // quiesced fold: the whole signed corpus moves to the bucketed tier
    Streams.compactIndexBucketed(spark, idx, "inbulk", numBuckets = 4)
    assert(spark.table("inbulk_sigs").count() == 2L)
    // resumed stream: 3 near-dups BULK doc 1 -> rejected via the
    // zero-Exchange bulk join; 4 is novel -> admitted
    val q2 = start()
    try {
      mem.addData(
        (3L, good),
        (4L, "fresh unrelated content about benchmark protocols and " +
          "median statistics with enough words to clear the quality bar"))
      q2.processAllAvailable()
      assert(rows(spark.read.parquet(out).select("doc_id").orderBy("doc_id"))
        .flatten == Seq(1L, 2L, 4L))
    } finally q2.stop()
  }

  test("distinctSink: running per-group estimates, re-delivered keys " +
      "never double-count, state stays <= k longs per group") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val sk = Files.createTempDirectory("dsk").toString
    val out = Files.createTempDirectory("dout").toString
    val cp = Files.createTempDirectory("dcp").toString
    val q = Streams.distinctSink(mem.toDF().toDF("source", "doc_id"),
      sk, out, cp, groupCol = "source", keyCol = "doc_id", k = 64)
    try {
      mem.addData((1L to 30L).map(i => ("a", i)) ++
        (1L to 5L).map(i => ("b", i)): _*)
      q.processAllAvailable()
      val first = rows(spark.read.parquet(s"$out/batch=0").orderBy("source"))
      assert(first == Seq(Seq("a", 30.0), Seq("b", 5.0)))
      // batch 2 overlaps a's keys 21..30: the union collapses them, so
      // a grows to exactly 50; b is carried forward untouched; c appears
      mem.addData((21L to 50L).map(i => ("a", i)) ++
        (1L to 2L).map(i => ("c", i)): _*)
      q.processAllAvailable()
      val second = rows(spark.read.parquet(s"$out/batch=1").orderBy("source"))
      assert(second == Seq(Seq("a", 50.0), Seq("b", 5.0), Seq("c", 2.0)))
      // persisted state is bounded: <= k hashes per group
      val state = rows(spark.read.parquet(s"$sk/batch=1")
        .selectExpr("grp", "size(sk)"))
      assert(state.forall(_(1).asInstanceOf[Int] <= 64))
    } finally q.stop()
  }

  test("intakeSink: id-ordering contract violation fails loudly instead " +
      "of silently admitting the near-dup") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val idx = Files.createTempDirectory("vioidx").toString
    val out = Files.createTempDirectory("vioout").toString
    val cp = Files.createTempDirectory("viocp").toString
    val good = "the quick brown fox jumps over the lazy dog again and " +
      "again while the evening sun is setting over the quiet river valley"
    val q = Streams.intakeSink(mem.toDF().toDF("doc_id", "text"),
      idx, out, cp, minQualityMicro = 250000L)
    try {
      mem.addData((100L, good))
      q.processAllAvailable()
      // a later batch with a SMALLER id that near-dups the corpus doc:
      // the admission rule would misread the pair direction and admit it
      mem.addData((5L, good))
      val ex = intercept[Exception] { q.processAllAvailable() }
      def causes(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: causes(t.getCause)
      assert(causes(ex).exists(c => c.isInstanceOf[IllegalStateException]
        && c.getMessage.contains("id-ordering")), s"unexpected failure: $ex")
    } finally q.stop()
  }

  test("nearDupSink: batches near-dup against the grown index, corpus pairs stay put") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val idx = Files.createTempDirectory("ndidx").toString
    val pairs = Files.createTempDirectory("ndpairs").toString
    val cp = Files.createTempDirectory("ndcp").toString
    val q = Streams.nearDupSink(mem.toDF().toDF("doc_id", "text"),
      idx, pairs, cp)
    try {
      // batch 0: one identical pair inside the batch + an unrelated doc
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "the quick brown fox jumps over the lazy dog again and again"),
        (3L, "completely different words about spark query engines at scale"))
      q.processAllAvailable()
      assert(rows(spark.read.parquet(pairs).select("doc_a", "doc_b")
        .orderBy("doc_a")) == Seq(Seq(1L, 2L)))
      // batch 1: a clone of doc 1 must pair with BOTH earlier clones via
      // the index, and (1, 2) must not be re-emitted
      mem.addData(
        (4L, "the quick brown fox jumps over the lazy dog again and again"),
        (5L, "totally novel content sharing no shingles with anything else"))
      q.processAllAvailable()
      assert(rows(spark.read.parquet(pairs).select("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")) ==
        Seq(Seq(1L, 2L), Seq(1L, 4L), Seq(2L, 4L)))
      // the index holds one signature row per document ever ingested
      assert(spark.read.parquet(idx).count() == 5L)
    } finally q.stop()
  }

  test("clustersSink: labels track growth and a bridge doc merges two " +
      "old clusters") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val idx = Files.createTempDirectory("clidx").toString
    val labels = Files.createTempDirectory("cllabels").toString
    val cp = Files.createTempDirectory("clcp").toString
    // estThreshold 0.3: the bridge doc concatenates two old docs, so its
    // Jaccard to EACH is ~|half| / |whole| < 0.5 by construction
    val q = Streams.clustersSink(mem.toDF().toDF("doc_id", "text"),
      idx, labels, cp, estThreshold = 0.3)
    def latest(): Seq[Seq[Any]] = {
      val parts = new java.io.File(labels).listFiles()
        .map(_.getName).filter(_.startsWith("batch="))
        .map(_.stripPrefix("batch=").toLong)
      rows(spark.read.parquet(s"$labels/batch=${parts.max}")
        .orderBy("doc_id"))
    }
    try {
      // batch 0: docs 1,2 are a cluster; 3 and 5 are singletons with
      // unrelated text
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "the quick brown fox jumps over the lazy dog again and again"),
        (3L, "completely different words about spark query engines at scale"),
        (5L, "totally novel content sharing no shingles with anything else"))
      q.processAllAvailable()
      assert(latest() == Seq(
        Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 3L), Seq(5L, 5L)))
      // batch 1: doc 6 is a near-dup of doc 1's text (joins cluster 1);
      // doc 7 is novel
      mem.addData(
        (6L, "the quick brown fox jumps over the lazy dog again and again"),
        (7L, "entirely fresh sentences that resemble nothing ingested before"))
      q.processAllAvailable()
      assert(latest() == Seq(
        Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 3L), Seq(5L, 5L),
        Seq(6L, 1L), Seq(7L, 7L)))
      // batch 2: doc 8 pairs with BOTH old singletons 3 and 5 (its text
      // holds each one's shingles) — the two old clusters must MERGE
      // into min-id 3 through the bridge
      mem.addData(
        (8L, "completely different words about spark query engines at scale " +
          "totally novel content sharing no shingles with anything else"))
      q.processAllAvailable()
      val out = latest()
      assert(out.contains(Seq(3L, 3L)) && out.contains(Seq(5L, 3L))
        && out.contains(Seq(8L, 3L)))
      // untouched clusters keep their labels across the merge
      assert(out.contains(Seq(1L, 1L)) && out.contains(Seq(6L, 1L)))
    } finally q.stop()
  }

  test("nearDupSink tiered: compaction folds the index into the bucketed " +
      "bulk; admission joins it with no Exchange on the index side") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val idx = Files.createTempDirectory("tieridx").toString
    val pairs = Files.createTempDirectory("tierpairs").toString
    val cp = Files.createTempDirectory("tiercp").toString
    Tables.dropTable(spark, "ndbulk_bands")
    Tables.dropTable(spark, "ndbulk_sigs")
    val q1 = Streams.nearDupSink(mem.toDF().toDF("doc_id", "text"),
      idx, pairs, cp, bucketedBase = Some("ndbulk"))
    try {
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "the quick brown fox jumps over the lazy dog again and again"),
        (3L, "completely different words about spark query engines at scale"))
      q1.processAllAvailable()
    } finally q1.stop()
    // quiesced maintenance: fold the delta tree into the bucketed tables
    Streams.compactIndexBucketed(spark, idx, "ndbulk", numBuckets = 4)
    assert(spark.table("ndbulk_sigs").count() == 3L)
    assert(!new java.io.File(idx).listFiles()
      .exists(_.getName.startsWith("batch=")), "folded delta pruned")
    // resume the stream: the clone must pair with BOTH bulk-tier clones
    val q2 = Streams.nearDupSink(mem.toDF().toDF("doc_id", "text"),
      idx, pairs, cp, bucketedBase = Some("ndbulk"))
    try {
      mem.addData(
        (4L, "the quick brown fox jumps over the lazy dog again and again"),
        (5L, "totally novel content sharing no shingles with anything else"))
      q2.processAllAvailable()
      assert(rows(spark.read.parquet(pairs).select("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")) ==
        Seq(Seq(1L, 2L), Seq(1L, 4L), Seq(2L, 4L)))
    } finally q2.stop()
    // plan proof on the very frame the sink writes: rebuild batch 1's
    // tiered pair plan and require that no shuffle repartitions the
    // bucketed index side (the 100 TB side reads AT its bucketing)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val newSigs = spark.read.parquet(s"$idx/batch=1")
    val newBands = spark.read.parquet(s"${idx}__bands/batch=1")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val frame = Streams.tieredPairs(spark, idx, idx + "__bands", newSigs,
        newBands, 1L, Some("ndbulk"), 0.5, 128, 32, "doc_id", None)
      assert(rows(frame.orderBy("doc_a", "doc_b")) ==
        Seq(Seq(1L, 4L), Seq(2L, 4L)))
      val plan = frame.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      def scanWithoutJoinBelow(p: SparkPlan): Boolean =
        if (p.toString.linesIterator.next().contains("ndbulk_")) true
        else if (p.children.length != 1) false
        else scanWithoutJoinBelow(p.children.head)
      val offending = plan.collect {
        case e: SparkPlan with ShuffleExchangeLike
            if scanWithoutJoinBelow(e.children.head) => e
      }
      assert(offending.isEmpty,
        s"bucketed index side re-shuffled:\n${offending.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ivfIngestSink + ivfTopKTiered: streamed vectors are searchable; " +
      "fold preserves results and prunes the delta") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.sources.Fixtures.table(spark, "/root/testdata/sf0.001",
      "embeddings").select("vec_id", "embedding")
    // initial corpus holds the lowest ids, so a full-corpus rebuild picks
    // the SAME seed centroids — making the tiered result comparable to a
    // one-shot index over everything
    val initial = emb.filter(col("vec_id") < 100)
    val later = emb.filter(col("vec_id") >= 100)
    val queries = emb.filter(col("vec_id") < 5)
    Seq("ivfstream", "ivffull").foreach(b =>
      Seq("_cells", "_centroids").foreach(sfx =>
        Tables.dropTable(spark, b + sfx)))
    Similarity.writeIvfIndex(initial, "ivfstream", nlist = 16, numBuckets = 4)
    val delta = Files.createTempDirectory("ivfdelta").toString
    val cp = Files.createTempDirectory("ivfcp").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = Streams.ivfIngestSink(mem.toDF().toDF("vec_id", "embedding"),
      "ivfstream", delta, cp)
    try {
      val rows2 = later.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      val (b0, b1) = rows2.splitAt(rows2.length / 2)
      mem.addData(b0.toSeq: _*)
      q.processAllAvailable()
      mem.addData(b1.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    // reference: one-shot index over the full corpus (same seeds)
    Similarity.writeIvfIndex(emb, "ivffull", nlist = 16, numBuckets = 4)
    val want = rows(Similarity.ivfTopKAgainstIndex(queries, "ivffull")
      .orderBy("query_id", "rank"))
    val tiered = rows(Similarity.ivfTopKTiered(queries, "ivfstream", delta)
      .orderBy("query_id", "rank"))
    assert(tiered == want && want.nonEmpty)
    // crash-window tolerance: plant a bulk vector in the delta too —
    // results must not change (candidate dedup)
    spark.table("ivfstream_cells").limit(3)
      .write.mode("overwrite").parquet(s"$delta/batch=99")
    assert(rows(Similarity.ivfTopKTiered(queries, "ivfstream", delta)
      .orderBy("query_id", "rank")) == want)
    // in-flight-write tolerance: a batch dir holding only an
    // uncommitted _temporary tree must not break the tiered query
    val inflight = new java.io.File(s"$delta/batch=100/_temporary")
    assert(inflight.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$delta/batch=100/_temporary/part-0"),
      Array[Byte](1, 2, 3))
    assert(rows(Similarity.ivfTopKTiered(queries, "ivfstream", delta)
      .orderBy("query_id", "rank")) == want)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$delta/batch=100"))
    // delta precedence: re-deliver bulk id 0 with a CHANGED row — the
    // fold must deterministically keep the delta version
    val orig0 = spark.table("ivfstream_cells")
      .filter(col("vec_id") === 0L).collect().toSeq
    val changed = spark.table("ivfstream_cells")
      .filter(col("vec_id") === 0L)
      .withColumn("nrm", col("nrm") + 123.0)
    changed.write.mode("overwrite").parquet(s"$delta/batch=101")
    // a SECOND update of the same id in a NEWER batch: id 0 becomes an
    // exact clone of id 1's vector. The highest batch id must win —
    // within-tier ties at __tier would otherwise keep a plan-dependent
    // arbitrary row (the round-11 ADVICE hazard)
    val clone0 = spark.table("ivfstream_cells")
      .filter(col("vec_id") === 1L).withColumn("vec_id", lit(0L))
    clone0.write.mode("overwrite").parquet(s"$delta/batch=103")
    val cloneNrm = rows(clone0.select("nrm"))
    // tiered-QUERY precedence before any fold: query 1 must rank
    // neighbor 0 first (cos = 1 against the batch=103 clone of its own
    // vector) — ranking against the stale bulk row or the batch=101 row
    // would not produce cos = 1
    val top1 = rows(Similarity.ivfTopKTiered(
        queries.filter(col("vec_id") === 1L), "ivfstream", delta)
      .filter(col("rank") === 1L).select("neighbor_id"))
    assert(top1 == Seq(Seq(0L)),
      s"tiered query must rank the newest delta vector first, got $top1")
    // quiesced fold: delta pruned, bulk-only search preserves results
    Streams.compactIvfDelta(spark, delta, "ivfstream", numBuckets = 4)
    assert(!new java.io.File(delta).listFiles()
      .exists(_.getName.startsWith("batch=")), "folded delta pruned")
    assert(spark.table("ivfstream_cells").count() == emb.count())
    assert(rows(spark.table("ivfstream_cells")
      .filter(col("vec_id") === 0L).select("nrm")) == cloneNrm,
      "the NEWEST delta batch won the fold")
    // restore id 0 so the result-preservation checks below see the
    // original corpus
    spark.createDataFrame(spark.sparkContext.parallelize(orig0),
        spark.table("ivfstream_cells").schema)
      .write.mode("overwrite").parquet(s"$delta/batch=104")
    Streams.compactIvfDelta(spark, delta, "ivfstream", numBuckets = 4)
    assert(rows(Similarity.ivfTopKAgainstIndex(queries, "ivfstream")
      .orderBy("query_id", "rank")) == want)
    // tiered with an empty delta = plain bulk
    assert(rows(Similarity.ivfTopKTiered(queries, "ivfstream", delta)
      .orderBy("query_id", "rank")) == want)
    Seq("ivfstream", "ivffull").foreach(b =>
      Seq("_cells", "_centroids").foreach(sfx =>
        Tables.dropTable(spark, b + sfx)))
  }

  test("retrainIvfIndex: fold + rebuild bumps the generation; a stale " +
      "sink and a stale fold both fail loudly; retrained tiered search " +
      "= one-shot over the grown corpus") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.sources.Fixtures.table(spark, "/root/testdata/sf0.001",
      "embeddings").select("vec_id", "embedding")
    val initial = emb.filter(col("vec_id") < 100)
    val grown = emb.filter(col("vec_id") < 200)
    val later = emb.filter(col("vec_id") >= 100 && col("vec_id") < 200)
    val queries = emb.filter(col("vec_id") < 5)
    Seq("ivfgen", "ivfgenfull").foreach(b =>
      Seq("_cells", "_centroids").foreach(sfx =>
        Tables.dropTable(spark, b + sfx)))
    Similarity.writeIvfIndex(initial, "ivfgen", nlist = 16, numBuckets = 4)
    assert(Similarity.ivfGeneration(spark, "ivfgen") == 0L)
    val delta = Files.createTempDirectory("ivfgendelta").toString
    val cp = Files.createTempDirectory("ivfgencp").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val laterRows = later.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val q = Streams.ivfIngestSink(mem.toDF().toDF("vec_id", "embedding"),
      "ivfgen", delta, cp)
    try { mem.addData(laterRows: _*); q.processAllAvailable() }
    finally q.stop()
    // quiesced retrain: outstanding delta folds first, then the rebuild
    // bumps the generation and prunes nothing it shouldn't
    Similarity.retrainIvfIndex(spark, "ivfgen", delta, nlist = 16,
      numBuckets = 4)
    assert(Similarity.ivfGeneration(spark, "ivfgen") == 1L)
    assert(!new java.io.File(delta).listFiles()
      .exists(_.getName.startsWith("batch=")), "delta folded before retrain")
    // retrained index answers exactly like a one-shot build over the
    // concatenated corpus (same deterministic seeds, same iters)
    Similarity.writeIvfIndex(grown, "ivfgenfull", nlist = 16,
      numBuckets = 4)
    val want = rows(Similarity.ivfTopKAgainstIndex(queries, "ivfgenfull")
      .orderBy("query_id", "rank"))
    assert(want.nonEmpty && rows(
      Similarity.ivfTopKTiered(queries, "ivfgen", delta)
        .orderBy("query_id", "rank")) == want)
    // STALE SINK: a rebuild under a running sink must fail its next
    // batch loudly (the assignments would point into dead centroids)
    val cp2 = Files.createTempDirectory("ivfgencp2").toString
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val q2 = Streams.ivfIngestSink(mem2.toDF().toDF("vec_id", "embedding"),
      "ivfgen", delta, cp2)
    try {
      Similarity.writeIvfIndex(grown, "ivfgen", nlist = 16, numBuckets = 4)
      assert(Similarity.ivfGeneration(spark, "ivfgen") == 2L)
      mem2.addData(laterRows.head)
      val ex = intercept[Exception] { q2.processAllAvailable() }
      assert(ex.toString.contains("dead centroid generation"),
        s"expected the stale-sink refusal, got: $ex")
    } finally q2.stop()
    // STALE FOLD: the delta tree is stamped with the generation that
    // assigned it (gen 1 at q2 start) — folding it into the gen-2 index
    // must refuse
    spark.table("ivfgen_cells").limit(2)
      .write.mode("overwrite").parquet(s"$delta/batch=7")
    val ex2 = intercept[IllegalStateException] {
      Streams.compactIvfDelta(spark, delta, "ivfgen", numBuckets = 4)
    }
    assert(ex2.getMessage.contains("dead centroids"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(delta))
    Seq("ivfgen", "ivfgenfull").foreach(b =>
      Seq("_cells", "_centroids").foreach(sfx =>
        Tables.dropTable(spark, b + sfx)))
  }

  test("retrainPqIndex: fold + rebuild from the SOURCE corpus bumps the " +
      "generation and the residual stamp survives; a source smaller " +
      "than the folded index refuses (lossy codes would silently drop " +
      "streamed vectors); a stale sink fails loudly after the retrain") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.sources.Fixtures.table(spark, "/root/testdata/sf0.001",
      "embeddings").select("vec_id", "embedding")
    val initial = emb.filter(col("vec_id") < 100)
    val grown = emb.filter(col("vec_id") < 200)
    val later = emb.filter(col("vec_id") >= 100 && col("vec_id") < 200)
    val queries = emb.filter(col("vec_id") < 5)
    Seq("pqgen", "pqgenfull").foreach(b =>
      Seq("_pqcodes", "_pqmeta").foreach(sfx =>
        Tables.dropTable(spark, b + sfx)))
    // round-19 default build: residual (IVFADC) — the retrain must
    // carry the stamp through without the caller restating it
    Similarity.writePqIndex(initial, "pqgen", nlist = 16, m = 4,
      kcent = 16, dim = 64, numBuckets = 4)
    assert(Similarity.pqGeneration(spark, "pqgen") == 0L)
    assert(Similarity.pqIsResidual(spark, "pqgen"))
    val delta = Files.createTempDirectory("pqgendelta").toString
    val cp = Files.createTempDirectory("pqgencp").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val laterRows = later.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val q = Streams.pqIngestSink(mem.toDF().toDF("vec_id", "embedding"),
      "pqgen", delta, cp)
    try { mem.addData(laterRows: _*); q.processAllAvailable() }
    finally q.stop()
    // COUNT GUARD: retraining from the ORIGINAL 100-row corpus after
    // 100 more streamed in would silently drop them from the lossy
    // codes — refuse. (The fold inside the failed attempt is fine: it
    // leaves a complete, queryable single-tier index.)
    val eSmall = intercept[IllegalArgumentException] {
      Similarity.retrainPqIndex(spark, "pqgen", delta, initial,
        nlist = 16, m = 4, kcent = 16, dim = 64, numBuckets = 4)
    }
    assert(eSmall.getMessage.contains("missing streamed"))
    assert(Similarity.pqGeneration(spark, "pqgen") == 0L,
      "a refused retrain must not bump the generation")
    // quiesced retrain from the true grown source: generation bumps,
    // stamp survives, and the index answers exactly like a one-shot
    // build over the same corpus (deterministic seeds)
    Similarity.retrainPqIndex(spark, "pqgen", delta, grown, nlist = 16,
      m = 4, kcent = 16, dim = 64, numBuckets = 4)
    assert(Similarity.pqGeneration(spark, "pqgen") == 1L)
    assert(Similarity.pqIsResidual(spark, "pqgen"),
      "the residual kind must survive a retrain")
    assert(!new java.io.File(delta).listFiles()
      .exists(_.getName.startsWith("batch=")), "delta folded + pruned")
    Similarity.writePqIndex(grown, "pqgenfull", nlist = 16, m = 4,
      kcent = 16, dim = 64, numBuckets = 4)
    val want = rows(Similarity.ivfPqTopKIndexed(queries, "pqgenfull",
      k = 10, nprobe = 4, dim = 64).orderBy("query_id", "rank"))
    assert(want.nonEmpty && rows(
      Similarity.ivfPqTopKIndexed(queries, "pqgen", k = 10, nprobe = 4,
        dim = 64).orderBy("query_id", "rank")) == want)
    // STALE SINK: a retrain under a running sink must fail the sink's
    // next batch loudly (its captured codebooks are a dead generation)
    val cp2 = Files.createTempDirectory("pqgencp2").toString
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val q2 = Streams.pqIngestSink(mem2.toDF().toDF("vec_id", "embedding"),
      "pqgen", delta, cp2)
    try {
      Similarity.retrainPqIndex(spark, "pqgen", delta, grown, nlist = 16,
        m = 4, kcent = 16, dim = 64, numBuckets = 4)
      assert(Similarity.pqGeneration(spark, "pqgen") == 2L)
      mem2.addData(laterRows.head)
      val ex = intercept[Exception] { q2.processAllAvailable() }
      assert(ex.toString.contains("rebuilt under this sink"),
        s"expected the stale-sink refusal, got: $ex")
    } finally q2.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(delta))
    Seq("pqgen", "pqgenfull").foreach(b =>
      Seq("_pqcodes", "_pqmeta").foreach(sfx =>
        Tables.dropTable(spark, b + sfx)))
  }

  test("calibration contract survives retrain (round 20): a calibrated " +
      "build streams, retrains WITHOUT restating the target, and " +
      "autoNprobe still serves off a freshly-measured pair; the spec, " +
      "fingerprint and stamp all ride the rebuilt meta; explicit " +
      "targets at retrain override and become the new contract") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.sources.Fixtures.table(spark, "/root/testdata/sf0.001",
      "embeddings").select("vec_id", "embedding")
    val initial = emb.filter(col("vec_id") < 100)
    val grown = emb.filter(col("vec_id") < 200)
    val later = emb.filter(col("vec_id") >= 100 && col("vec_id") < 200)
    val queries = emb.filter(col("vec_id") < 5)
    Seq("_pqcodes", "_pqmeta").foreach(s =>
      Tables.dropTable(spark, "pqcal" + s))
    Seq("_cells", "_centroids").foreach(s =>
      Tables.dropTable(spark, "ivfcal" + s))
    // PQ: both calibration modes + the implied fingerprint
    Similarity.writePqIndex(initial, "pqcal", nlist = 16, m = 8,
      kcent = 32, dim = 64, numBuckets = 4,
      targetRecall = Some(0.25), refinedTargetRecall = Some(0.8),
      recallK = 4, recallSample = 16, maxNprobe = 16, maxShortlist = 64,
      marginZ = 0.0)
    val spec0 = Similarity.pqCalibrationSpec(spark, "pqcal",
      refined = true)
    assert(spec0.contains(Similarity.CalSpec(0.8, 0.0, 4, 16, 16,
      Some(64))), s"persisted refined spec: $spec0")
    assert(Similarity.pqCalibrationSpec(spark, "pqcal", refined = false)
      .contains(Similarity.CalSpec(0.25, 0.0, 4, 16, 16, None)))
    val fp0 = Similarity.pqCalibrationFingerprint(spark, "pqcal")
    assert(fp0.exists(_._2.length == 11), s"fingerprint: $fp0")
    val pair0 = Similarity.calibratedRefined(spark, "pqcal")
    assert(pair0.nonEmpty)
    // stream 100 more vectors, then retrain WITHOUT restating anything
    val delta = Files.createTempDirectory("pqcaldelta").toString
    val cp = Files.createTempDirectory("pqcalcp").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val laterRows = later.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val q = Streams.pqIngestSink(mem.toDF().toDF("vec_id", "embedding"),
      "pqcal", delta, cp)
    try { mem.addData(laterRows: _*); q.processAllAvailable() }
    finally q.stop()
    Similarity.retrainPqIndex(spark, "pqcal", delta, grown, nlist = 16,
      m = 8, kcent = 32, dim = 64, numBuckets = 4)
    assert(Similarity.pqGeneration(spark, "pqcal") == 1L)
    // the contract survived: spec rows identical, a fresh pair was
    // MEASURED against the new density (it may differ from pair0), and
    // autoNprobe serves without the caller re-plumbing anything
    assert(Similarity.pqCalibrationSpec(spark, "pqcal", refined = true)
      == spec0, "refined spec must survive the retrain")
    assert(Similarity.pqCalibrationSpec(spark, "pqcal", refined = false)
      .contains(Similarity.CalSpec(0.25, 0.0, 4, 16, 16, None)))
    assert(Similarity.calibratedRefined(spark, "pqcal").nonEmpty,
      "retrain must re-measure the refined pair from the stored target")
    assert(Similarity.calibratedPqNprobe(spark, "pqcal").nonEmpty)
    assert(Similarity.pqCalibrationFingerprint(spark, "pqcal")
      .exists(_._2.length == 11), "fingerprint must survive the retrain")
    assert(Similarity.pqIsResidual(spark, "pqcal"))
    Seq("_cells", "_centroids").foreach(s =>
      Tables.dropTable(spark, "pqcal_ivf" + s))
    Similarity.writeIvfIndex(grown, "pqcal_ivf", nlist = 16,
      numBuckets = 4)
    assert(rows(Similarity.ivfPqTopKRefined(queries, "pqcal",
      "pqcal_ivf", k = 4, dim = 64, autoNprobe = true)
      .orderBy("query_id", "rank")).nonEmpty,
      "autoNprobe must serve after an untargeted retrain")
    // explicit target at retrain OVERRIDES and becomes the new contract
    Similarity.retrainPqIndex(spark, "pqcal", delta, grown, nlist = 16,
      m = 8, kcent = 32, dim = 64, numBuckets = 4,
      refinedTargetRecall = Some(0.6), recallK = 4, recallSample = 8,
      maxNprobe = 16, maxShortlist = 32, marginZ = 0.0)
    assert(Similarity.pqCalibrationSpec(spark, "pqcal", refined = true)
      .contains(Similarity.CalSpec(0.6, 0.0, 4, 8, 16, Some(32))))
    assert(Similarity.pqCalibrationSpec(spark, "pqcal", refined = false)
      .isEmpty, "an explicit retrain target replaces the whole contract")
    // IVF twin: the cal_spec column drives the default recalibration
    Similarity.writeIvfIndex(initial, "ivfcal", nlist = 16,
      numBuckets = 4, targetRecall = Some(0.6), recallK = 4,
      recallSample = 16, maxNprobe = 16, marginZ = 0.0)
    assert(Similarity.ivfCalibrationSpec(spark, "ivfcal")
      .contains(Similarity.CalSpec(0.6, 0.0, 4, 16, 16, None)))
    assert(Similarity.calibratedNprobe(spark, "ivfcal").nonEmpty)
    val delta2 = Files.createTempDirectory("ivfcaldelta").toString
    val cp2 = Files.createTempDirectory("ivfcalcp").toString
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val q2 = Streams.ivfIngestSink(mem2.toDF().toDF("vec_id", "embedding"),
      "ivfcal", delta2, cp2)
    try { mem2.addData(laterRows: _*); q2.processAllAvailable() }
    finally q2.stop()
    Similarity.retrainIvfIndex(spark, "ivfcal", delta2, nlist = 16,
      numBuckets = 4)
    assert(Similarity.ivfGeneration(spark, "ivfcal") == 1L)
    assert(Similarity.ivfCalibrationSpec(spark, "ivfcal")
      .contains(Similarity.CalSpec(0.6, 0.0, 4, 16, 16, None)),
      "the IVF calibration contract must survive an untargeted retrain")
    assert(Similarity.calibratedNprobe(spark, "ivfcal").nonEmpty,
      "retrain must re-measure cal_nprobe from the stored target")
    assert(rows(Similarity.ivfTopKAgainstIndex(queries, "ivfcal", k = 4,
      autoNprobe = true).orderBy("query_id", "rank")).nonEmpty)
    Seq(delta, delta2).foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    Seq("_pqcodes", "_pqmeta").foreach(s =>
      Tables.dropTable(spark, "pqcal" + s))
    Seq("_cells", "_centroids").foreach { s =>
      Tables.dropTable(spark, "ivfcal" + s)
      Tables.dropTable(spark, "pqcal_ivf" + s)
    }
  }

  test("compactIvfDelta / compactPqDelta: a MARKER-LESS delta tree with " +
      "batch dirs refuses the fold (unknown assigning generation)") {
    import graft.operators.Similarity
    val emb = graft.sources.Fixtures.table(spark, "/root/testdata/sf0.001",
      "embeddings").select("vec_id", "embedding")
    Seq("_cells", "_centroids").foreach(sfx =>
      Tables.dropTable(spark, "ivforph" + sfx))
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 100), "ivforph",
      nlist = 16, numBuckets = 4)
    // an orphan tree: batch dirs present, no _routing_gen marker (the
    // partially-cleaned state a dead sink can leave behind)
    val delta = Files.createTempDirectory("ivforphdelta").toString
    spark.table("ivforph_cells").limit(2)
      .write.mode("overwrite").parquet(s"$delta/batch=0")
    val ex = intercept[IllegalStateException] {
      Streams.compactIvfDelta(spark, delta, "ivforph", numBuckets = 4)
    }
    assert(ex.getMessage.contains("no routing-generation marker"), ex)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(delta))
    Seq("_cells", "_centroids").foreach(sfx =>
      Tables.dropTable(spark, "ivforph" + sfx))
    // PQ twin
    Seq("_pqcodes", "_pqmeta").foreach(sfx =>
      Tables.dropTable(spark, "pqorph" + sfx))
    Similarity.writePqIndex(emb.filter(col("vec_id") < 100), "pqorph",
      nlist = 16, m = 4, kcent = 16, dim = 64, numBuckets = 4,
      residual = false)
    val delta2 = Files.createTempDirectory("pqorphdelta").toString
    spark.table("pqorph_pqcodes").limit(2)
      .write.mode("overwrite").parquet(s"$delta2/batch=0")
    val ex2 = intercept[IllegalStateException] {
      Streams.compactPqDelta(spark, delta2, "pqorph", numBuckets = 4)
    }
    assert(ex2.getMessage.contains("no routing-generation marker"), ex2)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(delta2))
    Seq("_pqcodes", "_pqmeta").foreach(sfx =>
      Tables.dropTable(spark, "pqorph" + sfx))
  }

  test("ivfIngestSink: restarting over a stale-generation delta tree " +
      "with unfolded batches refuses to restamp the marker") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.sources.Fixtures.table(spark, "/root/testdata/sf0.001",
      "embeddings").select("vec_id", "embedding")
    Seq("_cells", "_centroids").foreach(sfx =>
      Tables.dropTable(spark, "ivfstale" + sfx))
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 100), "ivfstale",
      nlist = 16, numBuckets = 4)
    val delta = Files.createTempDirectory("ivfstaledelta").toString
    val cp = Files.createTempDirectory("ivfstalecp").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val someRows = emb.filter(col("vec_id") >= 100 && col("vec_id") < 110)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    // sink under gen 0 leaves an UNFOLDED batch in the tree
    val q = Streams.ivfIngestSink(mem.toDF().toDF("vec_id", "embedding"),
      "ivfstale", delta, cp)
    try { mem.addData(someRows: _*); q.processAllAvailable() }
    finally q.stop()
    assert(new java.io.File(delta).listFiles()
      .exists(_.getName.startsWith("batch=")))
    // rebuild bumps the generation while the old batch still sits there
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 100), "ivfstale",
      nlist = 16, numBuckets = 4)
    assert(Similarity.ivfGeneration(spark, "ivfstale") == 1L)
    // a restarted sink must NOT stamp gen 1 over the gen-0 tree — that
    // would launder the stale assignments past compactIvfDelta's guard
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val cp2 = Files.createTempDirectory("ivfstalecp2").toString
    val ex = intercept[IllegalStateException] {
      Streams.ivfIngestSink(mem2.toDF().toDF("vec_id", "embedding"),
        "ivfstale", delta, cp2)
    }
    assert(ex.getMessage.contains("unfolded batches"))
    // and the compaction guard still sees the ORIGINAL generation
    val ex2 = intercept[IllegalStateException] {
      Streams.compactIvfDelta(spark, delta, "ivfstale", numBuckets = 4)
    }
    assert(ex2.getMessage.contains("dead centroids"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(delta))
    Seq("_cells", "_centroids").foreach(sfx =>
      Tables.dropTable(spark, "ivfstale" + sfx))
  }

  test("scd2Sink: a pure-late-straggler batch clamps to the table's " +
      "newest version boundary — no valid_to < valid_from rows") {
    implicit val sqlCtx = spark.sqlContext
    Seq("scd_l", "scd_l__swap_tmp", "scd_l__swap_backup")
      .foreach(Tables.dropTable(spark, _))
    val cp = Files.createTempDirectory("scdlcp").toString
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.scd2Sink(mem.toDF().toDF("id", "v", "ts"),
      "scd_l", cp, "id", "ts")
    try {
      mem.addData((1L, "a", ts("2030-01-05 00:00:00")))
      q.processAllAvailable()
      // batch 1 is ONLY late events (event time before the open
      // version's valid_from) and key 1 changes: effective clamps to
      // 2030-01-05, so the closed row has valid_to == valid_from (zero
      // duration), never negative
      mem.addData((1L, "b", ts("2030-01-03 00:00:00")),
        (2L, "c", ts("2030-01-02 00:00:00")))
      q.processAllAvailable()
      val t = spark.table("scd_l")
      assert(t.filter(col("valid_to") < col("valid_from")).isEmpty,
        "clamp must prevent inverted validity ranges")
      assert(rows(t.orderBy("id", "valid_from")) == Seq(
        Seq(1L, "a", ts("2030-01-05 00:00:00"), ts("2030-01-05 00:00:00")),
        Seq(1L, "b", ts("2030-01-05 00:00:00"), null),
        Seq(2L, "c", ts("2030-01-05 00:00:00"), null)))
    } finally q.stop()
    Seq("scd_l", "scd_l__swap_tmp", "scd_l__swap_backup")
      .foreach(Tables.dropTable(spark, _))
  }

  test("scd2Sink: a NO-CHANGE batch does not advance the clamp " +
      "boundary — a later straggler clamps to a valid_from the table " +
      "really holds, crash or no crash") {
    implicit val sqlCtx = spark.sqlContext
    Seq("scd_nc", "scd_nc__swap_tmp", "scd_nc__swap_backup")
      .foreach(Tables.dropTable(spark, _))
    val cp = Files.createTempDirectory("scdnccp").toString
    val mem = MemoryStream[(Long, String, Timestamp)]
    def start() = Streams.scd2Sink(mem.toDF().toDF("id", "v", "ts"),
      "scd_nc", cp, "id", "ts")
    val q = start()
    try {
      mem.addData((1L, "a", ts("2030-01-05 00:00:00")))
      q.processAllAvailable()
      // batch 2 repeats the identical attribute at a LATER event time:
      // the merge is a no-op (nothing opened or closed), so NO row with
      // valid_from = 2030-01-08 exists — the boundary must stay 01-05
      mem.addData((1L, "a", ts("2030-01-08 00:00:00")))
      q.processAllAvailable()
      // batch 3 is a late straggler with a real change: it must clamp
      // to the table's REAL max(valid_from) (01-05), not the phantom
      // 01-08 a naive boundary advance would have cached
      mem.addData((1L, "b", ts("2030-01-02 00:00:00")))
      q.processAllAvailable()
      val t1 = rows(spark.table("scd_nc").orderBy("valid_from", "v"))
      assert(t1 == Seq(
        Seq(1L, "a", ts("2030-01-05 00:00:00"), ts("2030-01-05 00:00:00")),
        Seq(1L, "b", ts("2030-01-05 00:00:00"), null)),
        s"boundary advanced on a no-change batch: $t1")
    } finally q.stop()
    // crash-equivalence: replay the same three batches with a restart
    // after the no-change batch — the restarted sink re-derives the
    // boundary from the table (01-05) and must produce the SAME table
    Seq("scd_nc", "scd_nc__swap_tmp", "scd_nc__swap_backup")
      .foreach(Tables.dropTable(spark, _))
    val cp2 = Files.createTempDirectory("scdnccp2").toString
    val mem2 = MemoryStream[(Long, String, Timestamp)]
    def start2() = Streams.scd2Sink(mem2.toDF().toDF("id", "v", "ts"),
      "scd_nc", cp2, "id", "ts")
    val qa = start2()
    try {
      mem2.addData((1L, "a", ts("2030-01-05 00:00:00")))
      qa.processAllAvailable()
      mem2.addData((1L, "a", ts("2030-01-08 00:00:00")))
      qa.processAllAvailable()
    } finally qa.stop()
    val qb = start2()
    try {
      mem2.addData((1L, "b", ts("2030-01-02 00:00:00")))
      qb.processAllAvailable()
      val t2 = rows(spark.table("scd_nc").orderBy("valid_from", "v"))
      assert(t2 == Seq(
        Seq(1L, "a", ts("2030-01-05 00:00:00"), ts("2030-01-05 00:00:00")),
        Seq(1L, "b", ts("2030-01-05 00:00:00"), null)),
        s"restart path diverged from the no-crash path: $t2")
    } finally qb.stop()
    Seq("scd_nc", "scd_nc__swap_tmp", "scd_nc__swap_backup")
      .foreach(Tables.dropTable(spark, _))
  }

  test("driftSink: cumulative KS verdict converges to the batch statistic") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val ref = Files.createTempDirectory("driftref").toString + "/counts"
    val cnt = Files.createTempDirectory("driftcnt").toString
    val out = Files.createTempDirectory("driftout").toString
    val cp = Files.createTempDirectory("driftcp").toString
    val refData = Seq(1L, 1L, 2L, 3L).toDF("value")
    graft.operators.Curation.valueCounts(refData, "value")
      .write.parquet(ref)
    val q = Streams.driftSink(mem.toDF().toDF("value"), ref, cnt, out, cp)
    try {
      mem.addData(2L, 3L)
      q.processAllAvailable()
      // batch 0: observed {2,3} vs ref {1,1,2,3}: d_cross at v=1 is
      // |2*2 - 0*4| = 4 -> d_micro = 4e6/8 = 500000
      assert(rows(spark.read.parquet(s"$out/batch=0")).head ==
        Seq(4L, 2L, 3L, 4L, 500000L))
      mem.addData(3L, 4L)
      q.processAllAvailable()
      // cumulative {2,3,3,4}: the hand-computed ksDrift example
      val last = rows(spark.read.parquet(s"$out/batch=1")).head
      assert(last == Seq(4L, 4L, 4L, 8L, 500000L))
      assert(last == rows(graft.operators.Curation.ksDrift(
        refData, Seq(2L, 3L, 3L, 4L).toDF("value"), "value")).head)
    } finally q.stop()
  }

  test("driftByGroupSink: per-group KS verdicts converge to the grouped " +
      "batch statistic") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val ref = Files.createTempDirectory("gdriftref").toString + "/counts"
    val cnt = Files.createTempDirectory("gdriftcnt").toString
    val out = Files.createTempDirectory("gdriftout").toString
    val cp = Files.createTempDirectory("gdriftcp").toString
    val refData = Seq(("x", 1L), ("x", 1L), ("x", 2L), ("x", 3L),
      ("y", 7L)).toDF("source", "value")
    graft.operators.Curation.valueCountsByGroup(refData, "value", "source")
      .write.parquet(ref)
    val q = Streams.driftByGroupSink(mem.toDF().toDF("source", "value"),
      ref, cnt, out, cp)
    try {
      mem.addData(("x", 2L), ("x", 3L), ("y", 7L))
      q.processAllAvailable()
      mem.addData(("x", 3L), ("x", 4L))
      q.processAllAvailable()
      // cumulative observed: x -> {2,3,3,4} (the hand-computed ksDrift
      // example vs ref {1,1,2,3}), y -> {7} (identical to ref: D = 0)
      val got = rows(spark.read.parquet(s"$out/batch=1")
        .orderBy("source"))
      assert(got == Seq(
        Seq("x", 4L, 4L, 4L, 8L, 500000L),
        Seq("y", 1L, 1L, 1L, 0L, 0L)))
      // equals the batch operator over the concatenated observed input
      val observed = Seq(("x", 2L), ("x", 3L), ("x", 3L), ("x", 4L),
        ("y", 7L)).toDF("source", "value")
      assert(got == rows(graft.operators.Curation.ksDriftByGroup(
        refData, observed, "value", "source").orderBy("source")))
    } finally q.stop()
  }

  test("compactIndexBucketed self-heals a crashed swap before folding") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val idx = Files.createTempDirectory("healidx").toString
    val pairs = Files.createTempDirectory("healpairs").toString
    val cp = Files.createTempDirectory("healcp").toString
    Seq("ndheal_bands", "ndheal_sigs", "ndheal_sigs__swap_backup",
      "ndheal_bands__swap_backup").foreach(Tables.dropTable(spark, _))
    val q1 = Streams.nearDupSink(mem.toDF().toDF("doc_id", "text"),
      idx, pairs, cp, bucketedBase = Some("ndheal"))
    try {
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "completely different words about spark query engines at scale"))
      q1.processAllAvailable()
    } finally q1.stop()
    Streams.compactIndexBucketed(spark, idx, "ndheal", numBuckets = 4)
    // simulate the recoverSwap roll-back window on ONE of the two bulk
    // tables (crash after `main -> backup`, tmp lost): sigs main gone
    spark.sql("ALTER TABLE ndheal_sigs RENAME TO ndheal_sigs__swap_backup")
    // the half-present state refuses to serve rather than degrade
    // (write the probe batch's partitions first, as the sink always does)
    val sigs = graft.operators.Dedup.minhashSignatures(
      Seq((9L, "whatever text")).toDF("doc_id", "text"))
    sigs.write.mode("overwrite").parquet(s"$idx/batch=9")
    graft.operators.Dedup.minhashBandRows(sigs)
      .write.mode("overwrite").parquet(s"${idx}__bands/batch=9")
    intercept[IllegalStateException] {
      Streams.tieredPairs(spark, idx, idx + "__bands", sigs,
        graft.operators.Dedup.minhashBandRows(sigs), 9L, Some("ndheal"),
        0.5, 128, 32, "doc_id", None)
    }
    // drop the probe partitions so the re-fold sees only real batches
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx, "batch=9"), true)
    fs.delete(new org.apache.hadoop.fs.Path(idx + "__bands", "batch=9"), true)
    // the documented recovery is just "re-run the fold": it recovers the
    // swap, then folds idempotently
    Streams.compactIndexBucketed(spark, idx, "ndheal", numBuckets = 4)
    assert(spark.catalog.tableExists("ndheal_sigs") &&
      spark.catalog.tableExists("ndheal_bands"))
    assert(spark.table("ndheal_sigs").count() == 2L)
    // resumed stream pairs against the healed bulk tier
    val q2 = Streams.nearDupSink(mem.toDF().toDF("doc_id", "text"),
      idx, pairs, cp, bucketedBase = Some("ndheal"))
    try {
      mem.addData(
        (3L, "the quick brown fox jumps over the lazy dog again and again"))
      q2.processAllAvailable()
      assert(rows(spark.read.parquet(pairs).select("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")) == Seq(Seq(1L, 3L)))
    } finally q2.stop()
    Seq("ndheal_bands", "ndheal_sigs").foreach(Tables.dropTable(spark, _))
  }

  test("tieredPairs fails loudly on a half-present bulk index instead of " +
      "silently dropping the folded corpus") {
    // an unrecovered crash inside the bucketed fold could leave exactly
    // one of the two bulk tables; degrading to delta-only there would
    // make every folded document invisible to admission (intakeSink
    // would admit near-dups of the whole corpus). The contract is: both
    // tables, or neither, or refuse to run.
    val idx = Files.createTempDirectory("halfidx").toString
    val sigs = graft.operators.Dedup.minhashSignatures(
      Seq((1L, "some text about engines")).toDF("doc_id", "text"))
    sigs.write.mode("overwrite").parquet(s"$idx/batch=0")
    val newSigs = spark.read.parquet(s"$idx/batch=0")
    val newBands = graft.operators.Dedup.minhashBandRows(newSigs)
    newBands.write.mode("overwrite").parquet(s"${idx}__bands/batch=0")
    def pairs() = Streams.tieredPairs(spark, idx, idx + "__bands", newSigs,
      newBands, 0L, Some("ndhalf"), 0.5, 128, 32, "doc_id", None)
    Tables.dropTable(spark, "ndhalf_bands")
    Tables.dropTable(spark, "ndhalf_sigs")
    // neither table: fine — delta-only is the pre-first-fold state
    assert(rows(pairs()).isEmpty)
    // exactly one table: refuse
    Tables.loadBucketed(newBands
      .withColumn("bb", org.apache.spark.sql.functions.expr(
        "CAST(band AS BIGINT) * CAST(pow(2, 31) AS BIGINT) + bucket")),
      "ndhalf_bands", "bb", 4)
    intercept[IllegalStateException] { pairs() }
    // both tables: runs
    Tables.loadBucketed(newSigs.select("doc_id", "sig"), "ndhalf_sigs",
      "doc_id", 4)
    assert(rows(pairs()).isEmpty) // only self-copies, shielded
    Tables.dropTable(spark, "ndhalf_bands")
    Tables.dropTable(spark, "ndhalf_sigs")
  }

  test("embeddingNearDupSink: batches pair against the grown 8-byte " +
      "signature index, corpus vectors never re-read") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val idx = Files.createTempDirectory("embidx").toString
    val pairs = Files.createTempDirectory("embpairs").toString
    val cp = Files.createTempDirectory("embcp").toString
    val q = Streams.embeddingNearDupSink(
      mem.toDF().toDF("vec_id", "embedding"),
      idx, pairs, cp, maxHamming = 5)
    val ones = (0 until 64).map(_ => 1.0f)
    val alt = (0 until 64).map(i => if (i % 2 == 0) 1.0f else -1.0f)
    try {
      // batch 0: two dissimilar vectors -> no pairs
      mem.addData((1L, ones), (2L, alt))
      q.processAllAvailable()
      assert(spark.read.parquet(pairs).count() == 0)
      // batch 1: a clone of vector 1 (hamming 0) and a novel antipode
      mem.addData((3L, ones), (4L, ones.map(-_)))
      q.processAllAvailable()
      assert(rows(spark.read.parquet(pairs).select("vec_a", "vec_b")
        .orderBy("vec_a", "vec_b")) == Seq(Seq(1L, 3L)))
      // the index holds one 8-byte signature row per vector ever seen
      val sigs = spark.read.parquet(idx)
      assert(sigs.count() == 4L)
      assert(sigs.schema("sig").dataType ==
        org.apache.spark.sql.types.LongType)
    } finally q.stop()
  }

  test("embeddingNearDupSink tiered: fold into bucketed tables, resumed " +
      "batches pair against the bulk tier") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val idx = Files.createTempDirectory("etieridx").toString
    val pairs = Files.createTempDirectory("etierpairs").toString
    val cp = Files.createTempDirectory("etiercp").toString
    Tables.dropTable(spark, "embulk_bands")
    Tables.dropTable(spark, "embulk_sigs")
    val ones = (0 until 64).map(_ => 1.0f)
    val alt = (0 until 64).map(i => if (i % 2 == 0) 1.0f else -1.0f)
    def start() = Streams.embeddingNearDupSink(
      mem.toDF().toDF("vec_id", "embedding"),
      idx, pairs, cp, maxHamming = 5, bucketedBase = Some("embulk"))
    val q1 = start()
    try {
      mem.addData((1L, ones), (2L, alt))
      q1.processAllAvailable()
    } finally q1.stop()
    // quiesced fold into the bucketed tier; delta partitions pruned
    Streams.compactEmbeddingIndexBucketed(spark, idx, "embulk",
      numBuckets = 4)
    assert(spark.table("embulk_sigs").count() == 2L)
    assert(!new java.io.File(idx).listFiles()
      .exists(_.getName.startsWith("batch=")), "folded delta pruned")
    // resume: a clone of bulk vector 1 must pair via the bucketed join
    val q2 = start()
    try {
      mem.addData((3L, ones))
      q2.processAllAvailable()
      assert(rows(spark.read.parquet(pairs).select("vec_a", "vec_b")
        .orderBy("vec_a", "vec_b")) == Seq(Seq(1L, 3L)))
    } finally q2.stop()
    Tables.dropTable(spark, "embulk_bands")
    Tables.dropTable(spark, "embulk_sigs")
  }

  test("tiered index crash window: docs in BOTH tiers produce no duplicate " +
      "pairs and the fold re-runs idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val idx = Files.createTempDirectory("crashidx").toString
    val pairs = Files.createTempDirectory("crashpairs").toString
    val cp = Files.createTempDirectory("crashcp").toString
    Tables.dropTable(spark, "crbulk_bands")
    Tables.dropTable(spark, "crbulk_sigs")
    val q1 = Streams.nearDupSink(mem.toDF().toDF("doc_id", "text"),
      idx, pairs, cp, bucketedBase = Some("crbulk"))
    try {
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "completely different words about spark query engines at scale"))
      q1.processAllAvailable()
    } finally q1.stop()
    // stage the crash: snapshot the delta tree, fold, then restore the
    // folded partitions — the state compactIndexBucketed leaves if it
    // dies after writing the bulk tables but before pruning the delta
    val snap = Files.createTempDirectory("crashsnap").toString
    // copy batch=* children so restores land inside the existing tree
    // (FileUtil.copy nests a dir under an existing destination)
    def copyChildren(from: String, to: String): Unit = {
      import org.apache.hadoop.fs.{FileUtil, Path}
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new Path(from).getFileSystem(conf)
      if (fs.exists(new Path(from)))
        fs.listStatus(new Path(from)).filter(_.getPath.getName.startsWith("batch="))
          .foreach { st =>
            FileUtil.copy(fs, st.getPath, fs,
              new Path(to, st.getPath.getName), false, conf)
          }
    }
    Files.createDirectories(java.nio.file.Paths.get(s"$snap/idx"))
    Files.createDirectories(java.nio.file.Paths.get(s"$snap/bands"))
    copyChildren(idx, s"$snap/idx")
    copyChildren(idx + "__bands", s"$snap/bands")
    Streams.compactIndexBucketed(spark, idx, "crbulk", numBuckets = 4)
    copyChildren(s"$snap/idx", idx)
    copyChildren(s"$snap/bands", idx + "__bands")
    assert(new java.io.File(idx).listFiles()
      .exists(_.getName.startsWith("batch=")), "crash state staged")
    // a batch duplicating doc 1 — now present in bulk AND delta — must
    // report the pair exactly once
    val q2 = Streams.nearDupSink(mem.toDF().toDF("doc_id", "text"),
      idx, pairs, cp, bucketedBase = Some("crbulk"))
    try {
      mem.addData(
        (3L, "the quick brown fox jumps over the lazy dog again and again"))
      q2.processAllAvailable()
      assert(rows(spark.read.parquet(pairs).select("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")) == Seq(Seq(1L, 3L)))
    } finally q2.stop()
    // re-running the fold from the crash state is idempotent: same bulk
    // content, delta pruned
    Streams.compactIndexBucketed(spark, idx, "crbulk", numBuckets = 4)
    assert(spark.table("crbulk_sigs").count() == 3L)
    assert(rows(spark.table("crbulk_sigs").select("doc_id").orderBy("doc_id"))
      .flatten == Seq(1L, 2L, 3L))
    assert(!new java.io.File(idx).listFiles()
      .exists(_.getName.startsWith("batch=")), "delta pruned on re-run")
  }

  test("nearDupSink: pre-band sig index is backfilled, stale band " +
      "partitions are pruned") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val idx = Files.createTempDirectory("bfidx").toString
    val pairs = Files.createTempDirectory("bfpairs").toString
    val cp = Files.createTempDirectory("bfcp").toString
    val bandsDir = idx + "__bands"
    // a corpus signed by a PRE-BAND version of the sink: signatures on
    // disk (batch=100, clear of MemoryStream's 0-based ids), no band
    // partition for them — without reconciliation these docs would
    // silently vanish from candidate generation
    graft.operators.Dedup.minhashSignatures(Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different words about spark query engines at scale"))
      .toDF("doc_id", "text"))
      .write.parquet(s"$idx/batch=100")
    // plus a band partition whose sig partition no longer exists (a
    // compacted-away leftover) — must be pruned, not joined
    Seq((99L, 0, 7L)).toDF("doc_id", "band", "bucket")
      .write.parquet(s"$bandsDir/batch=50")
    // the legacy tree predates the round-17 format stamp: attesting it
    // (the sigs above ARE current-format) is the documented migration
    // step before a sink may open it
    Streams.stampIndexFormat(spark, idx, "minhash-v1:n=3:h=128")
    val q = Streams.nearDupSink(mem.toDF().toDF("doc_id", "text"),
      idx, pairs, cp)
    try {
      mem.addData(
        (3L, "the quick brown fox jumps over the lazy dog again and again"),
        (4L, "totally novel content sharing no shingles with anything else"))
      q.processAllAvailable()
      // the clone paired with the legacy-index doc 1 via backfilled bands
      assert(rows(spark.read.parquet(pairs).select("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")) == Seq(Seq(1L, 3L)))
      val bandParts = new java.io.File(bandsDir).listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).toSet
      assert(bandParts.contains("batch=100"), "legacy sigs were banded")
      assert(!bandParts.contains("batch=50"), "stale band partition pruned")
    } finally q.stop()
  }

  test("chunkDedupSink: chunks dedup against earlier batches, edits keep heads") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val idx = Files.createTempDirectory("cdidx").toString
    val out = Files.createTempDirectory("cdout").toString
    val cp = Files.createTempDirectory("cdcp").toString
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val q = Streams.chunkDedupSink(mem.toDF().toDF("doc_id", "text"),
      idx, out, cp, avgTokens = 2)
    try {
      // batch 0: doc 1 original, doc 2 an exact copy -> fully deduped
      mem.addData((1L, base), (2L, base))
      q.processAllAvailable()
      val b0 = rows(spark.read.parquet(out).orderBy("doc_id"))
      assert(b0(0)(3) == base && b0(0)(1) == b0(0)(2))
      assert(b0(1)(2) == 0L && b0(1)(3) == "")
      // batch 1: doc 3 = doc 1 with one prepended token -> CDC keeps only
      // the perturbed head, everything after dedups against the index;
      // doc 4 is novel and survives whole
      mem.addData((3L, "x " + base), (4L, "novel tokens only here"))
      q.processAllAvailable()
      val b1 = rows(spark.read.parquet(out)
        .filter($"doc_id" >= 3L).orderBy("doc_id"))
      val kept3 = b1(0)(2).asInstanceOf[Long]
      assert(kept3 >= 1L && kept3 * 2 < b1(0)(1).asInstanceOf[Long],
        s"doc3 kept $kept3 of ${b1(0)(1)}")
      assert(b1(0)(3).asInstanceOf[String].startsWith("x"))
      assert(b1(1)(1) == b1(1)(2) && b1(1)(3) == "novel tokens only here")
      // batch 2: a verbatim re-send of batch 0's document dedups to zero
      // against the grown index
      mem.addData((5L, base))
      q.processAllAvailable()
      val b2 = rows(spark.read.parquet(out).filter($"doc_id" === 5L))
      assert(b2.head(2) == 0L && b2.head(3) == "")
    } finally q.stop()
  }

  test("spanDedupSink tiered: fold into the bucketed winhash table, " +
      "resumed batches drop folded spans; a folded-batch replay fails " +
      "loudly") {
    implicit val sqlCtx = spark.sqlContext
    Seq("spbulk_winhash", "spbulk_winhash__swap_tmp",
      "spbulk_winhash__swap_backup").foreach(Tables.dropTable(spark, _))
    val idx = Files.createTempDirectory("spidx").toString
    val out = Files.createTempDirectory("spout").toString
    val cp = Files.createTempDirectory("spcp").toString
    val shared = "a b c d e f g h"
    val mem = MemoryStream[(Long, String)]
    def start() = Streams.spanDedupSink(mem.toDF().toDF("doc_id", "text"),
      idx, out, cp, w = 8, bucketedBase = Some("spbulk"))
    val q1 = start()
    try {
      mem.addData((1L, shared + " x y"), (2L, "totally different words " +
        "about engines and planners over eight tokens"))
      q1.processAllAvailable()
    } finally q1.stop()
    // quiesced fold: the whole window set moves to the bucketed tier
    // and the delta tree is pruned
    Streams.compactSpanIndex(spark, idx, "spbulk", numBuckets = 4)
    assert(spark.table("spbulk_winhash").count() > 0)
    assert(!new java.io.File(idx).listFiles()
      .exists(_.getName.startsWith("batch=")))
    // resumed stream: doc 3 repeats doc 1's span -> dropped via the
    // bulk join; its novel tail survives
    val q2 = start()
    try {
      mem.addData((3L, shared + " fresh tail entirely new"))
      q2.processAllAvailable()
    } finally q2.stop()
    val b = rows(spark.read.parquet(out).filter(col("doc_id") === 3L))
    assert(b.head(2) == 8L && b.head(3) == "fresh tail entirely new",
      s"got ${b.head}")
    // plan proof on the sink's bulk flag-join shape: batch windows
    // against the bucketed winhash table must not re-shuffle the
    // bucketed (100 TB) side — it reads AT its bucketing
    locally {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      val batchWins = Seq((7L, 42L), (8L, 43L)).toDF("id", "h")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val frame = batchWins.join(
          spark.table("spbulk_winhash")
            .select(col("h"), col("h2").as("__h2b")),
          Seq("h"), "left")
        frame.collect()
        val plan = frame.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        def scanWithoutJoinBelow(p: SparkPlan): Boolean =
          if (p.toString.linesIterator.next().contains("spbulk_")) true
          else if (p.children.length != 1) false
          else scanWithoutJoinBelow(p.children.head)
        val offending = plan.collect {
          case e: SparkPlan with ShuffleExchangeLike
              if scanWithoutJoinBelow(e.children.head) => e
        }
        assert(offending.isEmpty,
          s"bucketed winhash side re-shuffled:\n${offending.mkString("\n")}")
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    // replay guard: folding over an uncommitted batch would make the
    // next (replayed) batch clean against its own windows — the sink
    // refuses batch ids at or below the fold watermark
    val cp2 = Files.createTempDirectory("spcp2").toString
    val mem2 = MemoryStream[(Long, String)]
    val q3 = Streams.spanDedupSink(mem2.toDF().toDF("doc_id", "text"),
      idx, out, cp2, w = 8, bucketedBase = Some("spbulk"))
    try {
      mem2.addData((9L, shared))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q3.processAllAvailable()
      }
      assert(e.getCause.getMessage.contains("already folded"), e.getCause)
    } finally q3.stop()
    Seq("spbulk_winhash", "spbulk_winhash__swap_tmp",
      "spbulk_winhash__swap_backup").foreach(Tables.dropTable(spark, _))
  }

  test("verifySpanIndex: zero residual on a real corpus (delta + folded " +
      "bulk tiers); an injected 128-bit composite collision is caught, " +
      "a 64-bit-only h collision is not flagged") {
    implicit val sqlCtx = spark.sqlContext
    Seq("vsbulk_winhash", "vsbulk_winhash__swap_tmp",
      "vsbulk_winhash__swap_backup").foreach(Tables.dropTable(spark, _))
    val idx = Files.createTempDirectory("vsidx").toString
    val out = Files.createTempDirectory("vsout").toString
    val cp = Files.createTempDirectory("vscp").toString
    val shared = "a b c d e f g h"
    val docs = Seq((1L, shared + " x y"), (2L, shared + " p q"),
      (3L, "completely different tokens across at least eight words here"))
    val mem = MemoryStream[(Long, String)]
    val q = Streams.spanDedupSink(mem.toDF().toDF("doc_id", "text"),
      idx, out, cp, w = 8, bucketedBase = Some("vsbulk"))
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val corpus = docs.toDF("doc_id", "text")
    // delta tree: real xxhash64 composites never collide on this corpus
    assert(Streams.verifySpanIndex(spark, idx, corpus, w = 8).isEmpty)
    // folded bulk tier (delta pruned -> exercises the no-batch-dirs
    // read path + the bucketed union leg): still zero residual
    Streams.compactSpanIndex(spark, idx, "vsbulk", numBuckets = 4)
    assert(Streams.verifySpanIndex(spark, idx, corpus, w = 8,
      bucketedBase = Some("vsbulk")).isEmpty)
    // injected collision: two DISTINCT window texts sharing one (h, h2)
    // composite — unconstructible from real text (that is the point of
    // 128 bits), so fabricate the window frame through the private seam
    // plus an index tree carrying the composites. The h-only collision
    // (same h, different h2) is exactly what the composite exists to
    // absorb — it must NOT be flagged.
    val idx2 = Files.createTempDirectory("vsidx2").toString
    // stamp the fabricated tree: the audit refuses unstamped data (the
    // round-17 format gate — drilled in its own test below)
    Streams.stampIndexFormat(spark, idx2, Streams.SpanIndexFormat)
    Seq((42L, 7L), (99L, 1L), (99L, 2L)).toDF("h", "h2")
      .write.parquet(s"$idx2/batch=0")
    val winsBad = Seq(
      (42L, 7L, "cookie banner text one"),
      (42L, 7L, "cookie banner text two"), // full composite collision
      (99L, 1L, "h collision text one"),
      (99L, 2L, "h collision text two"))   // h2 split: absorbed
      .toDF("h", "h2", "__wtxt")
    val res = Streams.verifySpanWindows(spark, idx2, winsBad, None)
    assert(rows(res.orderBy("h")) == Seq(
      Seq(42L, 7L, 2L, "cookie banner text one", "cookie banner text two")),
      "the audit must report exactly the 128-bit collision")
    // chunk-level twin: a real chunk index audits clean too
    val cidx = Files.createTempDirectory("vscidx").toString
    val cout = Files.createTempDirectory("vscout").toString
    val ccp = Files.createTempDirectory("vsccp").toString
    val mem2 = MemoryStream[(Long, String)]
    val q2 = Streams.chunkDedupSink(mem2.toDF().toDF("doc_id", "text"),
      cidx, cout, ccp, avgTokens = 4)
    try {
      mem2.addData(docs: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(Streams.verifyChunkIndex(spark, cidx, corpus,
      avgTokens = 4).isEmpty)
    Seq("vsbulk_winhash", "vsbulk_winhash__swap_tmp",
      "vsbulk_winhash__swap_backup").foreach(Tables.dropTable(spark, _))
  }

  test("index format gate: a pre-versioning tree refuses loudly at sink " +
      "open and in the audits; an old-format stamp names the rebuild; " +
      "stampIndexFormat is the attestation escape; compaction carries " +
      "the stamp through the tree swap") {
    implicit val sqlCtx = spark.sqlContext
    // 1. unstamped tree WITH data (the pre-round-17 on-disk state):
    // the sink must refuse instead of silently never-matching its h2
    // against an unknown-format index (VERDICT r16 what's-wrong #2)
    val idx = Files.createTempDirectory("fmtidx").toString
    Seq((1L, 2L)).toDF("h", "h2").write.parquet(s"$idx/batch=0")
    val out = Files.createTempDirectory("fmtout").toString
    val cp = Files.createTempDirectory("fmtcp").toString
    val mem = MemoryStream[(Long, String)]
    val q = Streams.spanDedupSink(mem.toDF().toDF("doc_id", "text"),
      idx, out, cp, w = 8)
    try {
      mem.addData((1L, "a b c d e f g h i"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getCause.getMessage.contains("_format"), e.getCause)
      assert(e.getCause.getMessage.contains("stampIndexFormat"), e.getCause)
      assert(e.getCause.getMessage.contains("verifySpanIndex"), e.getCause)
    } finally q.stop()
    // the audit refuses the same tree: an EMPTY residual must never
    // read as a clean audit of an incompatible index (ADVICE r16)
    val corpus = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val e2 = intercept[IllegalStateException] {
      Streams.verifySpanIndex(spark, idx, corpus, w = 8)
    }
    assert(e2.getMessage.contains("stampIndexFormat"), e2)
    // 2. an old-format stamp is named in the error with the rebuild path
    val idxOld = Files.createTempDirectory("fmtidxold").toString
    Streams.stampIndexFormat(spark, idxOld, "composite-hash-v1")
    Seq((1L, 2L)).toDF("h", "h2").write.parquet(s"$idxOld/batch=0")
    val e3 = intercept[IllegalStateException] {
      Streams.verifySpanIndex(spark, idxOld, corpus, w = 8)
    }
    assert(e3.getMessage.contains("composite-hash-v1") &&
      e3.getMessage.contains("REBUILD"), e3)
    // 3. attestation: stamping the unstamped tree (operator-verified
    // provenance) makes the audit — and a sink restart — accept it
    Streams.stampIndexFormat(spark, idx, Streams.SpanIndexFormat)
    assert(Streams.verifySpanIndex(spark, idx, corpus, w = 8).isEmpty)
    // 4. a fresh sink stamps its own tree at create; compactIndex's
    // whole-tree swap must carry the stamp (or the next open would
    // refuse a perfectly-current compacted index as unstamped)
    val cidx = Files.createTempDirectory("fmtcidx").toString
    val cout = Files.createTempDirectory("fmtcout").toString
    val ccp = Files.createTempDirectory("fmtccp").toString
    val mem2 = MemoryStream[(Long, String)]
    val q2 = Streams.chunkDedupSink(mem2.toDF().toDF("doc_id", "text"),
      cidx, cout, ccp, avgTokens = 4)
    try {
      mem2.addData((1L, "one two three four five six seven eight"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(Streams.readIndexFormat(spark, cidx)
      .contains(Streams.SpanIndexFormat))
    Streams.compactIndex(spark, cidx)(_.distinct())
    assert(Streams.readIndexFormat(spark, cidx)
      .contains(Streams.SpanIndexFormat),
      "compaction must carry the format stamp through the tree swap")
  }

  test("topTokensSink: finalized windows emit their exact top-k once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = Files.createTempDirectory("ttout").toString
    val cp = Files.createTempDirectory("ttcp").toString
    val q = Streams.topTokensSink(mem.toDF().toDF("ts", "text"),
      out, cp, k = 2, windowLength = "10 minutes", watermark = "5 minutes")
    try {
      // window [00:00, 00:10): a x3, b x2, c x1
      mem.addData(
        (ts("2024-01-01 00:01:00"), "a a b"),
        (ts("2024-01-01 00:05:00"), "a b c"))
      q.processAllAvailable()
      // nothing finalized yet — watermark has not passed the window end
      assert(new java.io.File(out).listFiles()
        .count(_.getName.startsWith("batch=")) == 0)
      // an event far past the window pushes the watermark over 00:10
      mem.addData((ts("2024-01-01 01:00:00"), "z"))
      q.processAllAvailable()
      val got = rows(spark.read.option("basePath", out).parquet(out)
        .select("token", "n", "rank").orderBy("rank"))
      assert(got == Seq(Seq("a", 3L, 1L), Seq("b", 2L, 2L)))
    } finally q.stop()
  }

  test("dedupStream: re-delivered keys are dropped across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = Streams.dedupStream(
      mem.toDF().toDF("event_id", "ts", "v"), "event_id", "ts")
    val q = out.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 00:00:00"), "a"),
        (1L, ts("2024-01-01 00:00:01"), "a-dup-same-batch"),
        (2L, ts("2024-01-01 00:00:02"), "b"))
      q.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 00:00:03"), "a-dup-next-batch"),
        (3L, ts("2024-01-01 00:00:04"), "c"))
      q.processAllAvailable()
      val got = rows(spark.table("dd").select("event_id", "v").orderBy("event_id"))
      assert(got == Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    } finally q.stop()
  }

  test("intervalJoinStream: joins within the trailing window only") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val signups = MemoryStream[(Long, Timestamp)]
    val out = Streams.intervalJoinStream(
      purchases.toDF().toDF("purchase_id", "user_id", "ts"), "user_id", "ts",
      signups.toDF().toDF("su_user", "su_ts"), "su_user", "su_ts",
      windowSeconds = 3600)
    val q = out.writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    try {
      signups.addData((7L, ts("2024-01-01 00:00:00")),
        (8L, ts("2024-01-01 00:00:00")))
      purchases.addData(
        (100L, 7L, ts("2024-01-01 00:30:00")), // 30 min after signup: joins
        (101L, 7L, ts("2024-01-01 02:00:00")), // 2h after: outside window
        (102L, 9L, ts("2024-01-01 00:10:00"))) // no signup for user 9
      q.processAllAvailable()
      val got = rows(spark.table("ij").select("purchase_id", "su_ts"))
      assert(got == Seq(Seq(100L, ts("2024-01-01 00:00:00"))))
    } finally q.stop()
  }

  test("sessionize: gap splits sessions, batch emits closed sessions") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Event]
    val q = Streams.sessionize(mem.toDS(), gapMs = 60_000L)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // two bursts 10 minutes apart in ONE batch: first session closes
      mem.addData(
        Streams.Event(1L, ts("2024-01-01 00:00:00")),
        Streams.Event(1L, ts("2024-01-01 00:00:30")),
        Streams.Event(1L, ts("2024-01-01 00:10:00")))
      q.processAllAvailable()
      val closed = rows(spark.table("sess")
        .select("user_id", "start", "end", "n_events"))
      assert(closed == Seq(Seq(1L, ts("2024-01-01 00:00:00"),
        ts("2024-01-01 00:00:30"), 2L)))
    } finally q.stop()
  }

  test("enrichStream: dim attributes attach per batch, unmatched kept on left") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = Streams.enrichStream(mem.toDF().toDF("user_id", "event_type"),
      dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData((1L, "click"), (3L, "view"))
      q.processAllAvailable()
      val out = rows(spark.table("enriched").orderBy("user_id"))
      assert(out == Seq(
        Seq(1L, "click", "gold"),
        Seq(3L, "view", null)))       // unmatched stream row survives
      // inner mode = allow-list: the unmatched row is dropped
      val q2 = Streams.enrichStream(mem.toDF().toDF("user_id", "event_type"),
        dim, "user_id", joinType = "inner")
        .writeStream.format("memory").queryName("allowed")
        .outputMode("append").start()
      try {
        q2.processAllAvailable()
        assert(rows(spark.table("allowed")).map(_(0)).toSet == Set(1L))
      } finally q2.stop()
    } finally q.stop()
  }

  test("removeRepeatedSpansWithinDoc composes directly onto a stream — " +
      "a pure projection needs no sink, state, or watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("intraout").toString
    val cp = Files.createTempDirectory("intracp").toString
    val q = graft.operators.Dedup.removeRepeatedSpansWithinDoc(
        mem.toDF().toDF("doc_id", "text"), w = 2)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      mem.addData((1L, "x y x y z"), (2L, "a b c"))
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(spark.read.parquet(out).orderBy("doc_id")) == Seq(
      // "x y" repeats at position 3 -> positions 3-4 drop
      Seq(1L, 5L, 2L, "x y z"),
      Seq(2L, 3L, 0L, "a b c")))
  }

  test("compactIndex: re-run after a mid-swap crash restores the index " +
      "from the backup — never deletes the only copy") {
    import org.apache.hadoop.fs.Path
    val idx = Files.createTempDirectory("cicrash").toString + "/tree"
    // a small counter tree: two batch dirs of (k, n) rows
    Seq(("a", 1L), ("b", 2L)).toDF("k", "n")
      .write.parquet(s"$idx/batch=0")
    Seq(("a", 3L)).toDF("k", "n")
      .write.parquet(s"$idx/batch=1")
    def total() = spark.read.option("basePath", idx).parquet(idx)
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(total() == 6L)
    // simulate the crash WINDOW between the two renames: main moved
    // aside to __compact_backup, nothing moved in yet (tmp may or may
    // not exist — leave a stale partial tmp to make recovery pick the
    // original)
    val fs = new Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new Path(idx), new Path(idx + "__compact_backup")))
    fs.mkdirs(new Path(idx + "__compact_tmp"))
    // recovery procedure = just re-run the compaction
    Streams.compactCounterPartials(spark, idx,
      keyCols = Seq("k"), sumCols = Seq("n"))
    val dirs = new java.io.File(idx).listFiles().filter(_.isDirectory)
      .map(_.getName).toSeq
    assert(dirs == Seq("batch=-1"), s"got $dirs")
    assert(total() == 6L, "the original data survived the crash + re-run")
    assert(rows(spark.read.option("basePath", idx).parquet(idx)
      .drop("batch").orderBy("k")) == Seq(Seq("a", 4L), Seq("b", 2L)))
  }

  test("compactIndex: folded index keeps dedup and count semantics") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val idx = Files.createTempDirectory("ciidx").toString
    val out = Files.createTempDirectory("ciout").toString
    val cp = Files.createTempDirectory("cicp").toString
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val q = Streams.chunkDedupSink(mem.toDF().toDF("doc_id", "text"),
      idx, out, cp, avgTokens = 2)
    try {
      mem.addData((1L, base))
      q.processAllAvailable()
      mem.addData((2L, other))
      q.processAllAvailable()
      q.stop()
      val before = spark.read.option("basePath", idx).parquet(idx)
        .drop("batch").distinct().count()
      Streams.compactIndex(spark, idx)(_.distinct())
      // one partition remains and the distinct hash set is unchanged
      val dirs = new java.io.File(idx).listFiles().filter(_.isDirectory)
        .map(_.getName).toSeq
      assert(dirs == Seq("batch=-1"))
      assert(spark.read.option("basePath", idx).parquet(idx)
        .drop("batch").distinct().count() == before)
      // a later batch still dedups verbatim re-sends against the
      // compacted index
      val q2 = Streams.chunkDedupSink(mem.toDF().toDF("doc_id", "text"),
        idx, out, cp, avgTokens = 2)
      try {
        mem.addData((3L, base))
        q2.processAllAvailable()
        val b = rows(spark.read.parquet(out).filter($"doc_id" === 3L))
        assert(b.head(2) == 0L && b.head(3) == "")
      } finally q2.stop()
    } finally if (q.isActive) q.stop()
  }

  test("anomalySink: cross-batch totals, spike flagged, late day re-opened") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val counts = Files.createTempDirectory("ancnt").toString
    val anom = Files.createTempDirectory("anout").toString
    val cp = Files.createTempDirectory("ancp").toString
    def day(d: Int, n: Int) = (1 to n)
      .map(_ => (ts(f"2024-01-$d%02d 12:00:00"), "view"))
    val q = Streams.anomalySink(mem.toDF().toDF("ts", "event_type"),
      counts, anom, cp)
    try {
      // batch 0: a steady week at 10/day — nothing flagged
      mem.addData((1 to 7).flatMap(d => day(d, 10)))
      q.processAllAvailable()
      val b0 = rows(spark.read.parquet(s"$anom/batch=0"))
      assert(b0.size == 7 && b0.forall(_(4) == false))
      // batch 1: day 8 spikes to 15 (vs a zero-variance baseline of 10)
      // and day 7 receives 2 late events — both days re-evaluate against
      // totals assembled ACROSS batches, and both flag
      mem.addData(day(8, 15) ++ day(7, 2))
      q.processAllAvailable()
      val b1 = rows(spark.read.parquet(s"$anom/batch=1").orderBy("day"))
      assert(b1.map(r => (r(0).toString, r(2), r(4))) == Seq(
        ("2024-01-07", 12L, true),   // 10 + 2 late vs baseline 10s
        ("2024-01-08", 15L, true)))
      // untouched days are not re-emitted by batch 1
      assert(b1.size == 2)
    } finally q.stop()
  }

  test("scd2Sink: versions accrue per batch at event-time; in-batch " +
      "duplicates stage latest-per-key") {
    implicit val sqlCtx = spark.sqlContext
    Seq("scd_s", "scd_s__swap_tmp", "scd_s__swap_backup")
      .foreach(Tables.dropTable(spark, _))
    val cp = Files.createTempDirectory("scdcp").toString
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.scd2Sink(mem.toDF().toDF("id", "v", "ts"),
      "scd_s", cp, "id", "ts")
    try {
      // batch 0: first sight of keys 1, 2 — key 1 appears twice, the
      // later row must win the staging
      mem.addData((1L, "a0", ts("2030-01-01 00:00:00")),
        (1L, "a1", ts("2030-01-01 06:00:00")),
        (2L, "b", ts("2030-01-01 06:00:00")))
      q.processAllAvailable()
      assert(rows(spark.table("scd_s").orderBy("id", "valid_from")) == Seq(
        Seq(1L, "a1", ts("2030-01-01 06:00:00"), null),
        Seq(2L, "b", ts("2030-01-01 06:00:00"), null)))
      // batch 1: key 1 changes, key 2 identical (no-op), key 3 new
      mem.addData((1L, "a2", ts("2030-01-02 00:00:00")),
        (2L, "b", ts("2030-01-02 00:00:00")),
        (3L, "c", ts("2030-01-02 00:00:00")))
      q.processAllAvailable()
      assert(rows(spark.table("scd_s").orderBy("id", "valid_from")) == Seq(
        Seq(1L, "a1", ts("2030-01-01 06:00:00"),
          ts("2030-01-02 00:00:00")),
        Seq(1L, "a2", ts("2030-01-02 00:00:00"), null),
        Seq(2L, "b", ts("2030-01-01 06:00:00"), null),
        Seq(3L, "c", ts("2030-01-02 00:00:00"), null)))
    } finally q.stop()
    // replay safety: re-applying the last staging directly is a no-op
    // (the merge's change test — this is what makes at-least-once safe)
    val before = rows(spark.table("scd_s").orderBy("id", "valid_from"))
    Tables.upsertScd2(spark,
      Seq((1L, "a2"), (2L, "b"), (3L, "c")).toDF("id", "v"),
      "scd_s", "id", ts("2030-01-02 00:00:00"))
    assert(rows(spark.table("scd_s").orderBy("id", "valid_from")) == before)
    Seq("scd_s", "scd_s__swap_tmp", "scd_s__swap_backup")
      .foreach(Tables.dropTable(spark, _))
  }

  test("scd2Sink: the clamp boundary reads the dimension exactly once " +
      "per sink lifetime, then carries forward in driver state") {
    implicit val sqlCtx = spark.sqlContext
    Seq("scd_bc", "scd_bc__swap_tmp", "scd_bc__swap_backup")
      .foreach(Tables.dropTable(spark, _))
    // pre-existing dimension, so the first batch must initialize the
    // boundary from the TABLE (one read), not the batch
    Tables.loadScd2(Seq((1L, "a")).toDF("id", "v"), "scd_bc",
      ts("2030-01-01 00:00:00"))
    val cp = Files.createTempDirectory("scdbccp").toString
    val mem = MemoryStream[(Long, String, Timestamp)]
    val before = Streams.scd2BoundaryReads.get
    val q = Streams.scd2Sink(mem.toDF().toDF("id", "v", "ts"),
      "scd_bc", cp, "id", "ts")
    try {
      mem.addData((1L, "b", ts("2030-01-02 00:00:00")))
      q.processAllAvailable()
      mem.addData((2L, "c", ts("2030-01-03 00:00:00")))
      q.processAllAvailable()
      // a late batch still clamps correctly against the CACHED boundary
      mem.addData((2L, "d", ts("2030-01-01 12:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    assert(Streams.scd2BoundaryReads.get - before == 1L,
      "boundary must be read from the dimension once per sink lifetime")
    val t = spark.table("scd_bc")
    assert(t.filter(col("valid_to") < col("valid_from")).isEmpty)
    // the late change applied at the cached boundary (2030-01-03)
    assert(rows(t.orderBy("id", "valid_from")) == Seq(
      Seq(1L, "a", ts("2030-01-01 00:00:00"), ts("2030-01-02 00:00:00")),
      Seq(1L, "b", ts("2030-01-02 00:00:00"), null),
      Seq(2L, "c", ts("2030-01-03 00:00:00"), ts("2030-01-03 00:00:00")),
      Seq(2L, "d", ts("2030-01-03 00:00:00"), null)))
    Seq("scd_bc", "scd_bc__swap_tmp", "scd_bc__swap_backup")
      .foreach(Tables.dropTable(spark, _))
  }

  test("scd2Sink: a non-empty batch with all-null event timestamps " +
      "fails loudly naming the column, not with an NPE") {
    implicit val sqlCtx = spark.sqlContext
    Seq("scd_nt", "scd_nt__swap_tmp", "scd_nt__swap_backup")
      .foreach(Tables.dropTable(spark, _))
    val cp = Files.createTempDirectory("scdntcp").toString
    val mem = MemoryStream[(Long, String, Option[Timestamp])]
    val q = Streams.scd2Sink(mem.toDF().toDF("id", "v", "ts"),
      "scd_nt", cp, "id", "ts")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        mem.addData((1L, "a", None))
        q.processAllAvailable()
      } finally q.stop()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("all-null 'ts'")))
    Seq("scd_nt", "scd_nt__swap_tmp", "scd_nt__swap_backup")
      .foreach(Tables.dropTable(spark, _))
  }

  test("ivfIngestSink refuses an orphan delta tree: unfolded batches " +
      "with no routing-generation marker") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.sources.Fixtures.table(spark, "/root/testdata/sf0.001",
      "embeddings").select("vec_id", "embedding")
    Seq("_cells", "_centroids").foreach(sfx =>
      Tables.dropTable(spark, "ivforphan" + sfx))
    Similarity.writeIvfIndex(emb.filter(col("vec_id") < 100), "ivforphan",
      nlist = 16, numBuckets = 4)
    val delta = Files.createTempDirectory("ivforphandelta").toString
    val cp = Files.createTempDirectory("ivforphancp").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val someRows = emb.filter(col("vec_id") >= 100 && col("vec_id") < 105)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val q = Streams.ivfIngestSink(mem.toDF().toDF("vec_id", "embedding"),
      "ivforphan", delta, cp)
    try { mem.addData(someRows: _*); q.processAllAvailable() }
    finally q.stop()
    // delete the marker, leaving the unfolded batch dirs orphaned
    new java.io.File(delta).listFiles()
      .filter(_.getName.startsWith("_routing_gen."))
      .foreach(f => assert(f.delete()))
    assert(new java.io.File(delta).listFiles()
      .exists(_.getName.startsWith("batch=")))
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val cp2 = Files.createTempDirectory("ivforphancp2").toString
    val ex = intercept[IllegalStateException] {
      Streams.ivfIngestSink(mem2.toDF().toDF("vec_id", "embedding"),
        "ivforphan", delta, cp2)
    }
    assert(ex.getMessage.contains("no routing-generation marker"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(delta))
    Seq("_cells", "_centroids").foreach(sfx =>
      Tables.dropTable(spark, "ivforphan" + sfx))
  }

  test("pqIngestSink generation guards: rebuild-under-sink fails the next " +
      "batch; a restarted sink refuses the stale tree; the fold refuses " +
      "dead codes") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.sources.Fixtures.table(spark, "/root/testdata/sf0.001",
      "embeddings").select("vec_id", "embedding")
    Seq("_pqcodes", "_pqmeta").foreach(sfx =>
      Tables.dropTable(spark, "pqstale" + sfx))
    Similarity.writePqIndex(emb.filter(col("vec_id") < 100), "pqstale",
      nlist = 16, m = 4, kcent = 16, dim = 64, numBuckets = 4,
      residual = false)
    val delta = Files.createTempDirectory("pqstaledelta").toString
    val cp = Files.createTempDirectory("pqstalecp").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val someRows = emb.filter(col("vec_id") >= 100 && col("vec_id") < 110)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val q = Streams.pqIngestSink(mem.toDF().toDF("vec_id", "embedding"),
      "pqstale", delta, cp, dim = 64)
    try { mem.addData(someRows: _*); q.processAllAvailable() }
    finally q.stop()
    assert(new java.io.File(delta).listFiles()
      .exists(_.getName.startsWith("batch=")))
    // rebuild bumps the generation while the old batch sits unfolded
    Similarity.writePqIndex(emb.filter(col("vec_id") < 100), "pqstale",
      nlist = 16, m = 4, kcent = 16, dim = 64, numBuckets = 4,
      residual = false)
    assert(Similarity.pqGeneration(spark, "pqstale") == 1L)
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val cp2 = Files.createTempDirectory("pqstalecp2").toString
    val ex = intercept[IllegalStateException] {
      Streams.pqIngestSink(mem2.toDF().toDF("vec_id", "embedding"),
        "pqstale", delta, cp2, dim = 64)
    }
    assert(ex.getMessage.contains("unfolded batches"))
    val ex2 = intercept[IllegalStateException] {
      Streams.compactPqDelta(spark, delta, "pqstale", numBuckets = 4)
    }
    assert(ex2.getMessage.contains("dead centroids"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(delta))
    Seq("_pqcodes", "_pqmeta").foreach(sfx =>
      Tables.dropTable(spark, "pqstale" + sfx))
  }

  test("residual PQ index streams: the sink encodes deltas with corr, " +
      "tiered queries match the post-fold indexed query exactly, and " +
      "the fold carries the corr column through") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.sources.Fixtures.table(spark, "/root/testdata/sf0.001",
      "embeddings").select("vec_id", "embedding")
    Seq("_pqcodes", "_pqmeta").foreach(sfx =>
      Tables.dropTable(spark, "pqres" + sfx))
    Similarity.writePqIndex(emb.filter(col("vec_id") < 100), "pqres",
      nlist = 16, m = 4, kcent = 16, dim = 64, numBuckets = 4,
      residual = true)
    val delta = Files.createTempDirectory("pqresdelta").toString
    val cp = Files.createTempDirectory("pqrescp").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val newRows = emb.filter(col("vec_id") >= 100 && col("vec_id") < 110)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val q = Streams.pqIngestSink(mem.toDF().toDF("vec_id", "embedding"),
      "pqres", delta, cp, dim = 64)
    try { mem.addData(newRows: _*); q.processAllAvailable() }
    finally q.stop()
    // the delta batch carries the residual corr column
    val deltaDf = spark.read.option("basePath", delta).parquet(delta)
    assert(deltaDf.columns.contains("__corr"))
    val queries = emb.filter(col("vec_id") < 5)
    val tiered = rows(Similarity.ivfPqTopKTiered(queries, "pqres", delta,
      k = 10, nprobe = 16, dim = 64).orderBy("query_id", "rank"))
    Streams.compactPqDelta(spark, delta, "pqres", numBuckets = 4)
    assert(spark.table("pqres_pqcodes").columns.contains("__corr"))
    val folded = rows(Similarity.ivfPqTopKIndexed(queries, "pqres",
      k = 10, nprobe = 16, dim = 64).orderBy("query_id", "rank"))
    assert(tiered == folded && tiered.nonEmpty,
      "tiered residual query must equal the post-fold indexed query")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(delta))
    Seq("_pqcodes", "_pqmeta").foreach(sfx =>
      Tables.dropTable(spark, "pqres" + sfx))
  }
}
