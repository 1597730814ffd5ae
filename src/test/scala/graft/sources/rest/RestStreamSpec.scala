package graft.sources.rest

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RestStreamSpec extends SparkSpec {

  private def writePage(dir: Path, page: Int, objs: Seq[String]): Unit =
    Files.writeString(dir.resolve(s"page-$page.json"),
      objs.mkString("""{"deals": [""", ",", "]}"))

  test("micro-batch stream tails pages incrementally without duplicates") {
    val dir = Files.createTempDirectory("stream-pages")
    val cp = Files.createTempDirectory("stream-cp").toString
    writePage(dir, 1, (1 to 4).map(i => s"""{"id": $i}"""))
    writePage(dir, 2, Seq("""{"id": 5}""")) // short page: stream frontier
    val out = Files.createTempDirectory("stream-out").toString
    // parquet sink (not memory): it supports checkpoint RECOVERY, so the
    // second half restarts from the consumed record offset
    def start() = spark.readStream
      .format(classOf[PaginatedJsonSource].getName)
      .options(Map("url" -> s"file://$dir/page-{page}.json",
        "count" -> "4", "numPartitions" -> "2"))
      .load()
      .select(get_json_object(col("value"), "$.id").cast("long").as("id"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).outputMode("append").start()
    def ids() = rows(spark.read.parquet(out).orderBy("id")).flatten
    val q = start()
    try {
      q.processAllAvailable()
      assert(ids() == (1L to 5L))
    } finally q.stop()
    // STOP before mutating the pages: rewriting a file while a poll
    // trigger is in flight races the offset snapshot (observed as a rare
    // full-suite flake). The short page FILLS (append-only) and a new
    // page appears; the resumed query must continue from the consumed
    // record offset without re-emitting record 5.
    writePage(dir, 2, (5 to 8).map(i => s"""{"id": $i}"""))
    writePage(dir, 3, Seq("""{"id": 9}"""))
    val q2 = start()
    try {
      q2.processAllAvailable()
      // records 6-9 arrive exactly once; 5 not duplicated
      assert(ids() == (1L to 9L))
    } finally q2.stop()
  }

  test("watermarked event-time windows over the paginated stream: " +
      "windows close at the watermark, late records are dropped") {
    val dir = Files.createTempDirectory("wm-pages")
    val cp = Files.createTempDirectory("wm-pages-cp").toString
    val out = Files.createTempDirectory("wm-pages-out").toString
    def rec(id: Int, t: String, e: String) =
      s"""{"id": $id, "ts": "$t", "event_type": "$e"}"""
    // parquet sink + stop/start around page mutations (the offset-race
    // caveat from the tailing test); the watermark itself lives in the
    // checkpoint, so closing/dropping behavior survives the restarts
    def start() = {
      val parsed = spark.readStream
        .format(classOf[PaginatedJsonSource].getName)
        .options(Map("url" -> s"file://$dir/page-{page}.json",
          "count" -> "3", "numPartitions" -> "2"))
        .load()
        .select(
          get_json_object(col("value"), "$.ts").cast("timestamp").as("ts"),
          get_json_object(col("value"), "$.event_type").as("event_type"))
      graft.streaming.Streams.windowedCounts(parsed, "ts", "event_type",
        windowLength = "10 minutes", watermark = "5 minutes")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", cp).outputMode("append").start()
    }
    def emitted() = rows(spark.read.parquet(out)
      .select("window_start", "event_type", "n")
      .orderBy("window_start", "event_type"))
    writePage(dir, 1, Seq(
      rec(1, "2024-01-01 00:01:00", "a"), rec(2, "2024-01-01 00:02:00", "a"),
      rec(3, "2024-01-01 00:03:00", "b")))
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(emitted().isEmpty) // watermark passed no window end yet
    } finally q1.stop()
    // a short page at 01:00 advances the watermark to 00:55 -> the
    // [00:00, 00:10) window closes and emits
    writePage(dir, 2, Seq(rec(4, "2024-01-01 01:00:00", "a")))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(emitted() == Seq(
        Seq(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a", 2L),
        Seq(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "b", 1L)))
    } finally q2.stop()
    // page 2 fills (append-only) with a LATE record — 00:04, behind the
    // checkpointed 00:55 watermark — plus an on-time 02:00 record: the
    // late record must be dropped (the closed window stays as emitted),
    // while 02:00 closes [01:00, 01:10)
    writePage(dir, 2, Seq(
      rec(4, "2024-01-01 01:00:00", "a"),
      rec(5, "2024-01-01 00:04:00", "b"),
      rec(6, "2024-01-01 02:00:00", "c")))
    val q3 = start()
    try {
      q3.processAllAvailable()
      assert(emitted() == Seq(
        Seq(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a", 2L),
        Seq(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "b", 1L),
        Seq(java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), "a", 1L)))
    } finally q3.stop()
  }

  test("oversized page fails the stream loudly instead of corrupting offsets") {
    val dir = Files.createTempDirectory("oversz-pages")
    val cp = Files.createTempDirectory("oversz-cp").toString
    val out = Files.createTempDirectory("oversz-out").toString
    // page 1 carries 5 records against a declared page size of 4: the
    // record-count offset model maps records to pages by fixed size, so
    // this must fail the query, not silently mis-count
    writePage(dir, 1, (1 to 5).map(i => s"""{"id": $i}"""))
    val q = spark.readStream
      .format(classOf[PaginatedJsonSource].getName)
      .options(Map("url" -> s"file://$dir/page-{page}.json",
        "count" -> "4", "numPartitions" -> "2"))
      .load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      val ex = intercept[Exception] { q.processAllAvailable() }
      def causes(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: causes(t.getCause)
      assert(causes(ex).exists(c => c.isInstanceOf[IllegalStateException]
        && c.getMessage.contains("more than the requested")),
        s"unexpected failure: $ex")
    } finally q.stop()
  }

  test("e2e continuous update loop: REST micro-batch fetch -> normalize " +
      "-> upsert sink across a mid-run restart equals the batch path " +
      "over the final pages (the reference's update path, streaming)") {
    import graft.tables.Tables
    val dir = Files.createTempDirectory("e2e-pages")
    val cp = Files.createTempDirectory("e2e-cp").toString
    Seq("rest_e2e", "rest_e2e__swap_tmp", "rest_e2e__swap_backup")
      .foreach(Tables.dropTable(spark, _))
    def rec(id: Int, t: String, v: String) =
      s"""{"id": $id, "created_at": "$t", "v": "$v"}"""
    def parsed(raw: org.apache.spark.sql.DataFrame) =
      graft.schema.Normalize.normalize(raw.select(
        get_json_object(col("value"), "$.id").as("id"),
        get_json_object(col("value"), "$.created_at").as("created_at"),
        get_json_object(col("value"), "$.v").as("v")))
    def start() = graft.streaming.Streams.upsertSink(
      parsed(spark.readStream
        .format(classOf[PaginatedJsonSource].getName)
        .options(Map("url" -> s"file://$dir/page-{page}.json",
          "count" -> "3", "numPartitions" -> "2"))
        .load()),
      "rest_e2e", "id", "created_at", cp)
    // phase 1: initial crawl
    writePage(dir, 1, Seq(
      rec(1, "2024-01-01 00:00:00", "a"),
      rec(2, "2024-01-01 00:01:00", "b"),
      rec(3, "2024-01-01 00:02:00", "c")))
    writePage(dir, 2, Seq(rec(4, "2024-01-01 00:03:00", "d")))
    val q = start()
    try { q.processAllAvailable() } finally q.stop()
    assert(spark.table("rest_e2e").count() == 4)
    // phase 2 (MID-RUN RESTART): the feed fills the short page with an
    // UPDATE for id 2 (newer created_at) and grows a new page; the
    // restarted query resumes from the consumed record offset
    writePage(dir, 2, Seq(
      rec(4, "2024-01-01 00:03:00", "d"),
      rec(2, "2024-01-02 00:00:00", "B2"),
      rec(5, "2024-01-02 00:01:00", "e")))
    writePage(dir, 3, Seq(rec(6, "2024-01-02 00:02:00", "f")))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    // batch path over the SAME final pages: fetch-all -> normalize ->
    // latest-per-key — the reference's one-shot update equivalent
    val want = rows(graft.operators.Relational.dedupeLatest(
        parsed(RestIngest.read(spark, Map(
          "url" -> s"file://$dir/page-{page}.json", "count" -> "3"))),
        "id", "created_at")
      .orderBy("id"))
    val got = rows(spark.table("rest_e2e").orderBy("id"))
    assert(got == want, s"streaming table diverged:\ngot  $got\nwant $want")
    assert(got.map(_.head) == Seq(1L, 2L, 3L, 4L, 5L, 6L) &&
      got.find(_.head == 2L).get(2) == "B2")
    Seq("rest_e2e", "rest_e2e__swap_tmp", "rest_e2e__swap_backup")
      .foreach(Tables.dropTable(spark, _))
  }
}
