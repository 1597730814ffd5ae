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
}
