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
    val stream = spark.readStream
      .format(classOf[PaginatedJsonSource].getName)
      .options(Map("url" -> s"file://$dir/page-{page}.json",
        "count" -> "4", "numPartitions" -> "2"))
      .load()
      .select(get_json_object(col("value"), "$.id").cast("long").as("id"))
    val q = stream.writeStream.format("memory").queryName("rest_stream")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(rows(spark.table("rest_stream").orderBy("id")).flatten ==
        (1L to 5L))
      // the short page FILLS (append-only) and a new page appears
      writePage(dir, 2, (5 to 8).map(i => s"""{"id": $i}"""))
      writePage(dir, 3, Seq("""{"id": 9}"""))
      q.processAllAvailable()
      // records 6-9 arrive exactly once; 5 not duplicated
      assert(rows(spark.table("rest_stream").orderBy("id")).flatten ==
        (1L to 9L))
    } finally q.stop()
  }
}
