package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("jsonl round-trip: explicit-schema read reproduces the frame") {
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/shard"
    val docs = Seq(
      (1L, "hello world", "en"),
      (2L, "bonjour", null.asInstanceOf[String]),
      (3L, "line with \"quotes\" and \n newline", "en"))
      .toDF("doc_id", "text", "lang")
    Jsonl.write(docs, dir)
    val back = Jsonl.read(spark, dir, schema).orderBy("doc_id")
    val out = rows(back)
    assert(out(0) == Seq(1L, "hello world", "en"))
    // null field was dropped on write and surfaces as null again on read
    assert(out(1) == Seq(2L, "bonjour", null))
    // embedded quotes/newlines survive JSON escaping (one record per line)
    assert(out(2) == Seq(3L, "line with \"quotes\" and \n newline", "en"))
  }

  test("jsonl read with schema tolerates fields absent from some lines") {
    val dir = Files.createTempDirectory("graft-jsonl2").toString + "/mixed"
    // ragged shards: second batch lacks the lang column entirely
    Jsonl.write(Seq((1L, "a", "en")).toDF("doc_id", "text", "lang"), dir)
    val more = Files.createTempDirectory("graft-jsonl3").toString + "/more"
    Jsonl.write(Seq((2L, "b")).toDF("doc_id", "text"), more)
    val back = Jsonl.read(spark, s"$dir,$more".split(",").head, schema)
    assert(rows(back) == Seq(Seq(1L, "a", "en")))
    val back2 = Jsonl.read(spark, more, schema).orderBy("doc_id")
    assert(rows(back2) == Seq(Seq(2L, "b", null)))
  }

  test("quarantine read splits malformed lines without aborting") {
    val dir = Files.createTempDirectory("graft-jsonl5").toFile
    val f = new java.io.File(dir, "shard.jsonl")
    val w = new java.io.PrintWriter(f)
    w.println("""{"doc_id": 1, "text": "ok", "lang": "en"}""")
    w.println("""{"doc_id": broken""")           // malformed JSON
    w.println("""not json at all""")             // not JSON
    w.println("")                                // blank: null parse result
    w.println("   ")                             // whitespace-only: ditto
    w.println("""{"doc_id": 2, "text": "also ok"}""")
    w.close()
    val (good, bad) = Jsonl.readWithQuarantine(spark, f.toString, schema)
    // blank/whitespace lines parse to a NULL struct (no __corrupt set) —
    // they must quarantine, not surface as all-null "good" rows
    assert(rows(good.orderBy("doc_id")) == Seq(
      Seq(1L, "ok", "en"), Seq(2L, "also ok", null)))
    // quarantined rows carry the raw line for inspection/replay
    assert(rows(bad.orderBy("raw_line")).map(_(0)) ==
      Seq("", "   ", "not json at all", """{"doc_id": broken"""))
  }

  test("shard count follows upstream partitioning") {
    val dir = Files.createTempDirectory("graft-jsonl4").toString + "/sharded"
    Jsonl.write((1L to 100L).toDF("doc_id").repartition(4), dir)
    val shards = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(shards == 4)
  }
}
