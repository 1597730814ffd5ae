package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OrcSpec extends SparkSpec {
  import spark.implicits._

  test("orc round-trip reproduces the frame, nulls included") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/t"
    val docs = Seq(
      (1L, "hello world", "en"),
      (2L, "bonjour", null.asInstanceOf[String]),
      (3L, "tab\tand \"quotes\"", "en"))
      .toDF("doc_id", "text", "lang")
    Orc.write(docs, dir)
    assert(rows(Orc.read(spark, dir).orderBy("doc_id")) == rows(docs))
  }

  test("filters and pruning reach the ORC scan") {
    val dir = Files.createTempDirectory("graft-orc2").toString + "/t"
    Orc.write((1L to 1000L).map(i => (i, s"d$i", i % 7))
      .toDF("doc_id", "text", "bucket"), dir)
    val q = Orc.read(spark, dir)
      .filter(col("doc_id") > 900L).select("doc_id", "bucket")
    val scan = q.queryExecution.executedPlan.toString.linesIterator
      .find(l => l.contains("PushedFilters") || l.contains("pushedFilters"))
      .getOrElse("")
    assert(scan.contains("GreaterThan(doc_id,900"), s"filter not pushed:\n$scan")
    // column pruning: the scan schema must not include the text column
    val readSchema = q.queryExecution.executedPlan.toString
    assert(!readSchema.contains("text"), "unused column not pruned from scan")
    assert(rows(q.orderBy("doc_id")).map(_(0)) == (901L to 1000L))
  }
}
