package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("plans")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions().apply _)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = Seq("q1_agg", "q3_top_revenue", "time_range", "upsert",
      "asof_join", "minhash_lsh", "simhash", "topk_cosine", "sessionize",
      "tfidf_topterms")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline queries (sf0.01)\n\n")
    sb.append("Generated from `SparkEntry.queries` via `.explain(\"formatted\")`;\n")
    sb.append("regenerate with the probe recipe in `.claude/skills/verify/SKILL.md`.\n")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $n\n\n```\n$plan```\n")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("/root/repo/PLANS.md"),
      sb.toString.getBytes("UTF-8"))
    println("MARKER plans written")
    spark.stop()
  }
}
