package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup
import graft.sources.Fixtures

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .withExtensions(new graft.plans.GraftExtensions().apply _)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Fixtures.table(spark, dir, "documents")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"MARKER $label rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    for (run <- 1 to 3) {
      time(s"simhash_h3_native_run$run") { Dedup.simhashPairs(docs).count() }
    }
    time("simhash_h7_native") { Dedup.simhashPairs(docs, maxHamming = 7).count() }
    spark.stop()
  }
}
