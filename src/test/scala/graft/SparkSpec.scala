package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites — one JVM-wide session keeps
 * `sbt test` fast; config mirrors Verify/Bench (UTC, nanosAsLong). */
object SparkSpec {
  lazy val spark: SparkSession = graft.GraftSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    // pid ALONE is not unique across runs — pids recycle, and a recycled
    // pid hands this JVM a warehouse full of a dead run's managed-table
    // dirs with no catalog entries (DROP TABLE no-ops, renames then die
    // with LOCATION_ALREADY_EXISTS). nanoTime disambiguates.
    .config("spark.sql.warehouse.dir",
      s"/tmp/graft-test-warehouse-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSpec.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i => r.get(i)))
}
