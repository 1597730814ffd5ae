package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Fixture-table loader for the driver-generated parquet under the
 * /root/testdata/sf0.001 | sf0.01 | sf0.1 directories (see TESTDATA.md).
 *
 * The `events.ts` column is written as parquet TIMESTAMP(NANOS), which
 * Spark's vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]).
 * We read nanos as LONG (`spark.sql.legacy.parquet.nanosAsLong`) and
 * convert to a microsecond TimestampType column — lossless for this data
 * (verified: no sub-microsecond components) and the conversion is a
 * codegen'd narrow projection, so pushdown/pruning on other columns is
 * unaffected.
 *
 * Known scan-plan caveat (fixture-storage specific): predicates on the
 * CONVERTED `ts` evaluate as post-scan DataFilters, not parquet
 * PushedFilters — the `timestamp_micros(ts div 1000)` wrapper blocks
 * row-group pushdown. Production data written as TIMESTAMP(MICROS) needs
 * no conversion and range predicates push down natively; with nanos
 * storage at scale, filter on the raw long with nanos literals instead.
 */
object Fixtures {

  /** Columns stored as TIMESTAMP(NANOS) per fixture table. */
  private val nanosCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Sessions built by Verify/Bench/tests set nanosAsLong up front; this
    // guard covers ad-hoc sessions (e.g. the driver's own entry() smoke
    // session) that would otherwise fail on TIMESTAMP(NANOS) columns.
    if (nanosCols.contains(name) &&
        spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    nanosCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      else d
    }
  }
}
