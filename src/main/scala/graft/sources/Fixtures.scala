package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Fixture-table loader for the driver-generated parquet under the
 * /root/testdata/sf0.001 | sf0.01 | sf0.1 directories (see TESTDATA.md).
 *
 * Timestamp storage is generation-dependent: some fixture generations
 * write `events.ts` as parquet TIMESTAMP(NANOS) — which Spark's
 * vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]) unless
 * read as raw LONG (`spark.sql.legacy.parquet.nanosAsLong`) — and some
 * as plain TIMESTAMP(MICROS), which needs nothing. The loader handles
 * both: the nanosAsLong conf is set defensively, and the
 * `timestamp_micros(ts div 1000)` conversion is applied only when the
 * column actually arrived as a raw nanos LONG (lossless for this data —
 * no sub-microsecond components). Micros-stored columns pass through
 * untouched, so their range predicates push down natively.
 *
 * For nanos-stored data the conversion wrapper would block row-group
 * pushdown ([[graft.plans.NanosRangePushdown]] restores it by adding the
 * implied raw-long bounds — spec'd against a nanos-shaped fixture it
 * writes itself, so the guarantee holds whichever storage the driver
 * generates).
 */
object Fixtures {

  /** Columns that MAY be stored as TIMESTAMP(NANOS) per fixture table. */
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
      // LongType here means the reader hit TIMESTAMP(NANOS) and nanosAsLong
      // degraded it to raw nanos; anything else is already a timestamp.
      if (d.columns.contains(c) &&
          d.schema(c).dataType == org.apache.spark.sql.types.LongType)
        d.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      else d
    }
  }
}
