package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Fixture-table loader for the driver-generated parquet under the
 * /root/testdata/sf0.001 | sf0.01 | sf0.1 directories (see TESTDATA.md).
 *
 * Timestamp storage is generation-dependent; the loader normalizes all
 * three observed encodings of `events.ts` to a session-zoned
 * `TimestampType` column so every downstream operator sees one type:
 *
 *  - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it
 *    outright ([PARQUET_TYPE_ILLEGAL]) unless degraded to raw LONG via
 *    `spark.sql.legacy.parquet.nanosAsLong`; the raw nanos are then
 *    rebuilt with `timestamp_micros(ts div 1000)` (lossless here — the
 *    generator emits no sub-microsecond components). The conversion
 *    wrapper would block row-group pushdown;
 *    [[graft.plans.NanosRangePushdown]] restores it by adding the
 *    implied raw-long bounds.
 *  - parquet TIMESTAMP(MICROS) with isAdjustedToUTC=false: Spark reads
 *    it as `TIMESTAMP_NTZ`, which `unix_micros()` et al. reject. The
 *    session timezone is pinned UTC everywhere in this project, so a
 *    plain cast to `TimestampType` is exact (NTZ wall-clock == UTC
 *    instant) and — being a cast the reader itself can absorb — leaves
 *    range predicates pushing down natively.
 *  - parquet TIMESTAMP(MICROS) adjusted to UTC: already `TimestampType`;
 *    passes through untouched.
 */
object Fixtures {

  /** Columns that MAY need timestamp normalization per fixture table. */
  private val tsCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Sessions built by Verify/Bench/tests set nanosAsLong up front; this
    // guard covers ad-hoc sessions (e.g. the driver's own entry() smoke
    // session) that would otherwise fail on TIMESTAMP(NANOS) columns.
    // getOption returns the registered default ("false") even when the
    // conf was never set, so resolve the value rather than test presence.
    if (tsCols.contains(name) &&
        !spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false").toBoolean)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    tsCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (!d.columns.contains(c)) d
      else d.schema(c).dataType match {
        // Raw nanos LONG: the reader hit TIMESTAMP(NANOS) and nanosAsLong
        // degraded it; rebuild the instant.
        case org.apache.spark.sql.types.LongType =>
          d.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
        // NTZ (micros stored without UTC adjustment): exact cast under the
        // pinned-UTC session.
        case org.apache.spark.sql.types.TimestampNTZType =>
          d.withColumn(c, col(c).cast(org.apache.spark.sql.types.TimestampType))
        case _ => d
      }
    }
  }
}
