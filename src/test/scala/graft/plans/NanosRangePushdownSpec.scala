package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Relational

/**
 * [[NanosRangePushdown]] is exercised against a nanos-SHAPED fixture the
 * spec writes itself (a raw BIGINT nanos column + the
 * `timestamp_micros(ts div 1000)` conversion — exactly what
 * `nanosAsLong` reading of parquet TIMESTAMP(NANOS) produces), because
 * the driver's testdata generation is free to store `events.ts` as
 * MICROS, in which case no fixture column takes the nanos path at all.
 * The rule's contract is storage-independent: whenever a plan contains
 * the conversion pattern, range predicates on it grow parquet-pushable
 * raw-long bounds.
 */
class NanosRangePushdownSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private var tmpRoot: java.nio.file.Path = _

  override def afterAll(): Unit = {
    if (tmpRoot != null)
      Files.walk(tmpRoot)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
    super.afterAll()
  }

  /** events-shaped table with ts stored as raw nanos BIGINT, plus the
   * standard micros conversion on top — the nanosAsLong read shape. */
  private lazy val nanosDir: String = {
    tmpRoot = Files.createTempDirectory("nanos_fixture")
    val dir = tmpRoot.toFile
    // epoch computed explicitly in UTC — the session TZ, not the JVM
    // default — so window-edge assertions stay phase-independent
    val baseNanos = java.time.LocalDateTime.parse("2024-01-05T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L
    (0 until 1000).map { i =>
      val tsNanos = baseNanos + i.toLong * 3600L * 1000000000L // hourly
      (i.toLong, tsNanos, i.toLong % 7)
    }.toDF("event_id", "ts", "user_id")
      .write.mode("overwrite").parquet(dir.getAbsolutePath + "/events")
    dir.getAbsolutePath + "/events"
  }

  private def converted = spark.read.parquet(nanosDir)
    .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  test("range on converted nanos column reaches parquet PushedFilters") {
    val df = Relational.timeRange(converted, "ts",
      "2024-01-10 00:00:00", "2024-01-20 00:00:00")
    val scan = df.queryExecution.executedPlan.toString.split("\n")
      .find(_.contains("PushedFilters")).getOrElse("")
    assert(scan.contains("GreaterThanOrEqual(ts,1704844800000000000)") &&
      scan.contains("LessThan(ts,1705708800000000000)"),
      s"raw nanos bounds not pushed:\n$scan")
    // redundant conjunct must not change results: hourly rows in
    // [Jan 10, Jan 20) = 10 days x 24
    assert(df.count() == 240)
  }

  test("rule is idempotent and leaves non-matching filters alone") {
    val df = converted.filter("user_id > 5") // no nanos pattern
    assert(!df.queryExecution.optimizedPlan.toString.contains("1000000000"))
    // double optimization round-trip keeps one set of bounds
    val tr = Relational.timeRange(converted, "ts",
      "2024-01-10 00:00:00", "2024-01-20 00:00:00")
    val cond = tr.queryExecution.optimizedPlan.toString
    assert("1704844800000000000".r.findAllIn(cond).size == 1)
  }

  test("fixture loader normalizes ts to session-zoned TimestampType") {
    // whatever this generation stored (MICROS adjusted/unadjusted, NANOS),
    // Fixtures must emit exactly TimestampType — TIMESTAMP_NTZ broke
    // unix_micros-based operators in round 9 (see FixturesParitySpec)
    val ev = graft.sources.Fixtures.table(spark, "/root/testdata/sf0.001",
      "events")
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(ev.limit(1).count() == 1)
  }
}
