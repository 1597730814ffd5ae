package graft.sources

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.operators.{Sessions, Similarity}

/**
 * Fixture-schema parity: the REAL driver-generated parquet (whatever
 * timestamp encoding this generation used) and self-written twins of the
 * OTHER encodings must all come out of [[Fixtures.table]] as a
 * session-zoned `TimestampType` column, and a `unix_micros`-using
 * operator must run end-to-end on each.
 *
 * This is the spec the round-9 regression called for: SessionsSpec
 * builds its own `TimestampType` frames, so a fixture-storage drift
 * (e.g. TIMESTAMP(MICROS) without UTC adjustment → `TIMESTAMP_NTZ`)
 * never reached any test until the driver's bench failed. Here the real
 * fixture path is exercised directly.
 */
class FixturesParitySpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val realDir = "/root/testdata/sf0.001"
  private var tmp: Path = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    tmp = Files.createTempDirectory("fixtures_parity")
  }

  override def afterAll(): Unit = {
    if (tmp != null)
      Files.walk(tmp).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    super.afterAll()
  }

  private def assertSessionizeRuns(dir: String): Unit = {
    val ev = Fixtures.table(spark, dir, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"Fixtures.table must normalize ts to TimestampType, got ${ev.schema("ts").dataType}")
    // unix_micros rejects TIMESTAMP_NTZ at analysis time — running the
    // operator end-to-end is the regression check.
    val sessions = Sessions.sessionize(ev)
    assert(sessions.select(max("session_id")).as[Long].head() >= 1L)
  }

  test("real driver fixture: ts normalized, sessionize runs end-to-end") {
    assertSessionizeRuns(realDir)
  }

  test("real driver fixture: retention and attribution analyze cleanly") {
    val ev = Fixtures.table(spark, realDir, "events")
    assert(Sessions.retention(ev).limit(1).count() >= 0)
    assert(Sessions.attribution(ev).limit(1).count() >= 0)
  }

  test("NTZ-stored twin (micros, no UTC adjustment) normalizes identically") {
    val dir = tmp.resolve("ntz").toString
    val src = Fixtures.table(spark, realDir, "events")
    // Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): write the column
    // as TIMESTAMP_NTZ. The session is pinned UTC, so the wall-clock
    // values written equal the source instants.
    src.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // sanity: a raw read really does come back NTZ (the drift shape)
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
    assertSessionizeRuns(dir)
    // value parity with the real fixture, not just type parity
    val a = Fixtures.table(spark, realDir, "events")
      .select("event_id", "ts").orderBy("event_id").limit(100).collect().toSeq
    val b = Fixtures.table(spark, dir, "events")
      .select("event_id", "ts").orderBy("event_id").limit(100).collect().toSeq
    assert(a == b, "NTZ round-trip changed instants")
  }

  test("Sessions operators accept a raw NTZ frame directly (operator-level " +
      "NTZ tolerance, not just loader normalization)") {
    // a user handing the library an NTZ frame without going through
    // Fixtures.table must not hit the round-9 analysis error
    val ntz = Fixtures.table(spark, realDir, "events")
      .withColumn("ts", col("ts").cast(TimestampNTZType))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val viaNtz = Sessions.sessionize(ntz)
      .select("event_id", "session_id").orderBy("event_id").collect().toSeq
    val viaTz = Sessions.sessionize(Fixtures.table(spark, realDir, "events"))
      .select("event_id", "session_id").orderBy("event_id").collect().toSeq
    assert(viaNtz == viaTz, "NTZ input changed sessionization")
    assert(Sessions.retention(ntz).count() ==
      Sessions.retention(Fixtures.table(spark, realDir, "events")).count())
    assert(Sessions.attribution(ntz).limit(1).count() >= 0)
    assert(Sessions.rollingCounts(ntz).limit(1).count() >= 0)
  }

  test("double-stored embeddings twin: centroid training is element-type " +
      "independent") {
    // a future generation storing embedding as ARRAY<DOUBLE> must not
    // crash the driver-side centroid collects (same drift class as the
    // NTZ timestamps — typed getSeq[Float] would throw)
    val emb = Fixtures.table(spark, realDir, "embeddings")
    val dbl = emb.withColumn("embedding",
      col("embedding").cast("array<double>"))
    val a = Similarity.trainIvfCentroids(emb, nlist = 4, dim = 64)
    val b = Similarity.trainIvfCentroids(dbl, nlist = 4, dim = 64)
    assert(a == b, "centroids differ between float and double storage")
  }

  test("nanos-LONG twin (nanosAsLong read shape) normalizes identically") {
    val dir = tmp.resolve("nanos").toString
    val src = Fixtures.table(spark, realDir, "events")
    // What nanosAsLong reading of TIMESTAMP(NANOS) produces: a raw
    // BIGINT nanos column under the same name.
    src.withColumn("ts", unix_micros(col("ts")) * 1000L)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assertSessionizeRuns(dir)
  }
}
