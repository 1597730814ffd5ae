package graft.schema

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the three cast branches of SURVEY.md §1.3, including the edges the
 * reference handles implicitly (omnichannel_to_bq.py:64-105). */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("int branch: permissive parse, null on garbage, truncate on float string") {
    val df = Seq(("1", "x"), ("17", "2.9"), (null, "3")).toDF("id", "count")
    val out = Normalize.normalize(df)
    assert(out.schema("id").dataType == LongType)
    assert(out.schema("count").dataType == LongType)
    // documented divergence (SURVEY §7.4.2): per-value try_cast semantics —
    // "2.9" is not a valid BIGINT literal, so it nulls (not truncates)
    assert(rows(out) == Seq(Seq(1L, null), Seq(17L, null), Seq(null, 3L)))
  }

  test("int branch: numeric types cast losslessly, booleans to 0/1") {
    val df = Seq((1.0, true), (2.0, false)).toDF("amount", "is_active")
    val out = Normalize.normalize(df)
    assert(out.schema.fields.forall(_.dataType == LongType))
    assert(rows(out) == Seq(Seq(1L, 1L), Seq(2L, 0L)))
  }

  test("int branch: non-integral double truncates per-value (pinned divergence)") {
    val df = Seq(2.9, -2.9).toDF("qty")
    val out = Normalize.normalize(df)
    assert(rows(out).flatten == Seq(2L, -2L))
  }

  test("timestamp branch: canonical string, null on garbage, case-insensitive name") {
    val df = Seq(("2024-03-05T10:11:12", "z"), ("not a date", "y"))
      .toDF("Created_At", "other")
    val out = Normalize.normalize(df)
    assert(out.schema("Created_At").dataType == StringType)
    assert(rows(out.select("Created_At")).flatten ==
      Seq("2024-03-05 10:11:12", null))
  }

  test("timestamp branch: tsAsString=false keeps TimestampType") {
    val df = Seq("2024-03-05 10:11:12").toDF("updated_at")
    val out = Normalize.normalize(df, tsAsString = false)
    assert(out.schema("updated_at").dataType == TimestampType)
  }

  test("string branch: null becomes empty string (reference intent, not its bug)") {
    val df = Seq(("a", Some(1.5)), (null, None)).toDF("name", "score")
    val out = Normalize.normalize(df)
    assert(out.schema.fields.forall(_.dataType == StringType))
    assert(rows(out) == Seq(Seq("a", "1.5"), Seq("", "")))
  }

  test("normalize is idempotent") {
    val df = Seq((("2024-01-02 03:04:05"), "7", "x"), ((null: String), "bad", null))
      .toDF("created_at", "user_id", "note")
    val once = Normalize.normalize(df)
    val twice = Normalize.normalize(once)
    assert(rows(once) == rows(twice))
    assert(once.schema == twice.schema)
  }
}
