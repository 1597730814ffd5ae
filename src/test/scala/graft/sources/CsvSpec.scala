package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.schema.Normalize

class CsvSpec extends SparkSpec {
  import spark.implicits._

  test("csv round-trip: write + inferred read reproduces the normalized frame") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/stage"
    // the reference's staging shape: normalized deals frame -> CSV ->
    // schema re-inferred on read (autodetect twin)
    val deals = Seq(
      ("1", "2024-03-05 10:11:12", "alice"),
      ("2", "2024-03-06 00:00:00", "bob"),
      ("not-an-int", "garbage-ts", "carol"))
      .toDF("user_id", "created_at", "note")
    val normalized = Normalize.normalize(deals)
    Csv.write(normalized, dir)
    val back = Csv.readInferred(spark, dir)
    // inference types the int-listed column as integer and keeps the
    // canonical timestamp STRING parseable; row count survives
    assert(back.count() == 3)
    val ints = back.select("user_id").collect().map(_.get(0)).toSet
    assert(ints.contains(1) || ints.contains(1L)) // inferred integral type
    // null int (unparseable) came back as null, not a string
    assert(back.filter(back("user_id").isNull).count() == 1)
  }

  test("csv round-trip: empty strings and nulls both round to null cells") {
    val dir = Files.createTempDirectory("graft-csv2").toString + "/stage"
    val df = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "x"))
      .toDF("id", "v")
    Csv.write(df, dir)
    val back = Csv.readInferred(spark, dir)
    // CSV cannot distinguish "" from null — both land as null (documented
    // interchange semantics, same as the reference's empty-cell behavior)
    assert(back.filter(back("v").isNull).count() == 2)
    assert(back.filter(back("v") === "x").count() == 1)
  }
}
