package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Relational
import graft.schema.Normalize

/**
 * ScalaCheck laws (SURVEY.md §5.2). Each example runs Spark jobs, so the
 * example count is kept low; generators produce the messy value shapes the
 * reference sees (garbage ints, garbage timestamps, nulls).
 */
object PropertyLaws extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark
  import scala.jdk.CollectionConverters._

  private val cell: Gen[String] = Gen.oneOf(
    Gen.const(null: String), Gen.const(""), Gen.const("42"), Gen.const("2.9"),
    Gen.const("garbage"), Gen.const("2024-03-05 10:11:12"),
    Gen.alphaNumStr.map(_.take(8)))

  private val rowsGen: Gen[List[(String, String, String)]] =
    Gen.listOfN(6, for { a <- cell; b <- cell; c <- cell } yield (a, b, c))

  private def frame(rows: List[(String, String, String)]) = {
    import org.apache.spark.sql.{Row, types => T}
    val schema = T.StructType(Seq(
      T.StructField("user_id", T.StringType), // INT-list name
      T.StructField("created_at", T.StringType), // TIMESTAMP-list name
      T.StructField("note", T.StringType))) // default branch
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava, schema)
  }

  property("normalize is idempotent on arbitrary messy frames") =
    forAll(rowsGen) { rows =>
      val once = Normalize.normalize(frame(rows))
      val twice = Normalize.normalize(once)
      once.schema == twice.schema &&
        once.collect().toSeq == twice.collect().toSeq
    }

  property("upsert result keys = main keys UNION staging keys") =
    forAll(Gen.listOf(Gen.choose(0L, 20L)), Gen.listOf(Gen.choose(0L, 20L))) {
      (mainKeys, stagingKeys) =>
        import spark.implicits._
        val main = mainKeys.distinct.map(k => (k, s"m$k")).toDF("id", "v")
        val staging = stagingKeys.distinct.map(k => (k, s"s$k")).toDF("id", "v")
        val out = Relational.upsertPlan(main, staging, "id")
        out.count() == (mainKeys ++ stagingKeys).distinct.size &&
          // staging always wins on matched keys
          out.filter(out("id").isin(stagingKeys.distinct: _*))
            .collect().forall(_.getString(1).startsWith("s"))
    }

  property("upsert is idempotent: same staging twice = once") =
    forAll(Gen.listOf(Gen.choose(0L, 10L))) { keys =>
      import spark.implicits._
      val main = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      val staging = keys.distinct.map(k => (k, s"s$k")).toDF("id", "v")
      val once = Relational.upsertPlan(main, staging, "id")
      val twice = Relational.upsertPlan(once, staging, "id")
      once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq
    }

  property("sortByCreatedAt is invariant under input permutation") =
    forAll(rowsGen) { rows =>
      val a = Relational.sortByCreatedAt(
        Normalize.normalize(frame(rows)), tieBreak = Seq("user_id", "note"))
      val b = Relational.sortByCreatedAt(
        Normalize.normalize(frame(rows.reverse)), tieBreak = Seq("user_id", "note"))
      a.collect().toSeq == b.collect().toSeq
    }
}
