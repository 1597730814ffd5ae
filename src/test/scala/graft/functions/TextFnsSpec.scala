package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: drops empty tokens on empty/whitespace/padded text") {
    val df = Seq("", "   ", "one two", " padded  run ").toDF("text")
    val out = rows(df.select(size(TextFns.tokens("text")))).flatten
    assert(out == Seq(0, 0, 2, 2))
  }

  test("polyHash matches the pinned fold arithmetic") {
    val df = Seq("abc", "").toDF("text")
    // ((0*31+97)*31+98)*31+99 mod 1e9+7 = 96354; empty -> 0
    assert(rows(df.select(TextFns.polyHash("text"))).flatten == Seq(96354L, 0L))
  }

  test("shingles: n-gram windows, empty below n tokens") {
    val df = Seq("a b c d", "a b").toDF("text")
    val out = df.withColumn("t", TextFns.tokens("text"))
      .select(TextFns.shingles("t", 3).as("s"))
    assert(rows(out) == Seq(Seq(Seq("a b c", "b c d")), Seq(Seq())))
  }

  test("token63Fragment: deterministic, within 63 bits, distinct across tokens") {
    val df = Seq("alpha", "beta", "alpha").toDF("w")
    val out = rows(df.select(expr(TextFns.token63Fragment("w")))).flatten
      .map(_.asInstanceOf[Long])
    assert(out(0) == out(2) && out(0) != out(1))
    assert(out.forall(h => h >= 0L))
  }

  test("minhashParams: deterministic, non-zero multipliers") {
    val p1 = TextFns.minhashParams(16)
    assert(p1 == TextFns.minhashParams(16))
    assert(p1.forall { case (a, _) => a != 0 })
    assert(p1.distinct.size == 16)
  }
}
