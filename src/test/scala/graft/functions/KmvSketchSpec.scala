package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmv: exact below k, estimate within 2x above k, partition-invariant") {
    val kmv = KmvSketch.udaf(16)
    // 8 distinct values: below k -> exact
    val small = (0L until 100L).map(i => ("g", i % 8)).toDF("g", "h")
    val exact = small.groupBy("g").agg(kmv(col("h")).as("est"))
      .collect()(0).getDouble(1)
    assert(exact == 8.0)
    // 5000 distinct uniform-ish hashes: estimate within a factor of 2
    val mod = TextFns.HashMod
    val big = (1L to 5000L).map(i => ("g", (i * 999983L) % mod)).toDF("g", "h")
    val est1 = big.repartition(1).groupBy("g").agg(kmv(col("h")).as("est"))
      .collect()(0).getDouble(1)
    val est8 = big.repartition(8).groupBy("g").agg(kmv(col("h")).as("est"))
      .collect()(0).getDouble(1)
    assert(est1 == est8, "sketch must be partition-invariant") // merge = reduce order-free
    assert(est1 > 2500 && est1 < 10000, s"estimate off: $est1")
  }

  test("kmv: duplicate values do not perturb the sketch") {
    val kmv = KmvSketch.udaf(4)
    val dup = Seq(5L, 5L, 5L, 1L, 1L, 9L).map(("g", _)).toDF("g", "h")
    val est = dup.groupBy("g").agg(kmv(col("h")).as("est"))
      .collect()(0).getDouble(1)
    assert(est == 3.0) // 3 distinct, below k -> exact
  }
}
