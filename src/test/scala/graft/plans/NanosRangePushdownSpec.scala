package graft.plans

import graft.SparkSpec
import graft.operators.Relational
import graft.sources.Fixtures

class NanosRangePushdownSpec extends SparkSpec {

  test("range on converted nanos column reaches parquet PushedFilters") {
    val ev = Fixtures.table(spark, "/root/testdata/sf0.001", "events")
    val df = Relational.timeRange(ev, "ts",
      "2024-01-10 00:00:00", "2024-01-20 00:00:00")
    val scan = df.queryExecution.executedPlan.toString.split("\n")
      .find(_.contains("PushedFilters")).getOrElse("")
    assert(scan.contains("GreaterThanOrEqual(ts,1704844800000000000)") &&
      scan.contains("LessThan(ts,1705708800000000000)"),
      s"raw nanos bounds not pushed:\n$scan")
    // redundant conjunct must not change results
    assert(df.count() == 361)
  }

  test("rule is idempotent and leaves non-matching filters alone") {
    val ev = Fixtures.table(spark, "/root/testdata/sf0.001", "events")
    val df = ev.filter("user_id > 5") // no nanos pattern
    assert(!df.queryExecution.optimizedPlan.toString.contains("1000000000"))
    // double optimization round-trip keeps one set of bounds
    val tr = Relational.timeRange(ev, "ts",
      "2024-01-10 00:00:00", "2024-01-20 00:00:00")
    val cond = tr.queryExecution.optimizedPlan.toString
    assert("1704844800000000000".r.findAllIn(cond).size == 1)
  }
}
