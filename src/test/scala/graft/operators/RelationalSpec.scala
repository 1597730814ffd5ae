package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ev = Seq(
    (1L, "2024-01-03 00:00:00", "a"),
    (2L, null.asInstanceOf[String], "b"),
    (3L, "2024-01-01 00:00:00", "c"),
    (4L, "2024-01-02 00:00:00", "d"))
    .toDF("id", "created_at", "v")

  test("sortByCreatedAt: ascending, nulls last") {
    assert(rows(Relational.sortByCreatedAt(ev).select("id")).flatten ==
      Seq(3L, 4L, 1L, 2L))
  }

  test("sortByCreatedAt: absent column is a no-op") {
    val df = Seq(1, 2).toDF("x")
    assert(Relational.sortByCreatedAt(df).collect().toSeq ==
      df.collect().toSeq)
  }

  test("preview limits to n rows") {
    assert(Relational.preview(ev, 2).count() == 2)
  }

  test("timeRange is half-open [since, to)") {
    val out = Relational.timeRange(ev, "created_at",
      "2024-01-01 00:00:00", "2024-01-03 00:00:00")
    assert(rows(out.select("id")).flatten.toSet == Set(3L, 4L))
  }

  test("upsertPlan: staging replaces matches, inserts misses, keeps rest") {
    val main = Seq((1L, "old1"), (2L, "old2")).toDF("id", "v")
    val staging = Seq((2L, "new2"), (9L, "new9")).toDF("id", "v")
    val out = rows(Relational.upsertPlan(main, staging, "id").orderBy("id"))
    assert(out == Seq(Seq(1L, "old1"), Seq(2L, "new2"), Seq(9L, "new9")))
  }

  test("upsertPlan twice with same staging is idempotent") {
    val main = Seq((1L, "a")).toDF("id", "v")
    val staging = Seq((1L, "b"), (2L, "c")).toDF("id", "v")
    val once = Relational.upsertPlan(main, staging, "id")
    val twice = Relational.upsertPlan(once, staging, "id")
    assert(rows(once.orderBy("id")) == rows(twice.orderBy("id")))
  }

  test("upsertPlan tolerates ragged schemas via unionByName") {
    val main = Seq((1L, "a", "extra")).toDF("id", "v", "w")
    val staging = Seq((1L, "b")).toDF("id", "v")
    val out = rows(Relational.upsertPlan(main, staging, "id"))
    assert(out == Seq(Seq(1L, "b", null)))
  }

  test("upsertPlanPreserving keeps main-only columns on updated rows") {
    val main = Seq((1L, "a", "keep1"), (2L, "b", "keep2")).toDF("id", "v", "extra")
    val staging = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    val out = rows(Relational.upsertPlanPreserving(main, staging, "id").orderBy("id"))
    // id=2: v updated, extra PRESERVED (upsertPlan would null it);
    // id=3: inserted with extra=null; id=1 untouched
    assert(out == Seq(Seq(1L, "a", "keep1"), Seq(2L, "B", "keep2"), Seq(3L, "c", null)))
  }

  test("upsertPlanPreserving takes staging nulls on matched rows (MERGE SET semantics)") {
    val main = Seq((1L, "old", "x")).toDF("id", "v", "extra")
    val staging = Seq((1L, null.asInstanceOf[String])).toDF("id", "v")
    val out = rows(Relational.upsertPlanPreserving(main, staging, "id"))
    assert(out == Seq(Seq(1L, null, "x"))) // v SET to null, extra kept
  }

  test("assertUniqueKeys throws on duplicate staging keys, passes on unique") {
    val dup = Seq((1L, "a"), (1L, "b")).toDF("id", "v")
    intercept[IllegalArgumentException] { Relational.assertUniqueKeys(dup, "id") }
    Relational.assertUniqueKeys(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id")
  }

  test("asofJoin: latest right at or before left ts; unmatched lefts null") {
    val left = Seq(
      (1L, 10L, "2024-01-01 10:00:00"),
      (2L, 10L, "2024-01-01 12:00:00"),
      (3L, 20L, "2024-01-01 09:00:00")) // user 20 has no prior right row
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, "2024-01-01 09:00:00", "a"),
      (10L, "2024-01-01 12:00:00", "b"), // equal ts: inclusive match
      (20L, "2024-01-01 11:00:00", "c")) // after left 3: no match
      .toDF("user_id", "ts", "tag")
    val out = rows(Relational.asofJoin(left, right, "user_id", "ts")
      .select("event_id", "tag").orderBy("event_id"))
    assert(out == Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, null)))
  }

  test("asofJoin tolerance: stale matches null out, fresh ones survive") {
    val left = Seq(
      (1L, 10L, "2024-01-01 10:00:00"), // 1h after match: fresh
      (2L, 10L, "2024-01-03 12:00:00"), // 2+ days after match: stale
      (3L, 20L, "2024-01-01 09:00:00")) // no match at all
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (10L, "2024-01-01 09:00:00", "a"),
      (20L, "2024-01-01 11:00:00", "c"))
      .toDF("user_id", "ts", "tag")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = rows(Relational.asofJoin(left, right, "user_id", "ts",
        tolerance = Some("1 day"))
      .select("event_id", "tag").orderBy("event_id"))
    assert(out == Seq(Seq(1L, "a"), Seq(2L, null), Seq(3L, null)))
    // without the bound, the stale match is kept
    val unbounded = rows(Relational.asofJoin(left, right, "user_id", "ts")
      .select("event_id", "tag").orderBy("event_id"))
    assert(unbounded == Seq(Seq(1L, "a"), Seq(2L, "a"), Seq(3L, null)))
  }

  test("asofJoin: null value columns in the matched right row stay null " +
      "(no smuggling older values past the match or the freshness bound)") {
    val left = Seq((1L, 10L, "2024-01-10 00:00:00"))
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (10L, "2024-01-01 00:00:00", Some("old"), Some(5L)),
      (10L, "2024-01-08 00:00:00", None, Some(9L))) // the ASOF match
      .toDF("user_id", "ts", "tag", "score")
      .withColumn("ts", col("ts").cast("timestamp"))
    // plain: the matched row is Jan 8 — its null tag must come through as
    // null, not be backfilled from the Jan 1 row
    val plain = rows(Relational.asofJoin(left, right, "user_id", "ts")
      .select("event_id", "tag", "score"))
    assert(plain == Seq(Seq(1L, null, 9L)))
    // tolerance 5 days: Jan 8 is fresh (Jan 10 − 5d ≤ Jan 8) so its values
    // pass the bound as-is; the Jan 1 row (stale) must not leak in through
    // the null column
    val bounded = rows(Relational.asofJoin(left, right, "user_id", "ts",
        tolerance = Some("5 days"))
      .select("event_id", "tag", "score"))
    assert(bounded == Seq(Seq(1L, null, 9L)))
  }

  test("asofJoin rejects colliding value column names") {
    val l = Seq((1L, 10L, "2024-01-01 10:00:00", "x")).toDF("event_id", "user_id", "ts", "v")
    val r = Seq((10L, "2024-01-01 09:00:00", "y")).toDF("user_id", "ts", "v")
    intercept[IllegalArgumentException] { Relational.asofJoin(l, r, "user_id", "ts") }
  }

  test("rangeJoin: half-open interval, buckets crossed correctly") {
    val left = Seq(
      (1L, "2024-01-01 00:00:00"), // == start: included
      (2L, "2024-01-01 05:59:59"), // inside, later bucket
      (3L, "2024-01-01 06:00:00"), // == end: excluded
      (4L, "2023-12-31 23:59:59")) // before: excluded
      .toDF("id", "ts").selectExpr("id", "CAST(ts AS TIMESTAMP) AS ts")
    val right = Seq((100L, "2024-01-01 00:00:00", "2024-01-01 06:00:00"))
      .toDF("wid", "s", "e")
      .selectExpr("wid", "CAST(s AS TIMESTAMP) AS s", "CAST(e AS TIMESTAMP) AS e")
    // bucket smaller than the interval: right explodes over multiple buckets
    val out = rows(Relational.rangeJoin(left, "ts", right, "s", "e",
      bucketSeconds = 3600).select("id").orderBy("id"))
    assert(out.flatten == Seq(1L, 2L))
    // NTZ tolerance: the same join over TIMESTAMP_NTZ inputs (the
    // round-9 fixture-encoding class) produces the identical result
    import org.apache.spark.sql.types.TimestampNTZType
    val outNtz = rows(Relational.rangeJoin(
      left.withColumn("ts", col("ts").cast(TimestampNTZType)), "ts",
      right.withColumn("s", col("s").cast(TimestampNTZType))
        .withColumn("e", col("e").cast(TimestampNTZType)), "s", "e",
      bucketSeconds = 3600).select("id").orderBy("id"))
    assert(outNtz.flatten == Seq(1L, 2L))
  }

  test("saltedJoin returns exactly the plain inner-join result") {
    // one hot key (7) with many rows — the salting target
    val big = ((1L to 50L) ++ Seq.fill(200)(7L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = Seq((7L, "hot"), (3L, "cold"), (99L, "missing-side")).toDF("k", "v")
    val plain = rows(big.join(small, Seq("k")).orderBy("k", "payload"))
    val salted = rows(Relational.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "v").orderBy("k", "payload"))
    assert(salted == plain && plain.size == 202) // 201 hot-key rows + 1 cold
  }

  test("dedupeLatest keeps the latest row per key with tie-break") {
    val df = Seq(
      (10L, "2024-01-01 00:00:00", 1L),
      (10L, "2024-01-02 00:00:00", 2L),
      (10L, "2024-01-02 00:00:00", 3L), // same ts: tie-break on seq desc
      (20L, "2024-01-01 00:00:00", 4L))
      .toDF("k", "ts", "seq")
    val out = Relational.dedupeLatest(df, "k", "ts", tieBreak = Seq("seq"))
    assert(rows(out.orderBy("k").select("seq")).flatten == Seq(3L, 4L))
  }

  test("sampledPercentiles: exact quantiles over the reproducible sample") {
    val df = (1L to 500L).map(i => ("g", i, i.toDouble))
      .toDF("grp", "id", "value")
    val out = rows(Relational.sampledPercentiles(df, "value", "grp", "id",
      keepPct = 30))
    // recompute the identical hash sample and its exact quantiles
    val kept = df.filter(org.apache.spark.sql.functions.expr(
      "graft_poly_hash(CAST(id AS STRING), 31, 1000000007) % 100 < 30"))
    val want = rows(kept.groupBy("grp").agg(
      org.apache.spark.sql.functions.expr(
        "percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").as("p25"),
      org.apache.spark.sql.functions.expr(
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50"),
      org.apache.spark.sql.functions.expr(
        "percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").as("p75"),
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_sample")))
    assert(out == want)
    // the ~30% sample is representative: the median lands near 250
    val p50 = out.head(2).asInstanceOf[Double]
    assert(p50 > 150.0 && p50 < 350.0, s"p50=$p50")
  }

  test("bloomSemiJoin returns exactly the semi-join result") {
    val big = (1L to 300L).map(i => (i % 50, i)).toDF("k", "x")
    val small = Seq(3L, 7L, 11L, 48L).toDF("k")
    val want = rows(big.join(small, Seq("k"), "left_semi").orderBy("k", "x"))
    val got = rows(Relational.bloomSemiJoin(big, small, "k")
      .orderBy("k", "x"))
    assert(got == want && got.nonEmpty)
    // a deliberately tiny filter (64 bits, 300 distinct keys) saturates
    // the mask with false positives — the exact join must still win
    val tiny = rows(Relational.bloomSemiJoin(big, small, "k", bits = 64,
      numHashes = 2).orderBy("k", "x"))
    assert(tiny == want)
  }

  test("pivotCounts: declared values become columns, absent combos are 0") {
    val df = Seq(
      (1L, "click"), (1L, "click"), (1L, "view"),
      (2L, "view"))
      .toDF("user_id", "event_type")
    val out = Relational.pivotCounts(df, "user_id", "event_type",
      Seq("click", "view", "purchase")).orderBy("user_id")
    assert(out.columns.toSeq == Seq("user_id", "click", "view", "purchase"))
    assert(rows(out) == Seq(Seq(1L, 2L, 1L, 0L), Seq(2L, 0L, 1L, 0L)))
  }

  test("trimmedStats: tails dropped per group, exact integer mean") {
    // group A: values 1..10 with permille 100 -> floor(10*0.1)=1 cut from
    // each end: mean of 2..9 = 5.5 -> 5_500_000 micro. group B: 3 rows,
    // floor(0.3)=0 cut: plain mean of (0, 0, 600) = 200 exactly.
    val a = (1 to 10).map(i => ("A", i.toDouble, i.toLong))
    val b = Seq(("B", 0.0, 11L), ("B", 0.0, 12L), ("B", 600.0, 13L))
    val df = (a ++ b).toDF("event_type", "value", "event_id")
    val out = rows(Relational.trimmedStats(df).orderBy("event_type"))
    assert(out == Seq(
      Seq("A", 10L, 8L, 5500000L),
      Seq("B", 3L, 3L, 200000000L)))
    // partition-invariant (assembled grouped ranks + integer sums)
    val rep = rows(Relational.trimmedStats(df.repartition(7))
      .orderBy("event_type"))
    assert(rep == out)
  }

  test("winsorizedStats: tails clamped to band bounds, all rows counted") {
    // group A: values 1..10, permille 100 -> band ranks 2..9 (bounds 2, 9);
    // clamped sum = 2 + (2..9) + 9 = 55 -> mean 5.5 = 5_500_000 micro,
    // one clip each side. group B: 3 rows, nothing clipped -> plain mean.
    val a = (1 to 10).map(i => ("A", i.toDouble, i.toLong))
    val b = Seq(("B", 0.0, 11L), ("B", 0.0, 12L), ("B", 600.0, 13L))
    val df = (a ++ b).toDF("event_type", "value", "event_id")
    val out = rows(Relational.winsorizedStats(df).orderBy("event_type"))
    assert(out == Seq(
      Seq("A", 10L, 1L, 1L, 5500000L),
      Seq("B", 3L, 0L, 0L, 200000000L)))
    // partition-invariant
    val rep = rows(Relational.winsorizedStats(df.repartition(7))
      .orderBy("event_type"))
    assert(rep == out)
  }

  test("benfordAudit: leading digits from any magnitude, zeros excluded") {
    // digits: 1 (from 0.0012), 1 (from 123.0), 2 (from 2e5), 9 (from
    // -9.5); zero and null rows excluded
    val df = Seq(
      ("A", Some(0.0012), 1L), ("A", Some(123.0), 2L),
      ("A", Some(200000.0), 3L), ("A", Some(-9.5), 4L),
      ("A", Some(0.0), 5L), ("A", None, 6L))
      .toDF("event_type", "value", "event_id")
    val out = rows(Relational.benfordAudit(df).orderBy("digit"))
    assert(out.map(r => (r(1), r(2))) == Seq((1L, 2L), (2L, 1L), (9L, 1L)))
    // permille of 4 counted rows; expected constants and deviation
    assert(out.head == Seq("A", 1L, 2L, 500L, 301L, 199L))
    assert(out(1) == Seq("A", 2L, 1L, 250L, 176L, 74L))
    assert(out(2) == Seq("A", 9L, 1L, 250L, 45L, 205L))
  }

  test("keySkew: heaviest keys first, integer permille, count ties by key") {
    // key 1 holds 6/10 rows (600 permille), keys 2 and 3 hold 2 each
    // (tie broken by key value), key 4 falls outside k = 3
    val df = (Seq.fill(6)(1L) ++ Seq(2L, 2L, 3L, 3L) ++ Seq(4L))
      .toDF("user_id")
    val out = rows(Relational.keySkew(df, "user_id", k = 3))
    assert(out == Seq(
      Seq(1L, 6L, 545L, 1L),   // 6 * 1000 div 11
      Seq(2L, 2L, 181L, 2L),
      Seq(3L, 2L, 181L, 3L)))
  }

  test("kmvOverlapEstimate: below k every estimate is exact, duplicates " +
      "collapse") {
    // A = {1..20} (each key twice), B = {11..40}: |A|=20, |B|=30,
    // union 40, intersection 10 — all < k=64, so the sketches are
    // complete and every estimator returns the exact count
    val a = ((1L to 20L) ++ (1L to 20L)).toDF("key")
    val b = (11L to 40L).toDF("key")
    val out = rows(Relational.kmvOverlapEstimate(a, b, "key", "key", k = 64))
    assert(out == Seq(Seq(64L, 20.0, 30.0, 40.0, 10.0, 10L)))
  }

  test("kmvOverlapEstimate: above k the estimates land near the truth " +
      "and the eval column stays exact") {
    // |A| = 1000, |B| = 1000, intersection 500 with k = 64 sketches
    val a = (1L to 1000L).toDF("key")
    val b = (501L to 1500L).toDF("key")
    val out = rows(Relational.kmvOverlapEstimate(a, b, "key", "key", k = 64))
      .head
    assert(out(0) == 64L && out(5) == 500L)
    def near(v: Any, truth: Double): Boolean = {
      val x = v.asInstanceOf[Double]
      x > truth * 0.5 && x < truth * 2.0
    }
    assert(near(out(1), 1000) && near(out(2), 1000)
      && near(out(3), 1500) && near(out(4), 500), s"estimates off: $out")
  }

  test("joinAdvisor: all four decision branches fire on the right shapes") {
    import spark.implicits._
    val big = (1L to 100L).map(i => (i, i)).toDF("k", "v")          // uniform
    val skewed = (1L to 100L).map(i => (if (i <= 50) 7L else i, i))
      .toDF("k", "v")                                               // key 7 = 50%
    val small = Seq((1L, 1L), (2L, 2L)).toDF("k", "v")
    def advise(l: org.apache.spark.sql.DataFrame,
               r: org.apache.spark.sql.DataFrame) =
      rows(Relational.joinAdvisor(l, r, "k", "k",
        broadcastMaxRows = 10, skewPermille = 200)).head
    assert(advise(big, small)(4) == "broadcast_right")
    assert(advise(small, big)(4) == "broadcast_left")
    val s = advise(skewed, big)
    assert(s(4) == "salted_shuffle" && s(2) == 500L)
    assert(advise(big, big)(4) == "shuffle")
  }

  test("iqrOutliers: exact integer fences, only out-of-fence rows flagged") {
    // group a = 1..9 plus outlier 100 (n = 10): q1 rank 3 -> 3e6,
    // q3 rank 8 -> 8e6, IQR 5e6, fences [-4.5e6, 15.5e6]
    val df = ((1 to 9).map(i => ("a", i.toDouble, i.toLong)) :+
      (("a", 100.0, 10L))).toDF("event_type", "value", "event_id")
    assert(rows(Relational.iqrOutliers(df)) ==
      Seq(Seq("a", 10L, 100000000L, -4500000L, 15500000L)))
    // fence 0: everything strictly outside [q1, q3] flags
    val z = rows(Relational.iqrOutliers(df, fencePermille = 0L)
      .orderBy("event_id"))
    assert(z.map(_(1)) == Seq(1L, 2L, 9L, 10L))
  }

  test("contentFingerprint: order/partition-invariant, flips on any row " +
      "change, null position encoded, empty = (0, 0)") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val f1 = rows(Relational.contentFingerprint(df, Seq("id", "v"))).head
    val f2 = rows(Relational.contentFingerprint(
      df.repartition(7).orderBy(desc("id")), Seq("id", "v"))).head
    assert(f1 == f2 && f1(0) == 3L)
    val changed = Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "v")
    assert(rows(Relational.contentFingerprint(changed, Seq("id", "v")))
      .head != f1)
    // null SENTINEL keeps the column position: ("a", null) != (null, "a")
    val n1 = Seq(("a", null.asInstanceOf[String])).toDF("x", "y")
    val n2 = Seq((null.asInstanceOf[String], "a")).toDF("x", "y")
    assert(rows(Relational.contentFingerprint(n1, Seq("x", "y"))) !=
      rows(Relational.contentFingerprint(n2, Seq("x", "y"))))
    assert(rows(Relational.contentFingerprint(df.limit(0), Seq("id")))
      .head == Seq(0L, 0L))
  }

  test("groupedPercentiles: rank-exact values at each permille, " +
      "min/max at the ends, one row per (group, permille)") {
    val df = Seq(("a", 5.0, 1L), ("a", 1.0, 2L), ("a", 3.0, 3L),
      ("a", 2.0, 4L), ("b", 10.0, 5L))
      .toDF("event_type", "value", "event_id")
    val out = rows(Relational
      .groupedPercentiles(df, permilles = Seq(0, 500, 1000))
      .orderBy("event_type", "permille"))
    // group a sorted micro values [1e6, 2e6, 3e6, 5e6]: p500 rank =
    // ceil(0.5*4) = 2 -> 2e6; p0 -> min, p1000 -> max. Singleton b
    // serves all three permilles from its single rank-1 row.
    assert(out == Seq(
      Seq("a", 0L, 1000000L, 1L, 4L),
      Seq("a", 500L, 2000000L, 2L, 4L),
      Seq("a", 1000L, 5000000L, 4L, 4L),
      Seq("b", 0L, 10000000L, 1L, 1L),
      Seq("b", 500L, 10000000L, 1L, 1L),
      Seq("b", 1000L, 10000000L, 1L, 1L)))
    // null values DROP before ranking (the documented contract): with
    // nulls-first sorting they would otherwise claim rank 1 and skew
    // every percentile — adding nulls must not change the result
    val withNulls = Seq(("a", Some(5.0), 1L), ("a", None, 9L),
      ("a", Some(1.0), 2L), ("a", Some(3.0), 3L), ("a", Some(2.0), 4L),
      ("b", Some(10.0), 5L), ("b", None, 8L))
      .toDF("event_type", "value", "event_id")
    assert(rows(Relational
      .groupedPercentiles(withNulls, permilles = Seq(0, 500, 1000))
      .orderBy("event_type", "permille")) == out)
  }

  test("rangedCumSums: matches the single-task window exactly, grouped " +
      "and global, any partitioning; empty input stays empty") {
    import org.apache.spark.sql.expressions.Window
    // unique per (g, v): lcm(7, 211) = 1477 > 500
    val df = (1 to 500)
      .map(i => ((i % 7).toString, ((i * 37) % 211).toLong, (i % 13).toLong))
      .toDF("g", "v", "n")
    val wCum = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("g")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val want = rows(df
      .withColumn("cum", sum("n").over(wCum))
      .withColumn("tot", sum("n").over(wTot))
      .orderBy("g", "v"))
    val got = rows(Relational
      .rangedCumSums(df.repartition(11), Seq("g"), Seq(col("v").asc),
        Seq(("n", "cum", "tot")))
      .select("g", "v", "n", "cum", "tot").orderBy("g", "v"))
    assert(got == want)
    // global (no group) variant against the one-task window
    val wG = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dfg = df.filter(col("g") === "3")
    val wantG = rows(dfg.withColumn("cum", sum("n").over(wG))
      .orderBy("v").select("v", "cum"))
    val gotG = rows(Relational
      .rangedCumSums(dfg, Nil, Seq(col("v").asc), Seq(("n", "cum", "t")))
      .orderBy("v").select("v", "cum"))
    assert(gotG == wantG)
    assert(Relational.rangedCumSums(df.limit(0), Nil, Seq(col("v").asc),
      Seq(("n", "cum", "t"))).count() == 0)
  }
}
