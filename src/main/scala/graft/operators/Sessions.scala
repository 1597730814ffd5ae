package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/**
 * Event-time operators over an event log: gap-based sessionization and
 * tumbling-window aggregation — the batch twins of the Structured
 * Streaming surface in [[graft.streaming.Streams]].
 */
object Sessions {

  /** Epoch microseconds of an event-time column, tolerant of
   * `TIMESTAMP_NTZ` inputs: `unix_micros` rejects NTZ at analysis time
   * (the round-9 fixture regression), and the cast is a no-op for
   * session-zoned timestamps (Catalyst folds same-type casts away) while
   * interpreting NTZ wall-clock in the session zone — exact under this
   * project's pinned-UTC sessions. */
  private def tsUs(c: Column): Column = unix_micros(c.cast(TimestampType))

  /**
   * Ordered-funnel analysis: how many users complete each prefix of the
   * `steps` event sequence, where step i must occur strictly after the
   * user's step i-1 completion and within `withinSeconds` of it (each
   * user's earliest valid completion time is used at every step — the
   * standard product-analytics funnel). Emits one row per step:
   * (step_idx, step_name, n_users), counts monotonically non-increasing.
   *
   * Plan shape: one filtered aggregate per step joined to the previous
   * step's per-user completion frame — k-1 equi-joins on the 8-byte user
   * key for a k-step funnel, each input pre-filtered to that step's
   * events. Times stay exact (timestamp + integer-second interval), so
   * the funnel is engine-invariant and oracle-checkable.
   */
  def funnel(events: DataFrame, steps: Seq[String],
             withinSeconds: Long, userCol: String = "user_id",
             tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "at least one step")
    val perStep = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prevOpt, (step, i)) =>
        val stepEvents = events.filter(col(typeCol) === step)
          .select(col(userCol).as("u"), col(tsCol).as("t"))
        Some(prevOpt match {
          case None =>
            stepEvents.groupBy("u").agg(min(col("t")).as("done"))
          case Some(prev) =>
            stepEvents
              .join(prev.select(col("u"), col("done").as("p")), "u")
              .filter(col("t") > col("p") &&
                col("t") <= col("p") + expr(s"INTERVAL $withinSeconds SECONDS"))
              .groupBy("u").agg(min(col("t")).as("done"))
        })
    }.flatten
    perStep.zipWithIndex.map { case (frame, i) =>
      frame.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("step_idx"),
          lit(steps(i)).as("step_name"), col("n_users"))
    }.reduce(_ unionByName _).orderBy("step_idx")
  }

  /**
   * Cohort retention matrix: users grouped by the week of their first
   * event (the cohort), counted as active in each later week they
   * appear — the classic retention triangle. Weeks are integer epoch-day
   * sevenths (`epoch_days div 7`), NOT calendar `date_trunc('week')`:
   * week-start conventions differ between engines, integer arithmetic
   * does not. Emits (cohort_week, week_offset, n_users), offset 0 =
   * the cohort's own week.
   *
   * Plan shape: one aggregate for first-event weeks (user-keyed), one
   * distinct over (user, week), one join on the user key, one final
   * count — all hash aggregates with map-side combine.
   */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    val week =
      expr(s"(unix_micros(CAST($tsCol AS TIMESTAMP)) div 86400000000) div 7")
    val weeks = events
      .select(col(userCol).as("u"), week.as("w")).distinct()
    val cohorts = weeks.groupBy("u").agg(min(col("w")).as("cw"))
    weeks.join(cohorts, "u")
      .groupBy(col("cw").as("cohort_week"),
        (col("w") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("cohort_week"), col("week_offset"), col("n_users"))
  }

  /**
   * Gap-based sessionization: events of one user belong to the same session
   * while consecutive gaps are <= `gapSeconds`; a larger gap starts a new
   * session. Emits the input keyed by (user, ordered position) plus a
   * per-user `session_id` starting at 1.
   *
   * Plan shape: ONE shuffle on the user key shared by both window passes
   * (lag + running sum over the same (user, ts) ordering) — Spark plans a
   * single Exchange and sorts once. Gap arithmetic runs on epoch
   * microseconds (exact integers). The `tieBreak` column makes same-
   * timestamp ordering deterministic.
   */
  def sessionize(events: DataFrame, userCol: String = "user_id",
                 tsCol: String = "ts", gapSeconds: Long = 1800,
                 tieBreak: String = "event_id"): DataFrame = {
    val order = Seq(col(tsCol).asc, col(tieBreak).asc)
    val w = Window.partitionBy(userCol).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevUs = lag(tsUs(col(tsCol)), 1).over(w)
    val isNew = when(
      prevUs.isNull ||
        (tsUs(col(tsCol)) - prevUs) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("session_id", sum(isNew).over(run).cast("long"))
  }

  /**
   * Rolling (sliding, per-row) time-range aggregate: for every event, the
   * count of events by the same key in the trailing `windowSeconds`
   * (inclusive of the current row's timestamp). A RANGE-frame window over
   * epoch seconds — one shuffle on the key, no self-join, no interval
   * explosion; the canonical "activity in the last N days" feature.
   */
  def rollingCounts(events: DataFrame, windowSeconds: Long = 604800,
                    keyCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__sec"))
      .rangeBetween(-windowSeconds, Window.currentRow)
    events
      .withColumn("__sec", unix_timestamp(col(tsCol).cast(TimestampType)))
      .withColumn("n_trailing", count(lit(1)).over(w).cast("long"))
      .drop("__sec")
  }

  /**
   * Tumbling event-time windows: aggregate per `window(ts, width)` x an
   * optional dimension column. Uses Spark's native `window()` (epoch-aligned
   * bucketing, identical to `date_trunc` for whole-day/hour widths in a UTC
   * session) and emits the window bounds as plain timestamp columns.
   *
   * The aggregate set (counts, distinct users, min/max) is chosen to be
   * exactly reproducible under any aggregation order — no floating-point
   * sums.
   */
  def windowedAgg(events: DataFrame, width: String = "1 day",
                  tsCol: String = "ts", dimCol: String = "event_type",
                  userCol: String = "user_id",
                  valueCol: String = "value",
                  slide: Option[String] = None): DataFrame =
    events
      .groupBy(
        slide.fold(window(col(tsCol), width))(s => window(col(tsCol), width, s))
          .as("w"),
        col(dimCol))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col(userCol)).as("n_users"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col(dimCol), col("n_events"), col("n_users"),
        col("min_value"), col("max_value"))

  /**
   * First-order Markov transition model over each user's event sequence:
   * count every consecutive (event_type → next event_type) pair per user
   * timeline and emit MLE transition probabilities — the "what do users
   * do next" model, and the sequence-statistics twin of [[funnel]]
   * (funnel checks one ordered path; this measures all of them).
   * Emits (from_type, to_type, n_pairs, n_from, p) where
   * p = n_pairs / n_from.
   *
   * Timeline order is (ts, event_id) so timestamp ties are broken
   * deterministically. One shuffle on the user key for the `lead`
   * window, then a type-pair hash aggregate (state bounded by
   * |event_type|², never by event volume) and a broadcast join for the
   * per-source totals. `p` is a single IEEE division of two BIGINTs —
   * bit-identical across engines and partitionings.
   */
  def eventTransitions(events: DataFrame, userCol: String = "user_id",
                       typeCol: String = "event_type",
                       tsCol: String = "ts",
                       tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(typeCol).as("from_type"), col(tsCol), col(tieCol))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_pairs"))
    val totals = pairs.groupBy("from_type")
      .agg(sum("n_pairs").cast("long").as("n_from"))
    pairs.join(broadcast(totals), "from_type")
      .withColumn("p", col("n_pairs").cast("double") / col("n_from"))
      .select("from_type", "to_type", "n_pairs", "n_from", "p")
  }

  /**
   * Event-type co-occurrence lift (market-basket association over
   * behavior): for every unordered pair of event types, how much more
   * often they co-occur in the same user-day basket than independence
   * predicts — lift = n_baskets · n_ab / (n_a · n_b). Lift > 1 means
   * the pair attracts (funnel candidates); < 1 means it repels. Emits
   * (type_a, type_b, n_a, n_b, n_ab, lift_milli) with type_a < type_b
   * and lift floored to integer milli-units — engine-exact: the
   * numerator/denominator products run in DECIMAL(38,0) (HUGEINT on the
   * oracle side), so basket counts up to 2³¹ are safe by construction
   * (n_baskets·n_ab·1000 ≤ ~4.6e21 ≪ 10³⁸). A pure-BIGINT numerator
   * would wrap silently in Spark (non-ANSI) once n_baskets·n_ab·1000
   * exceeds 2⁶³ — around n_baskets ≈ n_ab ≈ 2²⁷ — while DuckDB raises,
   * making the engines diverge instead of failing together.
   *
   * Scale: baskets are distinct (user, day, type) triples — one hash
   * aggregate; the pair join is per-basket self-join over that distinct
   * frame (fan-out |types|² per basket, never event²); per-type and
   * pair counts are |types|-bounded aggregates that cross-join a 1-row
   * total. Event volume touches only the first distinct.
   */
  def eventLift(events: DataFrame, userCol: String = "user_id",
                typeCol: String = "event_type",
                tsCol: String = "ts"): DataFrame = {
    val baskets = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"),
        col(typeCol).as("t"))
      .distinct()
    val nBaskets = baskets.select("u", "d").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val typeCounts = baskets.groupBy(col("t"))
      .agg(count(lit(1)).as("n"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"),
        col("a.u") === col("b.u") && col("a.d") === col("b.d") &&
          col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("type_a"), col("b.t").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(typeCounts.select(col("t").as("type_a"),
        col("n").as("n_a"))), "type_a")
      .join(broadcast(typeCounts.select(col("t").as("type_b"),
        col("n").as("n_b"))), "type_b")
      .crossJoin(broadcast(nBaskets))
      .withColumn("lift_milli",
        expr("CAST((CAST(n_baskets AS DECIMAL(20,0)) * n_ab * 1000) " +
          "DIV (CAST(n_a AS DECIMAL(20,0)) * n_b) AS BIGINT)"))
      .select("type_a", "type_b", "n_a", "n_b", "n_ab", "lift_milli")
  }

  /**
   * Per-key daily resampling with forward fill: expand each key's
   * event history onto a continuous day spine (its own min..max day) and
   * carry the last observed value across gap days — the
   * dashboard/feature-store "as-of state per day" view of an event log.
   * Emits (keyCol, day, value, is_filled); the observed value for a day
   * is the LAST event of that day (ordered by ts, then `tieCol`), and a
   * filled day repeats the newest earlier observation exactly (the value
   * is carried, never recomputed — engine-exact without arithmetic).
   *
   * Scale: one per-key min/max aggregate generates the spine
   * (`sequence()` explode — rows bounded by keys × span days, not by
   * event volume), one day-level last-event aggregate, and one key-keyed
   * window for the fill; everything shuffles on the 8-byte key.
   */
  def resampleDaily(events: DataFrame, keyCol: String = "user_id",
                    tsCol: String = "ts", valCol: String = "value",
                    tieCol: String = "event_id"): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(max(struct(col(tsCol), col(tieCol), col(valCol))).as("__last"))
      .select(col(keyCol), col("day"), col("__last")(valCol).as("__obs"))
    val spine = daily.groupBy(keyCol)
      .agg(min("day").as("__d0"), max("day").as("__d1"))
      .select(col(keyCol),
        explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(keyCol, "day"), "left")
      .withColumn("value", last(col("__obs"), ignoreNulls = true).over(w))
      .withColumn("is_filled", col("__obs").isNull)
      .select(col(keyCol), col("day"), col("value"), col("is_filled"))
  }

  /**
   * Daily event-count anomaly detection: flag (day, event_type) cells
   * whose count deviates from the trailing `baselineDays`-day mean by
   * more than `sigmas` standard deviations — the volume-spike /
   * pipeline-breakage monitor every ingest needs.
   *
   * The 3σ test is evaluated in INTEGER arithmetic, so the flag is
   * engine- and partitioning-invariant (no float mean/variance): with
   * trailing sums S1 = Σx, S2 = Σx² over n baseline days,
   *   |x − S1/n| > σ·sqrt((n·S2 − S1²)/n²)
   * ⟺ (n·x − S1)² · n > σ² · (n·S2 − S1²) · n   (n > 0)
   * ⟺ (n·x − S1)² > σ² · (n·S2 − S1²)
   * — all BIGINT products (daily counts < 2^20 keep every term far under
   * 2^63). Emits (day, event_type, n_events, n_baseline, is_anomaly);
   * cells with an empty baseline are never flagged.
   *
   * Plan shape: one date-trunc hash aggregate (map-side combined), then
   * a RANGE-frame window over epoch days keyed by event_type — state is
   * |event_type| × days, never event volume; no self-join.
   */
  def countAnomaly(events: DataFrame, baselineDays: Int = 7,
                   sigmas: Int = 3, typeCol: String = "event_type",
                   tsCol: String = "ts"): DataFrame =
    countAnomalyFromTotals(
      events.groupBy(to_date(col(tsCol)).as("day"), col(typeCol))
        .agg(count(lit(1)).as("n_events")),
      baselineDays, sigmas, typeCol)

  /** The integer 3σ test over an already-aggregated (day, type, n_events)
   * frame — ONE definition of the flag rule, shared by [[countAnomaly]]
   * and the streaming re-evaluation in
   * [[graft.streaming.Streams.anomalySink]] (which re-assembles totals
   * from its growing counts index). */
  def countAnomalyFromTotals(daily: DataFrame, baselineDays: Int = 7,
                             sigmas: Int = 3,
                             typeCol: String = "event_type"): DataFrame = {
    val w = Window.partitionBy(typeCol).orderBy(col("__d"))
      .rangeBetween(-baselineDays.toLong, -1L)
    daily
      .withColumn("__d", datediff(col("day"), lit("1970-01-01")).cast("long"))
      .withColumn("n_baseline", count(lit(1)).over(w).cast("long"))
      .withColumn("__s1", coalesce(sum(col("n_events")).over(w), lit(0L)))
      .withColumn("__s2",
        coalesce(sum(col("n_events") * col("n_events")).over(w), lit(0L)))
      .withColumn("is_anomaly",
        col("n_baseline") > 0 &&
          (col("n_baseline") * col("n_events") - col("__s1")) *
          (col("n_baseline") * col("n_events") - col("__s1")) >
          lit(sigmas.toLong * sigmas) *
            (col("n_baseline") * col("__s2") - col("__s1") * col("__s1")))
      .select(col("day"), col(typeCol), col("n_events"),
        col("n_baseline"), col("is_anomaly"))
  }

  /**
   * Last-touch attribution: each conversion event is credited to the
   * most recent PRIOR touch event (of the configured touch types) by
   * the same user, if it happened within the lookback — the standard
   * marketing/growth attribution join, and the template for any
   * "which earlier event caused this one" credit assignment. Emits one
   * row per conversion: (conversion_id, userCol, conversion_ts,
   * touch_id, touch_type, gap_us), with NULL touch columns when no
   * touch qualifies. Gaps are integer MICROSECONDS (`unix_micros` /
   * `epoch_us` on both engines — seconds-granularity casts round
   * differently across engines on fractional timestamps).
   *
   * Scale: ONE per-user window over time-ordered events carrying the
   * latest touch as a `last(ignoreNulls)` struct — no self-join, no
   * per-conversion scan; state per row is one struct. Ties at the same
   * timestamp break on the event id (a same-instant touch with a
   * smaller id counts as prior), so attribution is deterministic.
   */
  def attribution(events: DataFrame,
                  touchTypes: Seq[String] = Seq("click", "view"),
                  convType: String = "purchase",
                  lookbackSeconds: Long = 7L * 86400L,
                  userCol: String = "user_id", tsCol: String = "ts",
                  typeCol: String = "event_type",
                  idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol)
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val lookbackUs = lookbackSeconds * 1000000L
    events
      .withColumn("__touch",
        when(col(typeCol).isin(touchTypes.map(x => x: Any): _*),
          struct(tsUs(col(tsCol)).as("t"), col(idCol).as("i"),
            col(typeCol).as("y"))))
      .withColumn("__last", last(col("__touch"), ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
      .withColumn("__ok", col("__last").isNotNull &&
        tsUs(col(tsCol)) - col("__last.t") <= lookbackUs)
      .select(col(idCol).as("conversion_id"), col(userCol),
        col(tsCol).as("conversion_ts"),
        when(col("__ok"), col("__last.i")).as("touch_id"),
        when(col("__ok"), col("__last.y")).as("touch_type"),
        when(col("__ok"), tsUs(col(tsCol)) - col("__last.t"))
          .as("gap_us"))
  }

  /**
   * Event-time lateness audit per source — the feed-freshness monitor:
   * each source's newest event against the corpus's newest, in integer
   * microseconds (a feed that stopped sending shows up as a growing
   * lag long before its absence skews a statistic). Emits one row per
   * source: (grpCol, n, max_ts_us, lag_us) — lag 0 for the freshest
   * feed by construction.
   *
   * Scale: one map-side-combined per-source aggregate; the corpus max
   * derives from the same group frame (group-cardinality), broadcast
   * back — the fact rows are scanned once.
   */
  /**
   * Cumulative distinct users TO DATE per day — the "unique users so
   * far" dashboard curve, at sketch cost: each day reduces to its k
   * smallest reproducible id hashes ([[graft.functions.MinKLongs]]),
   * and day d's cumulative estimate is the KMV estimate over the UNION
   * of days ≤ d. The pre-reduction is lossless for the estimate: the k
   * smallest of a union equal the k smallest of the per-day k-smallest
   * sets (the KMV merge property), so the triangular day-join runs
   * over at most days·k hash rows — never over user rows — and the
   * estimate still hash-matches an oracle that takes the k smallest
   * over the raw union. Emits (day, kmv_estimate) per active day.
   *
   * Scale: one corpus pass to (day, hash) distinct, one per-day k-min
   * aggregate (≤ k longs of state), then the days²·k/2 triangular
   * explode — days are calendar-bounded, so the quadratic term is
   * noise. Exact-count alternative: a cumulative `count(DISTINCT)`
   * holds every id in state forever; this holds k longs per day.
   */
  def cumulativeDistinct(events: DataFrame, tsCol: String = "ts",
                         idCol: String = "user_id",
                         k: Int = 64): DataFrame = {
    val mink = graft.functions.MinKLongs.udaf(k)
    val kmv = graft.functions.KmvSketch.udaf(k)
    val dayH = events
      .select(to_date(col(tsCol)).as("day"),
        graft.functions.TextFns.polyHash(s"CAST($idCol AS STRING)").as("h"))
      .distinct()
    val perDay = dayH.groupBy("day").agg(mink(col("h")).as("__hs"))
    val ex = perDay.select(col("day").as("__src"), explode(col("__hs")).as("h"))
    perDay.select(col("day"))
      .join(ex, col("__src") <= col("day"))
      .groupBy("day")
      .agg(kmv(col("h")).as("kmv_estimate"))
  }

  /** [[cumulativeDistinct]] sliced per group — the per-source
   * unique-users-to-date curves (one feed's audience going flat hides
   * inside the corpus-wide curve). Same per-day k-min pre-reduction
   * and triangular union, within each group. Emits
   * (grpCol, day, kmv_estimate). */
  def cumulativeDistinctByGroup(events: DataFrame, tsCol: String = "ts",
                                idCol: String = "user_id",
                                grpCol: String = "event_type",
                                k: Int = 64): DataFrame = {
    val mink = graft.functions.MinKLongs.udaf(k)
    val kmv = graft.functions.KmvSketch.udaf(k)
    val dayH = events
      .select(col(grpCol).as("__g"), to_date(col(tsCol)).as("day"),
        graft.functions.TextFns.polyHash(s"CAST($idCol AS STRING)").as("h"))
      .distinct()
    val perDay = dayH.groupBy("__g", "day").agg(mink(col("h")).as("__hs"))
    val ex = perDay.select(col("__g"), col("day").as("__src"),
      explode(col("__hs")).as("h"))
    perDay.select(col("__g"), col("day"))
      .join(ex, Seq("__g"))
      .filter(col("__src") <= col("day"))
      .groupBy(col("__g"), col("day"))
      .agg(kmv(col("h")).as("kmv_estimate"))
      .withColumnRenamed("__g", grpCol)
  }

  def latenessAudit(events: DataFrame, grpCol: String = "event_type",
                    tsCol: String = "ts"): DataFrame = {
    val per = events.groupBy(grpCol)
      .agg(count(lit(1)).as("n"), max(tsUs(col(tsCol))).as("max_ts_us"))
    val top = per.agg(max(col("max_ts_us")).as("__top"))
    per.crossJoin(broadcast(top))
      .select(col(grpCol), col("n"), col("max_ts_us"),
        (col("__top") - col("max_ts_us")).as("lag_us"))
  }
}
