package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-time operators over an event log: gap-based sessionization and
 * tumbling-window aggregation — the batch twins of the Structured
 * Streaming surface in [[graft.streaming.Streams]].
 */
object Sessions {

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
    val week = expr(s"(unix_micros($tsCol) div 86400000000) div 7")
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
    val prevUs = lag(unix_micros(col(tsCol)), 1).over(w)
    val isNew = when(
      prevUs.isNull ||
        (unix_micros(col(tsCol)) - prevUs) > gapSeconds * 1000000L, 1L)
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
      .withColumn("__sec", unix_timestamp(col(tsCol)))
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
}
