package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("retention: cohort = first-event week, offsets count distinct users") {
    def week(t: String): Long =
      Timestamp.valueOf(t).getTime / 1000 / 86400 / 7
    // u1 active in two consecutive weeks; u2 same cohort week as u1's
    // SECOND week (two events, one distinct week); u3 a later cohort
    val t1a = "2024-01-01 10:00:00"; val t1b = "2024-01-09 10:00:00"
    val t2 = "2024-01-09 23:00:00"; val t3 = "2024-01-20 00:00:00"
    assert(week(t1b) == week(t1a) + 1 && week(t2) == week(t1b))
    val ev = Seq((1L, t1a), (1L, t1b), (2L, t2), (2L, t2), (3L, t3))
      .map { case (u, t) => (u, ts(t)) }.toDF("user_id", "ts")
    val out = rows(Sessions.retention(ev)
      .orderBy("cohort_week", "week_offset"))
    assert(out == Seq(
      Seq(week(t1a), 0L, 1L),  // u1 cohort week
      Seq(week(t1a), 1L, 1L),  // u1 returns the next week
      Seq(week(t2), 0L, 1L),   // u2's own cohort (u1's week-1 is separate)
      Seq(week(t3), 0L, 1L)))
  }

  test("funnel: ordered steps, time window, earliest-completion semantics") {
    val ev = Seq(
      // u1 completes the full funnel in order
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 01:00:00"),
      (1L, "purchase", "2024-01-01 02:00:00"),
      // u2: clicks BEFORE viewing — click step not completed
      (2L, "click", "2024-01-01 00:00:00"),
      (2L, "view", "2024-01-01 01:00:00"),
      // u3: clicks too late (> 1h after view)
      (3L, "view", "2024-01-01 00:00:00"),
      (3L, "click", "2024-01-01 02:00:01"),
      // u4: earliest view is the anchor — the valid click follows the
      // FIRST view even though a later view is closer
      (4L, "view", "2024-01-01 00:00:00"),
      (4L, "view", "2024-01-01 05:00:00"),
      (4L, "click", "2024-01-01 00:30:00"))
      .map { case (u, tpe, t) => (u, tpe, ts(t)) }
      .toDF("user_id", "event_type", "ts")
    val out = rows(Sessions.funnel(ev, Seq("view", "click", "purchase"),
      withinSeconds = 3600L))
    assert(out == Seq(
      Seq(0L, "view", 4L),      // u1 u2 u3 u4 all viewed
      Seq(1L, "click", 2L),     // u1 and u4
      Seq(2L, "purchase", 1L))) // u1
  }

  test("sessionize: gap starts a new session, per-user numbering from 1") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:10:00")), // 10 min gap -> same session
      (3L, 10L, ts("2024-01-01 01:00:00")), // 50 min gap -> new session
      (4L, 20L, ts("2024-01-01 05:00:00"))  // other user -> own session 1
    ).toDF("event_id", "user_id", "ts")
    val out = Sessions.sessionize(ev, gapSeconds = 1800).orderBy("event_id")
      .select("event_id", "session_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 1L)))
  }

  test("sessionize: boundary gap exactly equal to gapSeconds stays in session") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (2L, 1L, ts("2024-01-01 00:30:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = Sessions.sessionize(ev, gapSeconds = 1800)
      .select("session_id").as[Long].collect().toSet
    assert(out == Set(1L)) // strict > gap starts a new session
  }

  test("rollingCounts: trailing range window includes boundary, excludes older") {
    val ev = Seq(
      (1L, 7L, ts("2024-01-01 00:00:00")),
      (2L, 7L, ts("2024-01-01 00:30:00")), // 30 min later
      (3L, 7L, ts("2024-01-01 02:00:00")), // 2h after first
      (4L, 8L, ts("2024-01-01 00:10:00"))  // other user
    ).toDF("event_id", "user_id", "ts")
    val out = Sessions.rollingCounts(ev, windowSeconds = 3600)
      .select("event_id", "n_trailing").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L)
    assert(out(2L) == 2L) // events 1+2 within the hour
    assert(out(3L) == 1L) // event 2 is 90 min back -> out of range; only self
    assert(out(4L) == 1L)
  }

  test("intervalOverlapJoin: overlap semantics, no double-count across buckets") {
    import graft.operators.Relational
    val a = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 10:00:00")), // spans buckets
      (2L, ts("2024-01-02 00:00:00"), ts("2024-01-02 01:00:00")))
      .toDF("a_id", "a_start", "a_end")
    val b = Seq(
      (10L, ts("2024-01-01 09:00:00"), ts("2024-01-01 12:00:00")), // overlaps 1
      (11L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")), // touches 1's end: no overlap (half-open)
      (12L, ts("2024-01-02 00:30:00"), ts("2024-01-02 02:00:00"))) // overlaps 2
      .toDF("b_id", "b_start", "b_end")
    val out = Relational.intervalOverlapJoin(a, "a_start", "a_end",
      b, "b_start", "b_end", bucketSeconds = 3600)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 12L)))
  }

  test("windowedAgg sliding: each event lands in exactly length/slide windows") {
    val ev = Seq((1L, 1L, ts("2024-01-01 13:00:00"), "click", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Sessions.windowedAgg(ev, "1 day", slide = Some("12 hours"))
      .orderBy("w_start")
    val rs = rows(out)
    assert(rs.size == 2) // 1d/12h -> two overlapping windows
    assert(rs(0)(0) == ts("2024-01-01 00:00:00"))
    assert(rs(1)(0) == ts("2024-01-01 12:00:00"))
  }

  test("windowedAgg: epoch-aligned tumbling day windows, exact aggregates") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:30:00"), "click", 2.0),
      (2L, 2L, ts("2024-01-01 23:59:59"), "click", 5.0),
      (3L, 1L, ts("2024-01-02 00:00:00"), "click", 7.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Sessions.windowedAgg(ev, "1 day").orderBy("w_start")
    val rs = rows(out)
    assert(rs.size == 2)
    assert(rs(0)(0) == ts("2024-01-01 00:00:00") && rs(0)(1) == ts("2024-01-02 00:00:00"))
    assert(rs(0)(3) == 2L && rs(0)(4) == 2L) // n_events, n_users
    assert(rs(0)(5) == 2.0 && rs(0)(6) == 5.0)
    assert(rs(1)(3) == 1L)
  }

  test("eventTransitions: per-user timelines, ts ties broken by event_id") {
    val ev = Seq(
      // u1: view -> click -> view   (two transitions)
      (1L, 1L, "view", "2024-01-01 00:00:00"),
      (2L, 1L, "click", "2024-01-01 01:00:00"),
      (3L, 1L, "view", "2024-01-01 02:00:00"),
      // u2: simultaneous events — order falls back to event_id (4 then 5)
      (4L, 2L, "view", "2024-01-01 00:00:00"),
      (5L, 2L, "click", "2024-01-01 00:00:00"),
      // u3: single event, no transition
      (6L, 3L, "purchase", "2024-01-01 00:00:00"))
      .map { case (e, u, tpe, t) => (e, u, tpe, ts(t)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = rows(Sessions.eventTransitions(ev)
      .orderBy("from_type", "to_type"))
    // view->click from u1 and u2 (n_from(view)=2), click->view from u1
    assert(out == Seq(
      Seq("click", "view", 1L, 1L, 1.0),
      Seq("view", "click", 2L, 2L, 1.0)))
  }

  test("eventLift: user-day baskets, integer milli lift, a<b pairs only") {
    // 4 baskets: u1d1 {view, click}, u1d2 {view}, u2d1 {view, click},
    // u3d1 {view, buy}. n(view)=4, n(click)=2, n(buy)=1,
    // n(view,click)=2 -> lift = 4*2/(4*2) = 1.000
    // n(buy,view)=1  -> lift = 4*1/(1*4) = 1.000
    // click x buy never co-occur -> no row
    val ev = Seq(
      (1L, 1L, "view", "2024-01-01 01:00:00"),
      (2L, 1L, "click", "2024-01-01 02:00:00"),
      (3L, 1L, "view", "2024-01-01 03:00:00"),  // dup in basket: ignored
      (4L, 1L, "view", "2024-01-02 01:00:00"),
      (5L, 2L, "view", "2024-01-01 01:00:00"),
      (6L, 2L, "click", "2024-01-01 02:00:00"),
      (7L, 3L, "view", "2024-01-01 01:00:00"),
      (8L, 3L, "buy", "2024-01-01 02:00:00"))
      .map { case (e, u, tpe, t) => (e, u, tpe, ts(t)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = rows(Sessions.eventLift(ev).orderBy("type_a", "type_b"))
    assert(out == Seq(
      Seq("buy", "view", 1L, 4L, 1L, 1000L),
      Seq("click", "view", 2L, 4L, 2L, 1000L)))
  }

  test("resampleDaily: gap days forward-fill the last observation") {
    val ev = Seq(
      // u1: obs on day 1 (two events — later one wins) and day 4
      (1L, 1L, 10.0, "2024-01-01 08:00:00"),
      (2L, 1L, 20.0, "2024-01-01 09:00:00"),
      (3L, 1L, 40.0, "2024-01-04 12:00:00"),
      // u2: a single day — spine is that one day
      (4L, 2L, 7.0, "2024-01-03 00:00:00"))
      .map { case (e, u, v, t) => (e, u, v, ts(t)) }
      .toDF("event_id", "user_id", "value", "ts")
    val out = rows(Sessions.resampleDaily(ev).orderBy("user_id", "day"))
    assert(out.map(r => (r(0), r(1).toString, r(2), r(3))) == Seq(
      (1L, "2024-01-01", 20.0, false),  // last event of the day wins
      (1L, "2024-01-02", 20.0, true),   // gap: carried
      (1L, "2024-01-03", 20.0, true),
      (1L, "2024-01-04", 40.0, false),
      (2L, "2024-01-03", 7.0, false)))
  }

  test("countAnomaly: spike beyond 3 sigma flagged, steady traffic not") {
    // 7 baseline days at exactly 10 events/day (variance 0), then one
    // 11-event day (any deviation from a zero-variance baseline flags)
    // and a same-count 10-event day (never flags).
    def day(d: Int, n: Int, tpe: String) = (1 to n).map { i =>
      (d * 1000L + i, 1L, tpe, ts(f"2024-01-${d}%02d 12:00:00"))
    }
    val steady = (1 to 8).flatMap(d => day(d, 10, "click"))   // day 8 = 10
    val spiky = (1 to 7).flatMap(d => day(d, 10, "view")) ++
      day(8, 11, "view")                                      // day 8 = 11
    val ev = (steady ++ spiky)
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = rows(Sessions.countAnomaly(ev).orderBy("day", "event_type"))
    val day8 = out.filter(_(0).toString == "2024-01-08")
    assert(day8.map(r => (r(1), r(2), r(3), r(4))).toSet == Set(
      ("click", 10L, 7L, false),
      ("view", 11L, 7L, true)))
    // day 1 has an empty baseline: never flagged
    val day1 = out.filter(_(0).toString == "2024-01-01")
    assert(day1.forall(r => r(4) == false && r(3) == 0L))
  }

  test("attribution: latest prior touch wins, lookback bounds, no-touch " +
      "conversions keep null credit") {
    val ev = Seq(
      // user 1: view, click, purchase -> credit the click (latest touch)
      (1L, 100L, "view", ts("2024-01-01 10:00:00")),
      (2L, 100L, "click", ts("2024-01-01 11:00:00")),
      (3L, 100L, "purchase", ts("2024-01-01 12:00:00")),
      // user 2: touch 8 days before purchase -> outside 7d lookback
      (4L, 200L, "click", ts("2024-01-01 00:00:00")),
      (5L, 200L, "purchase", ts("2024-01-09 00:00:01")),
      // user 3: purchase with no touch at all; an error event is no touch
      (6L, 300L, "error", ts("2024-01-02 09:00:00")),
      (7L, 300L, "purchase", ts("2024-01-02 10:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = rows(Sessions.attribution(ev).orderBy("conversion_id"))
    assert(out.map(r => (r(0), r(3), r(4))) == Seq(
      (3L, 2L, "click"),
      (5L, null, null),
      (7L, null, null)))
    // the credited gap is exactly one hour in microseconds
    assert(out.head(5) == 3600L * 1000000L)
  }
}
