package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(u: Long, ty: String, t: String) = (u, ty, ts(t))

  test("funnel: strict ordering gates each step on the prior first-reach") {
    val events = Seq(
      // user 1: full ordered funnel
      ev(1L, "view", "2024-01-01 10:00:00"),
      ev(1L, "click", "2024-01-01 10:05:00"),
      ev(1L, "purchase", "2024-01-01 10:10:00"),
      // user 2: clicked BEFORE first view — click must not count
      ev(2L, "click", "2024-01-01 09:00:00"),
      ev(2L, "view", "2024-01-01 10:00:00"),
      // user 3: view + click, no purchase
      ev(3L, "view", "2024-01-01 08:00:00"),
      ev(3L, "click", "2024-01-01 08:30:00"),
      // user 4: same-instant view and click — strict > excludes the click
      ev(4L, "view", "2024-01-01 12:00:00"),
      ev(4L, "click", "2024-01-01 12:00:00"),
      // user 5: purchase only — never enters the funnel
      ev(5L, "purchase", "2024-01-01 13:00:00"))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1) == (("view", 4L, 1000000L, 1000000L)))     // users 1-4
    assert(got(2) == (("click", 2L, 500000L, 500000L)))      // users 1, 3
    assert(got(3) == (("purchase", 1L, 250000L, 500000L)))   // user 1
  }

  test("retention: week cohorts, any-event activity, exact ppm") {
    val events = Seq(
      // cohort week of 2024-01-01 (Monday): users 1, 2
      ev(1L, "signup", "2024-01-02 10:00:00"),
      ev(2L, "signup", "2024-01-03 10:00:00"),
      // user 1 active week 0 (signup itself) and week 1
      ev(1L, "click", "2024-01-09 10:00:00"),
      // user 2 active only week 0; a PRE-signup event must not count
      ev(2L, "view", "2023-12-25 10:00:00"),
      // user 3 never signs up: excluded entirely
      ev(3L, "click", "2024-01-02 12:00:00"))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.retention(events, "user_id", "event_type", "ts", "signup")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("2024-01-01", 0)) == ((2L, 2L, 1000000L)))
    assert(got(("2024-01-01", 1)) == ((1L, 2L, 500000L)))
    assert(got.size == 2)
  }

  test("timeToConvert: gated deltas, exact quantiles") {
    val events = Seq(
      ev(1L, "view", "2024-01-01 10:00:00"),
      ev(1L, "purchase", "2024-01-01 10:01:40"),  // 100 s
      ev(2L, "view", "2024-01-01 10:00:00"),
      ev(2L, "purchase", "2024-01-01 10:03:20"),  // 200 s (first purchase counts)
      ev(2L, "purchase", "2024-01-01 11:00:00"),
      ev(3L, "purchase", "2024-01-01 09:00:00"),  // pre-view purchase: out
      ev(3L, "view", "2024-01-01 10:00:00"))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.timeToConvert(events, "user_id", "event_type", "ts",
        "view", "purchase", Seq(0.0, 0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got(0.0) == ((2L, 100.0)))
    assert(got(0.5) == ((2L, 150.0))) // interpolated between 100 and 200
    assert(got(1.0) == ((2L, 200.0)))
  }

  test("funnel: later re-occurrence of an earlier step does not reset") {
    val events = Seq(
      ev(1L, "view", "2024-01-01 10:00:00"),
      ev(1L, "view", "2024-01-01 11:00:00"), // second view irrelevant
      ev(1L, "click", "2024-01-01 10:30:00"))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // click at 10:30 is after the FIRST view (10:00) → converts
    assert(got(1) == 1L && got(2) == 1L)
  }
}
