package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  test("funnel walks stages strictly in order and keeps nulls monotone") {
    val ev = Seq(
      // user 1: full journey, but an early purchase (t=5) precedes the
      // click and must NOT convert — the valid purchase is t=40
      (1L, 10L, "view"), (1L, 5L, "purchase"), (1L, 20L, "click"), (1L, 40L, "purchase"),
      // user 2: view only
      (2L, 10L, "view"),
      // user 3: clicks and purchases but never views → stage 0
      (3L, 10L, "click"), (3L, 20L, "purchase"),
      // user 4: no funnel events at all (only errors)
      (4L, 10L, "error"),
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(ev, "user_id", "ts", "event_type", stages)
      .orderBy("user_id")
      .select("user_id", "ts_view", "ts_click", "ts_purchase", "stage_reached")
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)].collect()
    assert(out(0) == ((1L, Some(10L), Some(20L), Some(40L), 3)))
    assert(out(1) == ((2L, Some(10L), None, None, 1)))
    assert(out(2) == ((3L, None, None, None, 0)))
    assert(out(3) == ((4L, None, None, None, 0)))
  }

  test("funnel ordering is strict: a same-timestamp next stage does not convert") {
    val ev = Seq(
      (1L, 10L, "view"), (1L, 10L, "click"), // simultaneous → no conversion
      (2L, 10L, "view"), (2L, 11L, "click"),
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(ev, "user_id", "ts", "event_type", stages)
      .orderBy("user_id")
      .select("user_id", "stage_reached").as[(Long, Int)].collect()
    assert(out(0) == ((1L, 1)))
    assert(out(1) == ((2L, 2)))
  }

  test("funnel with maxGap only converts within the deadline, anchored at first stage") {
    val ev = Seq(
      // user 1: click 5 after view (inside gap 10), purchase 50 after click (outside)
      (1L, 10L, "view"), (1L, 15L, "click"), (1L, 65L, "purchase"),
      // user 2: click 30 after view — outside the gap entirely
      (2L, 10L, "view"), (2L, 40L, "click"),
      // user 3: all inside
      (3L, 10L, "view"), (3L, 15L, "click"), (3L, 20L, "purchase"),
      // user 4: a LATER re-view would open a window, but the walk
      // anchors at the FIRST view (strict policy) — no conversion
      (4L, 10L, "view"), (4L, 100L, "view"), (4L, 105L, "click"),
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(ev, "user_id", "ts", "event_type", stages,
        maxGap = Some(10L))
      .orderBy("user_id")
      .select("user_id", "stage_reached").as[(Long, Int)].collect()
    assert(out.toSeq == Seq((1L, 2), (2L, 1), (3L, 3), (4L, 1)))
  }

  test("funnel picks the EARLIEST valid event per stage") {
    val ev = Seq(
      (1L, 10L, "view"), (1L, 30L, "click"), (1L, 20L, "click"), (1L, 50L, "purchase"),
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(ev, "user_id", "ts", "event_type", stages)
      .select("ts_click").as[Long].head()
    assert(out == 20L)
  }

  test("retentionCohorts builds the triangle with per-period dedup") {
    val day = 10L
    val ev = Seq(
      // user 1: first day 0, returns day 2 (twice — counts once)
      (1L, 1L), (1L, 21L), (1L, 25L),
      // user 2: first day 0, never returns
      (2L, 5L),
      // user 3: first day 2, returns day 3
      (3L, 22L), (3L, 33L),
    ).toDF("user_id", "ts")
    val out = Funnel.retentionCohorts(ev, "user_id", "ts", periodNs = day)
      .orderBy("cohort_period", "offset")
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (0L, 0L, 2L), // cohort day 0: users 1,2
      (0L, 2L, 1L), // user 1 back on day 2
      (2L, 0L, 1L), // cohort day 2: user 3
      (2L, 1L, 1L), // user 3 back on day 3
    ))
  }

  test("transitionMatrix counts adjacent steps per user in time order") {
    val ev = Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "view"),
      (2L, 10L, 4L, "view"), (2L, 20L, 5L, "click"),
      (3L, 10L, 6L, "error"), // single event: no transition
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ops.Funnel.transitionMatrix(ev, "user_id", "ts", "event_type", "event_id")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long)].collect()
    assert(out.toSeq == Seq(
      ("click", "view", 1L), // user 1: click→view
      ("view", "click", 2L), // users 1 and 2
    ))
  }

  test("transitionMatrix breaks timestamp ties on the tie column, not arrival order") {
    val ev = Seq(
      (1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"), (1L, 20L, 3L, "c"),
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ops.Funnel.transitionMatrix(ev, "user_id", "ts", "event_type", "event_id")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long)].collect()
    // order is a (id 1) → b (id 2) → c: transitions a→b, b→c
    assert(out.toSeq == Seq(("a", "b", 1L), ("b", "c", 1L)))
  }

  test("retentionCohorts survives epoch-ns magnitudes (integral div, not double)") {
    // two ns timestamps in the same day whose double-rounded quotients
    // would straddle a boundary if `/` were used
    val dayNs = 86400000000000L
    val base = 1704067200000000000L // 2024-01-01 in ns — far above 2^53
    val ev = Seq(
      (1L, base + 1L),
      (1L, base + dayNs - 1L), // same day
      (1L, base + dayNs + 1L), // next day
    ).toDF("user_id", "ts")
    val out = Funnel.retentionCohorts(ev, "user_id", "ts", periodNs = dayNs)
      .orderBy("offset")
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((19723L, 0L, 1L), (19723L, 1L, 1L)))
  }
}
