package graft.ops

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  test("gapFillLocf fills each key's own span with the last observed total") {
    val day = 10L
    val ev = Seq(
      // user 1: day 0 (5.0 + 2.5), gap days 1-2, day 3 (1.0)
      (1L, 1L, 5.0), (1L, 3L, 2.5), (1L, 31L, 1.0),
      // user 2: single day — no gaps, no fabricated span
      (2L, 55L, 9.0),
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFillLocf(ev, "user_id", "ts", "value", periodNs = day)
      .orderBy("user_id", "period")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(out.toSeq == Seq(
      (1L, 0L, 7.5, true),
      (1L, 1L, 7.5, false), // carried
      (1L, 2L, 7.5, false), // carried
      (1L, 3L, 1.0, true),
      (2L, 5L, 9.0, true),
    ))
  }

  test("gapFillLocf spans are per key: one long-lived key does not widen another's grid") {
    val ev = Seq(
      (1L, 0L, 1.0), (1L, 1000L, 2.0), // user 1 spans 100 periods
      (2L, 500L, 3.0),                 // user 2 is a single period
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFillLocf(ev, "user_id", "ts", "value", periodNs = 10L)
    assert(out.filter($"user_id" === 2L).count() == 1)
    assert(out.filter($"user_id" === 1L).count() == 101)
    // no nulls anywhere: leading rows are observed by construction
    assert(out.filter($"value_filled".isNull).count() == 0)
  }
}
