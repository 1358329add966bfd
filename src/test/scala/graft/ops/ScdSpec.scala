package graft.ops

import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import spark.implicits._

  test("type2 builds validity intervals; a revisited value opens a NEW interval") {
    // user 1: A A B A  → three intervals (A is history twice, not merged)
    // user 2: X        → one open interval
    val df = Seq(
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L), (1L, "A", 40L, 4L),
      (2L, "X", 15L, 5L),
    ).toDF("user_id", "event_type", "ts_us", "event_id")
    val out = Scd.type2(df, "user_id", "event_type", "ts_us", "event_id")
      .orderBy("user_id", "valid_from")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "A", 10L, 30L, 2L),
      (1L, "B", 30L, 40L, 1L),
      (1L, "A", 40L, -1L, 1L),
      (2L, "X", 15L, -1L, 1L),
    ))
  }

  test("tiebreak decides run order for equal versions") {
    val df = Seq(
      (1L, "B", 10L, 2L), (1L, "A", 10L, 1L), // same version: event_id orders A before B
    ).toDF("user_id", "event_type", "ts_us", "event_id")
    val out = Scd.type2(df, "user_id", "event_type", "ts_us", "event_id")
      .orderBy("valid_from", "event_type")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq("A", "B"))
  }
}
