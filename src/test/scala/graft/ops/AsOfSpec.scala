package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks the latest right row at or before each left ts") {
    val left = Seq(
      (100L, 1L, 50L),  // after right rows at ts 10, 40 → match 40
      (101L, 1L, 40L),  // ties right ts 40 → inclusive match 40
      (102L, 1L, 5L),   // before all right rows → null
      (103L, 2L, 99L),  // other key → its own right row
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (900L, 1L, 10L),
      (901L, 1L, 40L),
      (902L, 2L, 90L),
    ).toDF("event_id", "user_id", "ts")
    val got = AsOf.join(left, right, "user_id", "ts", "event_id", Seq("event_id"))
      .select($"event_id", $"asof_event_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got(100L).contains(901L))
    assert(got(101L).contains(901L)) // inclusive <=
    assert(got(102L).isEmpty)
    assert(got(103L).contains(902L))
  }

  test("multiple right rows at the same ts: ord breaks the tie to the max") {
    val left = Seq((1L, 1L, 100L)).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 1L, 100L), (11L, 1L, 100L)).toDF("event_id", "user_id", "ts")
    val got = AsOf.join(left, right, "user_id", "ts", "event_id", Seq("event_id"))
      .select($"asof_event_id").as[Long].head()
    assert(got == 11L) // last in (ts, side, ord) order
  }
}
