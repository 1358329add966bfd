package graft.ops

import graft.SparkSpec
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("relational and stateful sessionization agree on real events") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val gapNs = 1800000000000L // 30 min

    val relational = Sessionize.byGap(
      events, "user_id", "ts", "value", gap = gapNs, tieBreak = "event_id")
      .select($"user_id", $"n_events".as("n"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap

    // stateful path (batch mode of the streaming operator): ms grain
    val typed = events.select(
      $"event_id", (col("ts") / 1000000L).cast("long").as("ts"),
      $"user_id", $"event_type", $"value")
      .as[EventStreams.Event]
    // in batch mode every group is one invocation and open sessions
    // never flush — close them by appending a far-future sentinel per user
    val users = events.select($"user_id").distinct().as[Long].collect()
    val farFutureMs = 4000000000000L // ~2096: safely past every event + gap
    val sentinels = users.map(u =>
      EventStreams.Event(Long.MaxValue, farFutureMs, u, "sentinel", 0.0)).toSeq
    val stateful = EventStreams
      .sessionize(typed.union(sentinels.toDS()), gapMs = gapNs / 1000000L)
      .select($"user_id", $"n_events".as("n"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap

    assert(relational.keySet == stateful.keySet)
    relational.keySet.foreach { u =>
      assert(relational(u) == stateful(u),
        s"user $u: relational=${relational(u)} stateful=${stateful(u)}")
    }
  }

  test("gap splits exactly at the boundary") {
    val gap = 100L
    val df = Seq(
      (1L, 0L, 1.0), (2L, 100L, 1.0),  // diff == gap: same session
      (3L, 201L, 1.0),                 // diff 101 > gap: new session
    ).toDF("event_id", "ts", "value").withColumn("user_id", lit(7L))
    val out = Sessionize.byGap(df, "user_id", "ts", "value", gap, "event_id")
      .orderBy("session_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(2) == 2L && out(1).getLong(2) == 1L)
  }
}
