package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkSpec {
  import EventStreams._

  private val H = 3600L * 1000 // one hour in millis
  private val B = 1600000000000L // base epoch: keeps events above the initial watermark (0)

  test("watermarked tumbling windows aggregate per (window, type) incrementally") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val counts = hourlyCounts(
      input.toDF().withColumn("ts", timestamp_millis($"ts")))
    val q = counts.writeStream.format("memory").queryName("hourly")
      .outputMode("update").start()
    try {
      input.addData(
        Event(1, 0L, 1, "click", 1.0),
        Event(2, 10L * 60 * 1000, 2, "click", 2.0),
        Event(3, H + 1000, 1, "view", 5.0))
      q.processAllAvailable()
      val r1 = spark.sql("SELECT * FROM hourly").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(r1.toSet == Set((0L, "click", 2L, 3.0), (H, "view", 1L, 5.0)))

      // second micro-batch updates the open hour-0 window
      input.addData(Event(4, 20L * 60 * 1000, 3, "click", 4.0))
      q.processAllAvailable()
      val r2 = spark.sql("SELECT * FROM hourly WHERE event_type='click'").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(2), r.getDouble(3))).toSet
      assert(r2.contains((0L, 3L, 7.0)), r2.toString)
    } finally q.stop()
  }

  test("dedupeStream drops within-watermark duplicates across micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val deduped = EventStreams.dedupeStream(
      input.toDF().withColumn("ts", timestamp_millis($"ts")),
      watermarkDelay = "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, B, 1, "click", 1.0),
        Event(1, B, 1, "click", 1.0),        // same-batch duplicate
        Event(2, B + 1000, 2, "view", 2.0))
      q.processAllAvailable()
      // cross-batch duplicate of id 1 (at-least-once transport replay)
      input.addData(
        Event(1, B + 2000, 1, "click", 1.0),
        Event(3, B + 3000, 3, "click", 3.0))
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), ids.mkString(","))
    } finally q.stop()
  }

  test("sessionize: gap splits sessions, state flushes on later events") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = sessionize(input.toDS(), gapMs = 5L * 60 * 1000) // 5 min gap
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // user 1: burst at t=0..2min, then silence; user 2: one event
      input.addData(
        Event(1, B, 1, "click", 1.0),
        Event(2, B + 60L * 1000, 1, "click", 2.0),
        Event(3, B + 120L * 1000, 1, "view", 3.0),
        Event(4, B, 2, "click", 9.0))
      q.processAllAvailable()
      // nothing closed yet — sessions still open in state
      assert(spark.sql("SELECT * FROM sess").count() == 0)

      // user 1 returns 30 min later: the gap closes user 1's first
      // session, and the advancing watermark (B+30m − 10m delay)
      // passes user 2's end+gap → event-time TIMEOUT flushes user 2's
      // idle session without any new event for that user
      input.addData(Event(5, B + 30L * 60 * 1000, 1, "click", 10.0))
      q.processAllAvailable()
      val closed = spark.sql("SELECT * FROM sess").as[Session].collect()
        .sortBy(_.user_id)
      assert(closed.length == 2, closed.mkString(","))
      val s1 = closed(0)
      assert(s1.user_id == 1L && s1.start_ts == B && s1.end_ts == B + 120000L)
      assert(s1.n_events == 3L && s1.total_value == 6.0)
      val s2 = closed(1)
      assert(s2.user_id == 2L && s2.n_events == 1L && s2.total_value == 9.0)
    } finally q.stop()
  }

  test("sliding windows put each event in len/slide overlapping windows") {
    val spark2 = spark
    import spark2.implicits._
    val batch = Seq(Event(1, B + 45L * 60 * 1000, 1, "click", 1.0))
      .toDF().withColumn("ts", timestamp_millis($"ts"))
    val wins = hourlyCounts(batch, slide = Some("30 minutes"))
      .orderBy("window_start").collect()
    assert(wins.length == 2) // 1h window, 30min slide → 2 windows per event
  }

  test("hourlyCounts runs identically on a batch frame (unified API)") {
    val spark2 = spark
    import spark2.implicits._
    val batch = Seq(
      Event(1, 0L, 1, "click", 1.0),
      Event(2, H + 1, 1, "click", 2.0),
    ).toDF().withColumn("ts", timestamp_millis($"ts"))
    val out = hourlyCounts(batch).orderBy("window_start").collect()
    assert(out.length == 2 && out(0).getLong(2) == 1L)
  }

  private val funnelStages = Seq("view", "click", "purchase")

  test("funnelStream agrees with the batch funnel on in-order input") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      // user 1 completes; an early purchase (before click) must not count
      Event(1, B + 10, 1, "view", 0), Event(2, B + 15, 1, "purchase", 0),
      Event(3, B + 20, 1, "click", 0), Event(4, B + 40, 1, "purchase", 0),
      // user 2 views only; user 3 clicks without viewing
      Event(5, B + 10, 2, "view", 0),
      Event(6, B + 10, 3, "click", 0),
    )
    val input = MemoryStream[Event]
    val q = funnelStream(input.toDS(), funnelStages)
      .writeStream.format("memory").queryName("funnel_agree")
      .outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT user_id, stage, stage_name, ts FROM funnel_agree")
        .as[(Long, Int, String, Long)].collect().toSet
      assert(streamed == Set(
        (1L, 1, "view", B + 10), (1L, 2, "click", B + 20), (1L, 3, "purchase", B + 40),
        (2L, 1, "view", B + 10)))
      // the batch operator sees the same journeys
      val batchOut = graft.ops.Funnel.funnel(
          events.toDF().select($"user_id", $"ts", $"event_type"),
          "user_id", "ts", "event_type", funnelStages)
        .select("user_id", "stage_reached").as[(Long, Int)].collect().toMap
      val streamedMax = streamed.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(batchOut == Map(1L -> 3, 2L -> 1, 3L -> 0))
      assert(streamedMax == batchOut.filter(_._2 > 0))
    } finally q.stop()
  }

  test("funnelStream advances across micro-batches and completes without residual emissions") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = funnelStream(input.toDS(), funnelStages)
      .writeStream.format("memory").queryName("funnel_steps")
      .outputMode("append").start()
    try {
      input.addData(Event(1, B + 10, 1, "view", 0))
      q.processAllAvailable()
      input.addData(Event(2, B + 20, 1, "click", 0))
      q.processAllAvailable()
      // purchase at a ts equal to the click: strict order rejects it
      input.addData(Event(3, B + 20, 1, "purchase", 0))
      q.processAllAvailable()
      input.addData(Event(4, B + 30, 1, "purchase", 0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT stage, ts FROM funnel_steps WHERE user_id = 1")
        .as[(Int, Long)].collect().sorted
      assert(rows.toSeq == Seq((1, B + 10), (2, B + 20), (3, B + 30)))
    } finally q.stop()
  }

  test("funnelStream evicts abandoned walks: a comeback restarts from stage one") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = funnelStream(input.toDS(), funnelStages,
        watermarkDelay = "1 second", idleMs = 1000L)
      .writeStream.format("memory").queryName("funnel_evict")
      .outputMode("append").start()
    try {
      input.addData(Event(1, B, 1, "view", 0))
      q.processAllAvailable()
      // another user's much-later event advances the watermark far past
      // user 1's abandonment deadline (B + 1s)
      input.addData(Event(2, B + H, 9, "view", 0))
      q.processAllAvailable()
      // user 1 returns: with the walk evicted, a click cannot convert...
      input.addData(Event(3, B + H + 10, 1, "click", 0))
      q.processAllAvailable()
      // ...and a fresh view re-emits stage 1
      input.addData(Event(4, B + H + 20, 1, "view", 0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT stage, ts FROM funnel_evict WHERE user_id = 1")
        .as[(Int, Long)].collect().sorted
      assert(rows.toSeq == Seq((1, B), (1, B + H + 20)),
        "evicted walk must not convert on the click and must restart on the view")
    } finally q.stop()
  }

  test("sub-watermark rows are dropped by the engine before the state function") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // pins the engine contract the stateful operators lean on: with
    // EventTimeTimeout, a row whose event time sits below the current
    // watermark never reaches the state function — it can neither
    // corrupt state nor compute a below-watermark timeout (the
    // operators' wm+1 clamps stay purely defensive), and the query
    // must not fail
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapMs = 1000L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("clamp_sess")
      .outputMode("append").start()
    try {
      input.addData(Event(1, B + 10 * H, 9, "click", 1.0))
      q.processAllAvailable()
      // user 1's event predates the watermark by hours
      input.addData(Event(2, B, 1, "click", 1.0))
      q.processAllAvailable() // must not throw STREAM_FAILED
      input.addData(Event(3, B + 20 * H, 9, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(4, B + 30 * H, 9, "click", 1.0))
      q.processAllAvailable()
      val users = spark.sql("SELECT user_id FROM clamp_sess").as[Long].collect().toSet
      assert(users === Set(9L),
        "the sub-watermark event must be dropped whole — no session, no crash")
    } finally q.stop()
  }

  test("locfStream agrees with the batch gap-fill point-for-point") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1 active in periods 0, 3 (gap 1-2); user 2 in periods 1, 2;
    // two events in one period must sum exactly
    val events = Seq(
      Event(1, B + 10, 1, "m", 1.25), Event(2, B + 20, 1, "m", 2.25),
      Event(3, B + 3 * H + 10, 1, "m", 7.0),
      Event(4, B + H + 5, 2, "m", 4.5), Event(5, B + 2 * H + 5, 2, "m", 0.5),
    )
    val input = MemoryStream[Event]
    val q = locfStream(input.toDS(), periodMs = H, watermarkDelay = "1 second")
      .writeStream.format("memory").queryName("locf_agree")
      .outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // a far-future event from an unrelated user advances the
      // watermark past every fixture period, finalizing them
      input.addData(Event(9, B + 100 * H, 9, "m", 0.0))
      q.processAllAvailable()
      val streamed = spark
        .sql("SELECT user_id, period, value_filled, observed FROM locf_agree WHERE user_id < 9")
        .as[(Long, Long, Double, Boolean)].collect().toSet
      // the batch operator over the same events, at ms grain
      val batchOut = graft.ops.TimeSeries.gapFillLocf(
          events.toDF(), "user_id", "ts", "value", periodNs = H)
        .as[(Long, Long, Double, Boolean)].collect().toSet
      assert(streamed == batchOut, s"streamed $streamed vs batch $batchOut")
      // the gap rows really carry the last observed sum forward
      val gap = streamed.filter(r => r._1 == 1L && !r._4).map(r => (r._2, r._3))
      val p0 = Math.floorDiv(B, H)
      assert(gap == Set((p0 + 1, 3.5), (p0 + 2, 3.5)))
    } finally q.stop()
  }

  test("locfStream runs on a batch frame (unified API) and equals the batch operator exactly") {
    val spark2 = spark
    import spark2.implicits._
    // batch run: no watermark → every period finalizes; the streaming
    // operator IS the batch gap-fill on a complete dataset
    val events = Seq(
      Event(1, B + 10, 1, "m", 1.25), Event(2, B + 20, 1, "m", 2.25),
      Event(3, B + 3 * H + 10, 1, "m", 7.0),
      Event(4, B + H + 5, 2, "m", 4.5))
    val streamedOnBatch = locfStream(events.toDS(), periodMs = H)
      .as[(Long, Long, Double, Boolean)].collect().toSet
    val batchOut = graft.ops.TimeSeries.gapFillLocf(
        events.toDF(), "user_id", "ts", "value", periodNs = H)
      .as[(Long, Long, Double, Boolean)].collect().toSet
    assert(streamedOnBatch == batchOut)
    assert(streamedOnBatch.exists(!_._4), "the fixture has gap rows")
  }

  test("locfStream finalizes periods incrementally and absorbs within-delay late events") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = locfStream(input.toDS(), periodMs = H, watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("locf_steps")
      .outputMode("append").start()
    try {
      val p0 = Math.floorDiv(B, H)
      input.addData(Event(1, B + 10, 1, "m", 1.0))
      q.processAllAvailable()
      // period p0 is still open (watermark B+10 − 30min < period end)
      assert(spark.sql("SELECT * FROM locf_steps").count() == 0)
      // a late event for p0 arrives in batch 2 while a fresh event
      // pushes the watermark past p0's end: the total must include BOTH
      input.addData(
        Event(2, B + 20, 1, "m", 2.0),
        Event(3, B + 2 * H, 1, "m", 5.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT period, value_filled, observed FROM locf_steps")
        .as[(Long, Double, Boolean)].collect().toSet
      assert(rows == Set((p0, 3.0, true)), rows.toString)
    } finally q.stop()
  }

  test("locfStream evicts idle users: a comeback starts a fresh series, no bridge rows") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = locfStream(input.toDS(), periodMs = H,
        watermarkDelay = "1 second", idleMs = H)
      .writeStream.format("memory").queryName("locf_evict")
      .outputMode("append").start()
    try {
      val p0 = Math.floorDiv(B, H)
      input.addData(Event(1, B + 10, 1, "m", 2.0))
      q.processAllAvailable()
      // advance the watermark: finalizes p0, then (next batch) fires
      // the idle timer far past idleMs
      input.addData(Event(2, B + 2 * H, 9, "m", 0.0))
      q.processAllAvailable()
      input.addData(Event(3, B + 50 * H, 9, "m", 0.0))
      q.processAllAvailable()
      // user 1 returns 50 periods later; then a flusher finalizes it
      input.addData(Event(4, B + 51 * H + 10, 1, "m", 9.0))
      q.processAllAvailable()
      input.addData(Event(5, B + 100 * H, 9, "m", 0.0))
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT period, value_filled, observed FROM locf_evict WHERE user_id = 1")
        .as[(Long, Double, Boolean)].collect().toSet
      // NO gap rows bridge p0+1..p0+50 — the idle eviction dropped the
      // carried value; the comeback is a fresh one-point series
      assert(rows == Set((p0, 2.0, true), (p0 + 51, 9.0, true)), rows.toString)
    } finally q.stop()
  }
}
