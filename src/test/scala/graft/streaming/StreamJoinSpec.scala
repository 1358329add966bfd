package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

// top-level: nested case classes cannot be re-instantiated by the
// deserializer inside a streaming query's stateful operators
case class SjClick(user_id: Long, click_id: Long, click_ms: Long)
case class SjConv(conv_user: Long, conv_id: Long, conv_ms: Long)

class StreamJoinSpec extends SparkSpec {

  private val B = 1600000000000L

  /** Drain against a STABLE checkpoint so a second drain continues
    * the same query (state + offsets) — the memory-sink table then
    * holds only that drain's newly emitted rows. */
  private def drain(df: org.apache.spark.sql.DataFrame, name: String,
      ckpt: String): Unit = {
    val q = df.writeStream
      .format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("inner interval join attributes conversions within the window, batch ≡ stream") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("graft_sj_inner_")
    val clicks = MemoryStream[SjClick]
    val convs = MemoryStream[SjConv]
    clicks.addData(
      SjClick(1L, 10L, B),          // converts at +5m → inside 10m window
      SjClick(1L, 11L, B + 240000), // 4m later — also within 5m-of-conv window
      SjClick(2L, 20L, B),          // never converts
      SjClick(3L, 30L, B),          // its conversion arrives too late (+20m)
    )
    convs.addData(
      SjConv(1L, 100L, B + 300000),  // +5m
      SjConv(3L, 300L, B + 1200000), // +20m — outside the 10m bound
    )
    val joined = StreamJoin.attribution(
      clicks.toDF().withColumn("click_ts", timestamp_millis(col("click_ms"))),
      convs.toDF().withColumn("conv_ts", timestamp_millis(col("conv_ms"))),
      maxDelay = "10 minutes")
      .select("click_id", "conv_id")
    drain(joined, "sj_inner", ckpt)
    val got = spark.table("sj_inner").as[(Long, Long)].collect().toSet
    // conv 100 trails click 10 by 5m and click 11 by 1m — both attributed;
    // conv 300 is outside every window; clicks 20/30 unmatched (inner)
    assert(got == Set((10L, 100L), (11L, 100L)), got.toString)

    // batch twin: same frames, same condition, static join
    val bc = Seq(SjClick(1L, 10L, B), SjClick(1L, 11L, B + 240000),
      SjClick(2L, 20L, B), SjClick(3L, 30L, B))
      .toDF().withColumn("click_ts", timestamp_millis(col("click_ms")))
    val bv = Seq(SjConv(1L, 100L, B + 300000), SjConv(3L, 300L, B + 1200000))
      .toDF().withColumn("conv_ts", timestamp_millis(col("conv_ms")))
    val batch = bc.join(bv,
      col("user_id") === col("conv_user") &&
        col("conv_ts") >= col("click_ts") &&
        col("conv_ts") <= col("click_ts") + expr("INTERVAL 10 minutes"))
      .select("click_id", "conv_id").as[(Long, Long)].collect().toSet
    assert(batch == got)
  }

  test("leftOuter emits unconverted clicks with nulls once the watermark closes them") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("graft_sj_outer_")
    val clicks = MemoryStream[SjClick]
    val convs = MemoryStream[SjConv]
    clicks.addData(SjClick(1L, 10L, B), SjClick(2L, 20L, B))
    convs.addData(SjConv(1L, 100L, B + 60000))
    val joined = StreamJoin.attribution(
      clicks.toDF().withColumn("click_ts", timestamp_millis(col("click_ms"))),
      convs.toDF().withColumn("conv_ts", timestamp_millis(col("conv_ms"))),
      maxDelay = "10 minutes", watermarkDelay = "1 minute",
      joinType = "leftOuter")
      .select(col("click_id"), col("conv_id"))
    // foreachBatch sink: the memory sink cannot recover a checkpoint,
    // and the null-emission test NEEDS a second drain of the SAME
    // query (watermark state carried forward)
    val rows = scala.collection.mutable.Set.empty[(Long, Option[Long])]
    def drainOuter(): Unit = {
      val q = joined.writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach { r =>
            rows.synchronized {
              rows += ((r.getLong(0),
                if (r.isNullAt(1)) None else Some(r.getLong(1))))
            }
          }
        }
        .start()
      q.awaitTermination()
    }
    drainOuter()
    // first drain: the matched pair emits immediately; click 20's
    // window is still open, so no null row yet
    assert(rows.contains((10L, Some(100L))), rows.toString)
    assert(!rows.exists(_._2.isEmpty), rows.toString)
    // advance the watermark far past click 20's window and continue
    // the SAME query: the engine must now emit the null-extended row.
    // BOTH sides must advance — the global watermark is the MIN over
    // inputs, so a stale click-side watermark would hold everything
    clicks.addData(SjClick(9L, 90L, B + 7200000)) // +2h, unrelated user
    convs.addData(SjConv(9L, 900L, B + 7200000))
    drainOuter()
    // the engine emits watermark-expired outer rows in the batch
    // AFTER the one that advanced the watermark; one more round of
    // late data guarantees that batch exists
    clicks.addData(SjClick(8L, 80L, B + 10800000)) // +3h
    convs.addData(SjConv(8L, 800L, B + 10800000))
    drainOuter()
    assert(rows.contains((20L, None)), rows.toString)
    assert(!rows.contains((10L, None)), rows.toString) // matched click never nulls
  }
}
