package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("approx distinct within HLL++ error bound of exact") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val exact = events.select(countDistinct($"user_id")).as[Long].head()
    val approx = events.select(Approx.distinct($"user_id")).as[Long].head()
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.15, s"approx=$approx exact=$exact err=$err")
  }

  // The reaggregation property that makes sketch tables worth storing:
  // union of per-day sketches answers the all-time question without
  // touching raw data, within sketch error of the exact answer.
  test("stored HLL sketches reaggregate across fine groups") {
    val events = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("day", expr("ts div 86400000000000"))
    // fine sketch table: per (event_type, day)
    val sketchTable = Approx.preaggDistinct(events, Seq("event_type", "day"), "user_id")
    assert(sketchTable.columns.toSeq == Seq("event_type", "day", "sketch"))
    // coarse question answered from sketches only: per-type all-time
    val est = Approx.reaggregateDistinct(sketchTable, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val err = math.abs(est(k) - ex).toDouble / math.max(ex, 1L)
      assert(err < 0.1, s"$k: est=${est(k)} exact=$ex err=$err")
    }
  }

  test("approx percentiles bracket the exact ones") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val Seq(p50a, p95a) = events
      .select(Approx.percentiles($"value", Seq(0.5, 0.95)).as("p"))
      .as[Seq[Double]].head().toSeq
    val Array(p50e, p95e) =
      events.stat.approxQuantile("value", Array(0.5, 0.95), 0.0) // exact at rel=0
    assert(math.abs(p50a - p50e) <= math.max(0.05 * math.abs(p50e), 0.5),
      s"p50 approx=$p50a exact=$p50e")
    assert(math.abs(p95a - p95e) <= math.max(0.05 * math.abs(p95e), 0.5),
      s"p95 approx=$p95a exact=$p95e")
  }

  test("rollup emits one sketch row per group") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val r = Approx.rollup(events, Seq("event_type"), "user_id", "value")
    val types = events.select($"event_type").distinct().count()
    assert(r.count() == types)
    assert(r.columns.toSet ==
      Set("event_type", "cnt", "approx_distinct", "approx_percentiles"))
  }
}
