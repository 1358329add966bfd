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
