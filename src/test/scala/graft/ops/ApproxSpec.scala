package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("approx distinct within HLL++ error bound of exact") {
    val events = graft.Tables.events(spark, sf)
    val exact = events.select(countDistinct($"user_id")).as[Long].head()
    val approx = events.select(Approx.distinct($"user_id")).as[Long].head()
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.15, s"approx=$approx exact=$exact err=$err")
  }

  // The reaggregation property that makes sketch tables worth storing:
  // union of per-day sketches answers the all-time question without
  // touching raw data, within sketch error of the exact answer.
  test("stored HLL sketches reaggregate across fine groups") {
    val events = graft.Tables.events(spark, sf)
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
    val events = graft.Tables.events(spark, sf)
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

  // Count-min: skewed synthetic counts — key i appears ~ 3000/i times
  // (a genuine zipf head), so heavy hitters are well separated.
  private def zipfDf = {
    import spark.implicits._
    (1 to 60).flatMap(i => Seq.fill(3000 / i)(i.toLong))
      .zipWithIndex.map { case (k, row) => (k, row.toLong) }
      .toDF("key", "row_id")
  }

  test("count-min never undercounts and overcounts within the epsilon-N bound") {
    val df = zipfDf
    val n = df.count()
    val depth = 4; val width = 256
    val cells = Approx.cmsCells(df, "key", Nil, depth, width)
    // the sketch table is bounded by depth x width no matter the input
    assert(cells.count() <= depth.toLong * width)
    val exact = df.groupBy("key").count().as[(Long, Long)].collect().toMap
    val keys = exact.keySet.toSeq.toDF("key")
    val est = Approx.cmsEstimate(cells, keys, depth, width)
      .as[(Long, Long)].collect().toMap
    val epsN = math.ceil(math.E / width * n).toLong
    exact.foreach { case (k, ex) =>
      assert(est(k) >= ex, s"CMS must never undercount: key=$k est=${est(k)} exact=$ex")
      assert(est(k) - ex <= 3 * epsN,
        s"overcount beyond bound: key=$k est=${est(k)} exact=$ex epsN=$epsN")
    }
  }

  test("count-min merge of batch sketches is cell-identical to the single-pass sketch") {
    val df = zipfDf
    val a = df.filter($"row_id" % 2 === 0)
    val b = df.filter($"row_id" % 2 =!= 0)
    val merged = Approx.cmsMerge(
        Approx.cmsCells(a, "key").unionByName(Approx.cmsCells(b, "key")))
      .select("j", "cell", "cnt").as[(Int, Long, Long)].collect().toSet
    val whole = Approx.cmsCells(df, "key")
      .select("j", "cell", "cnt").as[(Int, Long, Long)].collect().toSet
    assert(merged == whole, "cell-wise sum must equal the one-shot sketch exactly")
  }

  test("heavyHitters recovers the true top keys from sample + sketch") {
    val df = zipfDf
    val hh = Approx.heavyHitters(df, "key", sampleCol = "row_id", k = 5)
      .as[(Long, Long)].collect()
    // keys 1..5 have counts 3000,1500,1000,750,600 — far above both the
    // CMS error and any sampling miss probability
    assert(hh.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L), s"got ${hh.toSeq}")
    // and estimates are ordered like the true counts
    assert(hh.map(_._2).toSeq == hh.map(_._2).toSeq.sorted.reverse)
  }

  test("rollup emits one sketch row per group") {
    val events = graft.Tables.events(spark, sf)
    val r = Approx.rollup(events, Seq("event_type"), "user_id", "value")
    val types = events.select($"event_type").distinct().count()
    assert(r.count() == types)
    assert(r.columns.toSet ==
      Set("event_type", "cnt", "approx_distinct", "approx_percentiles"))
  }
}
