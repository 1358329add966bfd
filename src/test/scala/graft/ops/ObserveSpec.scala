package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class ObsEv(k: Long, v: Option[String])

class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("batch counters ride the action: exact rows and null counts, results unchanged") {
    val df = Seq((1L, Option("a")), (2L, None), (3L, Option("c")), (4L, None))
      .toDF("id", "s")
    val (rows, metrics) = Observe.counted(df, Seq("s")) { d =>
      d.filter(col("id") =!= 99L).collect()
    }
    assert(rows.length == 4)
    assert(metrics("rows") == 4L)
    assert(metrics("nulls_s") == 2L)
  }

  test("observed metrics are exact under repartitioning (merged per task, not sampled)") {
    val df = (1 to 1000).map(i => (i.toLong, if (i % 7 == 0) None else Some(s"v$i")))
      .toDF("id", "s").repartition(13)
    val (_, metrics) = Observe.counted(df, Seq("s"))(_.count())
    assert(metrics("rows") == 1000L)
    assert(metrics("nulls_s") == (1000 / 7).toLong)
  }

  test("quality metrics: contract counters equal direct aggregation; attach point governs") {
    val df = Seq(
      (1L, Some(10.0)), (2L, None), (3L, Some(-3.0)),
      (4L, Some(7.0)), (5L, None),
    ).toDF("id", "v")
    val observed = Observe.withQualityMetrics(df, "quality",
      nullCols = Seq("v"),
      extras = Map("neg_v" -> sum(when(col("v") < 0, 1L).otherwise(0L))))
    // before any action the metric row is a zero/null placeholder
    assert(Observe.metrics(observed)("quality")("rows") == 0L)
    observed.collect()
    val m = Observe.metrics(observed)("quality")
    assert(m("rows") == 5L && m("nulls_v") == 2L && m("neg_v") == 1L, m.toString)
    val plan = observed.queryExecution.executedPlan.toString
    assert(plan.contains("CollectMetrics"), plan.take(400))
    // attached BEFORE a filter: counts the pre-filter rows (observe
    // inputs, emit survivors) — and the metrics belong to the frame
    // that EXECUTED (the derived frame's QueryExecution)
    val gated = Observe.withQualityMetrics(spark.range(100).toDF("id"), "pre")
      .filter(col("id") % 2 === 0)
    assert(gated.count() == 50)
    gated.collect()
    assert(Observe.metrics(gated)("pre")("rows") == 100L)
  }

  test("real table: counters match direct aggregation on lineitem") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val observed = Observe.withQualityMetrics(li, "li",
      nullCols = Seq("l_quantity"),
      extras = Map("nonpos_qty" ->
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L))))
    observed.collect()
    val m = Observe.metrics(observed)("li")
    val direct = li.agg(count(lit(1)),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)),
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)))
      .head()
    assert(m("rows") == direct.getLong(0))
    assert(m("nulls_l_quantity") == direct.getLong(1))
    assert(m("nonpos_qty") == direct.getLong(2))
  }

  test("extras colliding with generated metric names are rejected up front") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val e1 = intercept[IllegalArgumentException] {
      Observe.withQualityMetrics(li, "li", nullCols = Seq("l_quantity"),
        extras = Map("rows" -> count(lit(1))))
    }
    assert(e1.getMessage.contains("rows"))
    val e2 = intercept[IllegalArgumentException] {
      Observe.withQualityMetrics(li, "li", nullCols = Seq("l_quantity"),
        extras = Map("nulls_l_quantity" -> count(lit(1))))
    }
    assert(e2.getMessage.contains("nulls_l_quantity"))
  }

  test("streaming: per-batch observed metrics surface in the progress events") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("graft_obs_")
    val input = MemoryStream[ObsEv]
    input.addData((1 to 50).map(i =>
      ObsEv(i.toLong, if (i % 5 == 0) None else Some(s"x$i"))): _*)
    val q = Observe.withCountersNamed(input.toDF(), "intake", Seq("v"))
      .writeStream
      .format("noop")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val observed = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("intake")))
    assert(observed.nonEmpty, "progress must carry the intake metrics")
    val rows = observed.map(_.getAs[Long]("rows")).sum
    val nulls = observed.map(_.getAs[Long]("nulls_v")).sum
    assert(rows == 50L && nulls == 10L, s"rows=$rows nulls=$nulls")
  }
}
