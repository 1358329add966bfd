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
