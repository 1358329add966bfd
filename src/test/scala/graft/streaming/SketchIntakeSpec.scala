package graft.streaming

import graft.SparkSpec
import graft.ops.Approx
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

// top-level so Spark can generate its encoder outside the suite scope
case class SketchEv(k: Long, v: Long)

class SketchIntakeSpec extends SparkSpec {


  private def cells(df: org.apache.spark.sql.DataFrame) = {
    val spark2 = spark
    import spark2.implicits._
    df.select("j", "cell", "cnt").as[(Int, Long, Long)].collect().toSet
  }

  test("stream-built sketch equals the one-shot batch sketch, across drains and compaction") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val root = tmpDir("graft_sketch_")
    val store = new graft.io.SnapshotBucketedStore(s"$root/cms", numBuckets = 4)
    val input = MemoryStream[SketchEv]

    val batch1 = (1 to 300).map(i => SketchEv(i.toLong % 7, i.toLong))
    val batch2 = (1 to 200).map(i => SketchEv(i.toLong % 11, i.toLong))
    input.addData(batch1: _*)
    SketchIntake.drainTo(input.toDF(), store, "cms", "k", s"$root/ckpt")
    input.addData(batch2: _*)
    SketchIntake.drainTo(input.toDF(), store, "cms", "k", s"$root/ckpt")

    val streamed = cells(SketchIntake.readSketch(store, "cms").get)
    val oneShot = cells(Approx.cmsCells((batch1 ++ batch2).toDF(), "k"))
    assert(streamed == oneShot,
      "incremental generations must sum to the single-pass sketch exactly")

    // estimates from the streamed sketch match exact counts (keys 0..10
    // are few and far below the collision regime at width 512)
    val exact = (batch1 ++ batch2).groupBy(_.k).view.mapValues(_.size.toLong).toMap
    val est = Approx.cmsEstimate(
        SketchIntake.readSketch(store, "cms").get, exact.keySet.toSeq.toDF("k"))
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (k, ex) => assert(est(k) >= ex, s"undercount at $k") }

    // compaction folds the log to one generation without changing cells
    SketchIntake.compact(store, "cms")
    assert(cells(SketchIntake.readSketch(store, "cms").get) == oneShot)
  }
}

