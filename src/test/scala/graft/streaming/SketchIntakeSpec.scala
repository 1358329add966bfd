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

  test("streaming heavy hitters: candidates + sketch across batches name the true top keys") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val root = tmpDir("graft_sketch_hh_")
    val store = new graft.io.SnapshotBucketedStore(s"$root/cms", numBuckets = 4)
    val input = MemoryStream[SketchEv]

    // zipf head split across two drains: key 1 ~600 rows, key 2 ~300, ...
    val rows = (1 to 60).flatMap(k => Seq.fill(600 / k)(k.toLong))
      .zipWithIndex.map { case (k, i) => SketchEv(k, i.toLong) }
    val (half1, half2) = rows.splitAt(rows.length / 2)
    input.addData(half1: _*)
    SketchIntake.drainWithCandidatesTo(input.toDF(), store, "cms", "k", "v", s"$root/ckpt")
    input.addData(half2: _*)
    SketchIntake.drainWithCandidatesTo(input.toDF(), store, "cms", "k", "v", s"$root/ckpt")

    val hh = SketchIntake.topK(store, "cms", k = 3).get
      .as[(Long, Long)].collect()
    assert(hh.map(_._1).toSet == Set(1L, 2L, 3L), s"got ${hh.toSeq}")
    // estimates cover the true totals (never undercount) even though
    // each key's rows were split across two independently-built
    // generations
    val exact = rows.groupBy(_.k).view.mapValues(_.size.toLong).toMap
    hh.foreach { case (k, est) => assert(est >= exact(k), s"undercount at $k") }
  }

  test("stream-maintained histogram answers quantiles bit-identical to the one-shot batch") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val root = tmpDir("graft_hist_")
    val store = new graft.io.SnapshotBucketedStore(s"$root/h", numBuckets = 4)
    val input = MemoryStream[SketchEv]
    val (lo, hi, bins) = (0.0, 1000.0, 25)
    val probs = Seq(0.5, 0.9, 0.99)

    // skewed values split across two drains; v is the measure here
    val rows = (1 to 900).map(i => SketchEv(i.toLong, (i * i % 997).toLong))
    val (half1, half2) = rows.splitAt(400)
    input.addData(half1: _*)
    SketchIntake.drainHistogramTo(input.toDF(), store, "h", "v", s"$root/ckpt",
      lo, hi, bins)
    input.addData(half2: _*)
    SketchIntake.drainHistogramTo(input.toDF(), store, "h", "v", s"$root/ckpt",
      lo, hi, bins)

    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("p", "bin", "est", "err_bound")
        .as[(Double, Long, Double, Double)].collect().sortBy(_._1).toSeq

    val streamed = rowsOf(
      SketchIntake.readQuantiles(store, "h", lo, hi, bins, probs).get)
    val oneShot = rowsOf(
      graft.ops.Quantiles.fromHistogram(rows.toDF(), "v", lo, hi, bins, probs))
    // EXACT integer cells merge losslessly → the maintained sketch is
    // not approximately but BIT-identically the batch answer
    assert(streamed == oneShot, s"$streamed vs $oneShot")

    // compaction folds generations without changing any answer
    SketchIntake.compactHistogram(store, "h")
    assert(rowsOf(
      SketchIntake.readQuantiles(store, "h", lo, hi, bins, probs).get) == oneShot)

    // exactly-once: a crash-replayed epoch (stale batch id) is a no-op
    val before = store.read("h").get.count()
    assert(!store.appendIfNew("h",
      Seq((0L, 99L)).toDF("bin", "cnt"), batchId = 0L))
    assert(store.read("h").get.count() == before)
  }

  test("grouped streaming histogram answers per-feed quantiles bit-identical to batch") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val root = tmpDir("graft_ghist_")
    val store = new graft.io.SnapshotBucketedStore(s"$root/h", numBuckets = 4)
    val input = MemoryStream[SketchEv]
    val (lo, hi, bins) = (0.0, 100.0, 10)
    val probs = Seq(0.5, 0.9)

    // k (mod 3) is the feed; distributions differ per feed
    val rows = (1 to 600).map(i => SketchEv(i.toLong % 3, (i * 13 % 97).toLong))
    val (h1, h2) = rows.splitAt(250)
    input.addData(h1: _*)
    SketchIntake.drainGroupHistogramTo(input.toDF(), store, "h", "k", "v",
      s"$root/ckpt", lo, hi, bins)
    input.addData(h2: _*)
    SketchIntake.drainGroupHistogramTo(input.toDF(), store, "h", "k", "v",
      s"$root/ckpt", lo, hi, bins)

    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "p", "bin", "est")
        .as[(Long, Double, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val streamed = rowsOf(
      SketchIntake.readGroupQuantiles(store, "h", "k", lo, hi, bins, probs).get)
    val oneShot = rowsOf(
      graft.ops.Quantiles.fromHistogramPerGroup(rows.toDF(), "k", "v",
        lo, hi, bins, probs))
    assert(streamed == oneShot, s"$streamed vs $oneShot")
    assert(streamed.map(_._1).distinct.size == 3, "every feed answered")

    SketchIntake.compactGroupHistogram(store, "h", "k")
    assert(rowsOf(
      SketchIntake.readGroupQuantiles(store, "h", "k", lo, hi, bins, probs).get)
      == oneShot)
  }
}

