package graft.ops

import graft.SparkSpec

class AnomalySpec extends SparkSpec {

  import spark.implicits._

  test("zScoreOutliers ranks the planted outlier first with the exact-moment z") {
    // group g: values 1, 2, 3 and a wild 100
    val df = Seq(
      (1L, "g", 1.0), (2L, "g", 2.0), (3L, "g", 3.0), (4L, "g", 100.0),
      (5L, "h", 5.0), (6L, "h", 5.0),
    ).toDF("event_id", "event_type", "value")
    val out = Anomaly.zScoreOutliers(df, "event_id", "event_type", "value", k = 10)
      .as[(Long, String, Double, Double)].collect()
    assert(out.head._1 == 4L, "the planted outlier ranks first")
    // z replayed with the same expression shape
    val n = 4.0; val s = 106.0; val sq = 1.0 + 4.0 + 9.0 + 10000.0
    val mean = s / n
    val expected = (100.0 - mean) / math.sqrt(sq / n - mean * mean)
    assert(out.head._4 == expected)
    // the zero-variance group h is excluded entirely: every member
    // equals its mean, and ANSI division by zero must never be reached
    assert(!out.exists(_._2 == "h"))
    assert(out.length == 4, "only group g rows can score")
  }

  test("zScoreOutliers respects k and the |z| desc, id asc order") {
    val df = (1L to 20L).map(i => (i, "g", i.toDouble)).toDF("event_id", "event_type", "value")
    val out = Anomaly.zScoreOutliers(df, "event_id", "event_type", "value", k = 4)
      .as[(Long, String, Double, Double)].collect()
    assert(out.length == 4)
    // extremes of a uniform ramp have the largest |z|: 1, 20 first
    assert(out.map(_._1).toSet == Set(1L, 20L, 2L, 19L))
    val zs = out.map(r => math.abs(r._4))
    assert(zs.sameElements(zs.sorted.reverse), "sorted by |z| desc")
  }
}
