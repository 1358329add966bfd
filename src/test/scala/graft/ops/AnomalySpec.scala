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

  test("madOutliers: robust to the outlier it must find, where z-score masks it") {
    // 13 tight values + two wild ones: the wild pair drags mean AND
    // std enough that z(40) ≈ 2.3 slips under a k=2.5 z-test; the
    // median/MAD pair doesn't move and flags both at 3.5·MAD
    val vals = (1L to 13L).map(i => (i, "g", 10.0 + (i % 3))) ++
      Seq((14L, "g", 40.0), (15L, "g", 45.0))
    val out = Anomaly.madOutliers(vals.toDF("id", "g", "v"), "id", "g", "v")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), r.getDouble(4), r.getBoolean(6))).toMap
    // med = 11 (rank 8 of 15), mad = 1: dev > 3.5 flags exactly 14, 15
    assert(out.values.map(_._1).toSet == Set(11.0))
    assert(out.values.map(_._2).toSet == Set(1.0))
    assert(out.filter(_._2._3).keySet == Set(14L, 15L), out.toString)
  }

  test("madOutliers: mad=0 group flags every deviator; uniform group flags none") {
    val vals = Seq((1L, "a", 5.0), (2L, "a", 5.0), (3L, "a", 5.0), (4L, "a", 9.0),
      (5L, "b", 7.0), (6L, "b", 7.0))
    val out = Anomaly.madOutliers(vals.toDF("id", "g", "v"), "id", "g", "v")
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(out == Map(1L -> false, 2L -> false, 3L -> false, 4L -> true,
      5L -> false, 6L -> false), out.toString)
  }

  test("madOutliers: every non-null row surfaces; threshold is rational and honored") {
    val vals = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "a", 4.0), (5L, "a", 100.0))
    val df = vals.toDF("id", "g", "v")
    // med = 3 (rank 3), devs = 2,1,0,1,97 → mad = 1 (rank 3 of devs)
    val strict = Anomaly.madOutliers(df, "id", "g", "v", 1L, 1L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(strict.size == 5)
    // k=1: dev > 1 → ids 1 (dev 2) and 5 (dev 97)
    assert(strict.filter(_._2).keySet == Set(1L, 5L), strict.toString)
    val loose = Anomaly.madOutliers(df, "id", "g", "v", 7L, 2L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    // k=3.5: dev > 3.5 → only the planted 100
    assert(loose.filter(_._2).keySet == Set(5L), loose.toString)
  }
}
