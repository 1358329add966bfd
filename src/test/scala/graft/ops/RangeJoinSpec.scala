package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval: containment exact, end exclusive, bin-straddling ok") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 17L), (4L, 99L))
      .toDF("pid", "p")
    // interval [5,18) straddles bins of width 7 (bins 0,1,2)
    val intervals = Seq((100L, 5L, 18L), (200L, 90L, 95L))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", binWidth = 7L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (2L, 100L), (3L, 100L)))
    // p=18 would be excluded (end exclusive); p=99 outside both
  }

  test("matches a brute-force inequality join on random-ish data") {
    val points = (0 until 300).map(i => (i.toLong, (i * 13 % 211).toLong)).toDF("pid", "p")
    val intervals = (0 until 40).map(i => (i.toLong, (i * 17 % 190).toLong, (i * 17 % 190) + 9L))
      .toDF("iid", "s", "e")
    val fast = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", binWidth = 8L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val brute = points.crossJoin(intervals)
      .filter($"p" >= $"s" && $"p" < $"e")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(fast == brute, s"diff: ${(fast diff brute) ++ (brute diff fast)}")
  }

  test("plan is a hash equi-join on the bin, not a nested loop") {
    val points = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("pid", "p")
    val intervals = (0 until 10).map(i => (i.toLong, i * 10L, i * 10L + 10L)).toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(600))
  }
}
