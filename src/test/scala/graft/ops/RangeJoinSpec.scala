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

  test("intervalOverlap: exact half-open semantics, one row per pair however many bins shared") {
    val a = Seq((1L, 0L, 100L), (2L, 50L, 60L), (3L, 200L, 201L))
      .toDF("aid", "as", "ae")
    val b = Seq(
      (10L, 90L, 150L),  // overlaps 1 (shares bins with it across the 90..100 run)
      (20L, 100L, 110L), // TOUCHES 1 at 100 — half-open, no overlap
      (30L, 55L, 56L),   // inside 2 (and 1): nested intervals
      (40L, 300L, 400L), // disjoint
      (50L, 150L, 140L), // empty interval (end < start): drops
    ).toDF("bid", "bs", "be")
    val got = RangeJoin.intervalOverlap(a, "as", "ae", b, "bs", "be", binWidth = 7L)
      .select($"aid", $"bid").as[(Long, Long)].collect().toList
    // exactly-once per pair — a List, not a Set, so duplicates fail
    assert(got.sorted === List((1L, 10L), (1L, 30L), (2L, 30L)))
  }

  test("intervalOverlap matches a brute-force inequality join on random-ish data") {
    val a = (0 until 200)
      .map(i => (i.toLong, (i * 13 % 211).toLong, (i * 13 % 211) + (i % 23) + 1L))
      .toDF("aid", "as", "ae")
    val b = (0 until 60)
      .map(i => (i.toLong, (i * 29 % 190).toLong, (i * 29 % 190) + (i % 31) + 1L))
      .toDF("bid", "bs", "be")
    val fast = RangeJoin.intervalOverlap(a, "as", "ae", b, "bs", "be", binWidth = 8L)
      .select($"aid", $"bid").as[(Long, Long)].collect()
    val brute = a.crossJoin(b)
      .filter($"as" < $"be" && $"bs" < $"ae")
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    assert(fast.length === brute.size, "each pair must emit exactly once")
    assert(fast.toSet === brute,
      s"diff: ${(fast.toSet diff brute) ++ (brute diff fast.toSet)}")
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
