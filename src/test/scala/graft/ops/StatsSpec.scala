package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("pearsonByGroup: exact r on hand-computed fixtures") {
    // g=a: y = 2x exactly → r = 1; g=b: y = -x → r = -1
    val df = (Seq(("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0)) ++
      Seq(("b", 1.0, -1.0), ("b", 2.0, -2.0), ("b", 3.0, -3.0)))
      .toDF("g", "x", "y")
    val out = Stats.pearsonByGroup(df, "g", "x", "y")
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) === Seq(("a", 3L), ("b", 3L)))
    // correct to IEEE rounding of the fixed chain (the exactness
    // contract is CROSS-ENGINE bit-equality — the q85 oracle — not
    // infinite precision)
    assert(math.abs(out(0)._3 - 1.0) < 1e-12 && math.abs(out(1)._3 + 1.0) < 1e-12)
  }

  test("pearsonByGroup drops null pairs and zero-variance groups") {
    val df = Seq(
      ("a", Some(1.0), Some(1.0)), ("a", Some(2.0), Some(3.0)),
      ("a", None, Some(9.0)), ("a", Some(9.0), None), // null pairs drop
      ("c", Some(5.0), Some(1.0)), ("c", Some(5.0), Some(2.0)), // x constant
    ).toDF("g", "x", "y")
    val out = Stats.pearsonByGroup(df, "g", "x", "y")
      .as[(String, Long, Double)].collect().toSeq
    // group c filtered (zero x-variance); a counts only complete pairs
    assert(out === Seq(("a", 2L, 1.0)))
  }

  test("fitLineByGroup recovers an exact line and tolerates constant y") {
    // y = 3x + 2 exactly; with integral inputs the moment chain is exact
    val df = (1 to 5).map(i => ("a", i.toDouble, (3 * i + 2).toDouble))
      .toDF("g", "x", "y")
    val out = Stats.fitLineByGroup(df, "g", "x", "y")
      .as[(String, Long, Double, Double)].head()
    assert(out._2 === 5L)
    assert(math.abs(out._3 - 3.0) < 1e-12 && math.abs(out._4 - 2.0) < 1e-12)
    // constant y is a valid fit (slope 0); constant x is not
    val flat = Seq(("b", 1.0, 7.0), ("b", 2.0, 7.0)).toDF("g", "x", "y")
    val f = Stats.fitLineByGroup(flat, "g", "x", "y")
      .as[(String, Long, Double, Double)].head()
    assert(f._3 === 0.0 && f._4 === 7.0)
    val const = Seq(("c", 5.0, 1.0), ("c", 5.0, 2.0)).toDF("g", "x", "y")
    assert(Stats.fitLineByGroup(const, "g", "x", "y").count() === 0L)
  }

  test("histogram clamps out-of-range values and emits empty bins as zeros") {
    // the NaN row must DROP (under ANSI the long cast would throw)
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 55.0, 99.9, 100.0, 250.0, Double.NaN).toDF("v")
    val out = Stats.histogram(df, "v", lo = 0.0, hi = 100.0, bins = 10)
      .orderBy("bin").as[(Long, Double, Long)].collect().toSeq
    assert(out.size === 10) // every bin present, even empty ones
    assert(out.map(_._1) === (0L until 10L))
    val cnt = out.map(r => r._1 -> r._3).toMap
    assert(cnt(0L) === 3L) // -5 clamps in, 0.0 and 9.9 belong
    assert(cnt(1L) === 1L) // 10.0
    assert(cnt(5L) === 1L) // 55
    assert(cnt(9L) === 3L) // 99.9 + clamped 100.0 and 250.0
    assert(out.map(_._3).sum === 8L)
    assert(out(3)._2 === 30.0) // lo_edge arithmetic
  }

  test("r is partitioning-invariant bit-for-bit (exact moments)") {
    val df = (1 to 1000)
      .map(i => ("t", (i % 83).toDouble, ((i * 7) % 101).toDouble))
      .toDF("g", "x", "y")
    val a = Stats.pearsonByGroup(df.coalesce(1), "g", "x", "y")
      .as[(String, Long, Double)].head()
    val b = Stats.pearsonByGroup(df.repartition(13), "g", "x", "y")
      .as[(String, Long, Double)].head()
    // not approximately — EXACTLY: decimal moments are order-free and
    // the IEEE chain is fixed
    assert(a === b)
  }

  test("winsorizeByGroup: hand-checked bounds, clip fates, per-group independence") {
    // group a: 1..10 → pLo=.25 picks rank 3 (value 3), pHi=.85 rank 9
    val df = ((1L to 10L).map(i => (i, "a", i.toDouble)) ++
      Seq((11L, "b", 100.0), (12L, "b", 200.0))).toDF("id", "g", "v")
    val out = Stats.winsorizeByGroup(df, "id", "g", "v", pLo = 0.25, pHi = 0.85)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toMap
    assert(out.size == 12, "every non-null row surfaces")
    assert(out(1L) == ((3.0, 9.0, 3.0, true)), out(1L).toString)
    assert(out(2L) == ((3.0, 9.0, 3.0, true)))
    assert(out(5L) == ((3.0, 9.0, 5.0, false)))
    assert(out(10L) == ((3.0, 9.0, 9.0, true)))
    // group b's bounds come from its OWN two values, not group a's
    assert(out(11L)._1 == 100.0 && out(12L)._2 == 200.0, out(11L).toString)
    assert(!out(11L)._4 && !out(12L)._4)
  }

  test("winsorizeByGroup: clipped values are always members of the input value set") {
    val df = (1L to 200L).map(i => (i, s"g${i % 3}", (i * 37 % 101).toDouble))
      .toDF("id", "g", "v")
    val vals = df.select("v").as[Double].collect().toSet
    val out = Stats.winsorizeByGroup(df, "id", "g", "v")
    assert(out.select("clipped").as[Double].collect().forall(vals.contains))
    // deterministic under repartition
    val a = out.orderBy("id").collect().toSeq
    val b = Stats.winsorizeByGroup(df.repartition(7), "id", "g", "v")
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("winsorizeByGroup: guards and null drop") {
    val df = Seq((1L, "a", Some(1.0)), (2L, "a", None), (3L, "a", Some(3.0)))
      .toDF("id", "g", "v")
    assert(Stats.winsorizeByGroup(df, "id", "g", "v", 0.5, 1.0).count() == 2)
    intercept[IllegalArgumentException] {
      Stats.winsorizeByGroup(df, "id", "g", "v", 0.9, 0.1)
    }
  }
}
