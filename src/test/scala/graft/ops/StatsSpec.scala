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
}
