package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("exact quantiles are the inverse-ECDF elements, hand-checked") {
    // values 10, 20, ..., 100 (N = 10): p=0.5 → rank 5 → 50;
    // p=0.91 → ceil(9.1) = 10 → 100; p=0.05 → rank max(1, 1) → 10
    val df = (1 to 10).map(i => (i * 10, i.toLong)).toDF("v", "id")
    val out = Quantiles.exact(df, "v", "id", Seq(0.05, 0.5, 0.91, 1.0))
      .orderBy("p").select("p", "rank", "value")
      .as[(Double, Long, Int)].collect().toSeq
    assert(out === Seq((0.05, 1L, 10), (0.5, 5L, 50), (0.91, 10L, 100), (1.0, 10L, 100)))
  }

  test("duplicate values keep the picked value unambiguous and runs match percentile math") {
    val df = (Seq.fill(50)(1) ++ Seq.fill(30)(2) ++ Seq.fill(20)(3))
      .zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val out = Quantiles.exact(df, "v", "id", Seq(0.5, 0.8, 0.81))
      .orderBy("p").select("p", "value").as[(Double, Int)].collect().toSeq
    // CDF: 1 ≤ 50%, 2 ≤ 80%, 3 ≤ 100%
    assert(out === Seq((0.5, 1), (0.8, 2), (0.81, 3)))
  }

  test("per-group quantiles rank within each group independently") {
    // group a: 10,20,...,100 → p50 = 50; group b: 1,2,3 → p50 = 2
    val df = ((1 to 10).map(i => ("a", i * 10, i.toLong)) ++
      (1 to 3).map(i => ("b", i, (100 + i).toLong))).toDF("g", "v", "id")
    val out = Quantiles.exactPerGroup(df, "g", "v", "id", Seq(0.5, 1.0))
      .orderBy("g", "p").select("g", "p", "value")
      .as[(String, Double, Int)].collect().toSeq
    assert(out === Seq(("a", 0.5, 50), ("a", 1.0, 100), ("b", 0.5, 2), ("b", 1.0, 3)))
  }

  test("weighted quantiles answer in mass, not rows") {
    // 9 docs of length 10 (90 tokens) + 1 doc of length 910: total
    // 1000 tokens. Row-p50 is 10; but HALF THE MASS sits in the long
    // doc — weighted p50 = 910, while p <= 0.09 still answers 10.
    val df = ((1 to 9).map(i => (10L, i.toLong)) :+ (910L, 10L))
      .toDF("len", "id")
    val out = Quantiles.weighted(df, "len", "id", "len", Seq(0.09, 0.5, 1.0))
      .orderBy("p").as[(Double, Long, Long)].collect().toSeq
    assert(out === Seq((0.09, 10L, 90L), (0.5, 910L, 1000L), (1.0, 910L, 1000L)))
  }

  test("weighted quantiles drop non-positive weights and empty input yields no rows") {
    val df = Seq((5L, 1L, 0L), (7L, 2L, -3L)).toDF("v", "id", "w")
    assert(Quantiles.weighted(df, "v", "id", "w", Seq(0.5)).count() === 0L)
    val mixed = Seq((5L, 1L, 0L), (7L, 2L, 4L)).toDF("v", "id", "w")
    val out = Quantiles.weighted(mixed, "v", "id", "w", Seq(0.5))
      .as[(Double, Long, Long)].head()
    assert(out === ((0.5, 7L, 4L))) // the zero-weight row carries no mass
  }

  test("fractional weights in (0,1) truncate to zero mass and are dropped, not kept") {
    // a 0.4 weight passes `weight > 0` but truncates to 0 on the long
    // cast — if it survived, its zero mass would tie cum values and
    // break the unique-pick invariant; the cast-then-filter order
    // must drop it entirely (per-group form exercised identically)
    val df = Seq((1L, 1L, 0.4), (2L, 2L, 3.0), (3L, 3L, 1.0))
      .toDF("v", "id", "w")
    val out = Quantiles.weighted(df, "v", "id", "w", Seq(0.5, 1.0))
      .orderBy("p").as[(Double, Long, Long)].collect().toSeq
    // mass: v=2 carries 3, v=3 carries 1 (total 4); v=1 contributes none
    assert(out === Seq((0.5, 2L, 3L), (1.0, 3L, 4L)))
    val g = Quantiles.weightedPerGroup(
        df.withColumn("g", lit("x")), "g", "v", "id", "w", Seq(1.0))
      .as[(String, Double, Long, Long)].collect().toSeq
    assert(g === Seq(("x", 1.0, 3L, 4L)))
  }

  test("weightedPerGroup answers per group independently, windows stay partitioned") {
    // group a = the q91 fixture (half the mass in one long doc);
    // group b = uniform
    val df = (((1 to 9).map(i => ("a", 10L, i.toLong)) :+ (("a", 910L, 10L))) ++
      (1 to 4).map(i => ("b", 50L, (100 + i).toLong))).toDF("g", "len", "id")
    val q = Quantiles.weightedPerGroup(df, "g", "len", "id", "len", Seq(0.09, 0.5))
    val out = q.orderBy("g", "p")
      .as[(String, Double, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("a", 0.09, 10L, 90L), ("a", 0.5, 910L, 1000L),
      ("b", 0.09, 50L, 50L), ("b", 0.5, 50L, 100L)))
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      s"the cumulative window must stay group-partitioned:\n${p.take(400)}")
  }

  test("the quantile plan has no global sort and no single partition") {
    val df = (1 to 1000).map(i => (i % 97, i.toLong)).toDF("v", "id")
    val q = Quantiles.exact(df, "v", "id", Seq(0.5, 0.99))
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      s"quantile pick must not serialize through one task:\n${p.take(500)}")
    assert(p.contains("BroadcastHashJoin"),
      "the (p, rank) pick table should broadcast")
  }

  test("histogram-sketch estimates stay within one bin width of the exact quantile") {
    // skewed data so bins carry uneven mass
    val df = (1 to 2000).map(i => (math.pow(i.toDouble, 1.3), i.toLong))
      .toDF("v", "id")
    val probs = Seq(0.1, 0.5, 0.9, 0.99)
    val w = (20000.0 - 0.0) / 40
    val est = Quantiles.fromHistogram(df, "v", 0.0, 20000.0, 40, probs)
      .select("p", "est", "err_bound").as[(Double, Double, Double)]
      .collect().map(r => r._1 -> r._2).toMap
    val exact = Quantiles.exact(df, "v", "id", probs)
      .select("p", "value").as[(Double, Double)].collect().toMap
    probs.foreach { p =>
      assert(math.abs(est(p) - exact(p)) <= w,
        s"p=$p est=${est(p)} exact=${exact(p)} bound=$w")
    }
  }

  test("histogram-sketch hand-check: interpolation, clamping, empty and null input") {
    // 10 values 5,15,...,95 in [0,100) with 10 bins: one value per
    // bin, so p=0.5 → target 5 → bin 4, est = 40 + 10·(5−4)/1 = 50
    val df = (0 until 10).map(i => (i * 10 + 5.0, i.toLong)).toDF("v", "id")
    val out = Quantiles.fromHistogram(df, "v", 0.0, 100.0, 10, Seq(0.5))
      .select("p", "bin", "est").as[(Double, Long, Double)].collect()
    assert(out.toSeq == Seq((0.5, 4L, 50.0)))

    // out-of-range mass clamps into the edge bins rather than vanishing
    val clamp = Seq(-50.0, -1.0, 5.0, 500.0).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val c = Quantiles.fromHistogram(clamp, "v", 0.0, 10.0, 10, Seq(0.25, 1.0))
      .select("p", "bin").as[(Double, Long)].collect().toMap
    assert(c(0.25) == 0L && c(1.0) == 9L)

    // nulls/NaN drop; empty input yields no rows (no rank-1 element)
    val empty = Seq.empty[(Double, Long)].toDF("v", "id")
    assert(Quantiles.fromHistogram(empty, "v", 0.0, 1.0, 4, Seq(0.5)).isEmpty)
    val nn = Seq((Option.empty[Double], 1L), (Some(Double.NaN), 2L),
      (Some(0.5), 3L)).toDF("v", "id")
    val got = Quantiles.fromHistogram(nn, "v", 0.0, 1.0, 4, Seq(1.0))
      .select("bin").as[Long].collect()
    assert(got.toSeq == Seq(2L), "only the 0.5 value (bin 2) survives")
  }

  test("per-group sketch answers each group independently within the bound") {
    // group a: uniform 0..99; group b: concentrated near 500
    val df = ((1 to 100).map(i => ("a", i.toDouble - 0.5, i.toLong)) ++
      (1 to 50).map(i => ("b", 500.0 + i % 5, 1000L + i)))
      .toDF("g", "v", "id")
    val w = 1000.0 / 50
    val est = Quantiles.fromHistogramPerGroup(df, "g", "v", 0.0, 1000.0, 50,
        Seq(0.5, 0.9))
      .select("g", "p", "est").as[(String, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val exact = Quantiles.exactPerGroup(df, "g", "v", "id", Seq(0.5, 0.9))
      .select("g", "p", "value").as[(String, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    for (g <- Seq("a", "b"); p <- Seq(0.5, 0.9)) {
      assert(math.abs(est((g, p)) - exact((g, p))) <= w,
        s"($g, $p): est=${est((g, p))} exact=${exact((g, p))}")
    }
    // group b's answers must reflect only its own mass
    assert(est(("b", 0.5)) >= 500.0 - w && est(("b", 0.5)) <= 505.0 + w)
  }

  test("the sketch touches the data once: one scan, everything after is bin-sized") {
    val df = (1 to 500).map(i => (i.toDouble, i.toLong)).toDF("v", "id")
    val q = Quantiles.fromHistogram(df, "v", 0.0, 500.0, 10, Seq(0.5, 0.9))
    q.collect()
    // count in the final-plan section only — after collect() the
    // adaptive plan string appends a duplicate "== Initial Plan =="
    val p = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the lineage cut means the executed plan reads the materialized
    // histogram (ExistingRDD), not the source: the only LocalTableScan
    // left is the probs literal — the 500-row source never reappears.
    // (A SinglePartition exchange IS present: the totals reduce over
    // the ≤bins-row checkpoint — bounded by `bins` by construction,
    // not data-sized, which is the property that matters at scale.)
    assert(p.linesIterator.count(_.contains("Scan ExistingRDD")) >= 2,
      "histogram should be read from the checkpoint, not recomputed")
    assert(p.linesIterator.count(_.contains("LocalTableScan")) == 1,
      s"only the probs literal may scan locally:\n${p.take(600)}")
  }
}
