package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("observed counters equal a direct aggregation, computed in the producing job") {
    val df = Seq(
      (1L, Some(10.0), "a"), (2L, None, "b"), (3L, Some(-3.0), "c"),
      (4L, Some(7.0), "a"), (5L, None, "a"),
    ).toDF("id", "v", "k")
    val observed = Observe.withQualityMetrics(df, "quality",
      nullCols = Seq("v"),
      extras = Map("neg_v" ->
        sum(when(col("v") < 0, 1L).otherwise(0L))))
    // before any action the metric row is a zero/null placeholder —
    // observation is an execution side effect
    assert(Observe.metrics(observed)("quality")("n_rows") == 0L)
    // metrics belong to the EXECUTED frame — a derived frame has its
    // own QueryExecution (test 2 covers observing through a filter)
    val out = observed.collect()
    assert(out.length == 5)
    val m = Observe.metrics(observed)("quality")
    assert(m("n_rows") == 5L, m.toString)
    assert(m("null_v") == 2L, m.toString)
    assert(m("neg_v") == 1L, m.toString)
    // the metrics ride the plan, not a second scan
    val plan = observed.queryExecution.executedPlan.toString
    assert(plan.contains("CollectMetrics"), plan.take(400))
  }

  test("metrics observe the stream position they are attached at") {
    // attached BEFORE a filter: counts the pre-filter rows — the
    // contract a validation pipeline relies on (observe inputs, emit
    // survivors)
    val df = spark.range(100).toDF("id")
    val observed = Observe.withQualityMetrics(df, "pre")
      .filter(col("id") % 2 === 0)
    assert(observed.count() == 50)
    observed.collect()
    assert(Observe.metrics(observed)("pre")("n_rows") == 100L)
  }

  test("real table: null and contract counters on lineitem") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val observed = Observe.withQualityMetrics(li, "li",
      nullCols = Seq("l_quantity"),
      extras = Map("nonpos_qty" ->
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L))))
    observed.collect()
    val m = Observe.metrics(observed)("li")
    val direct = li.agg(count(lit(1)),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)),
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)))
      .head()
    assert(m("n_rows") == direct.getLong(0))
    assert(m("null_l_quantity") == direct.getLong(1))
    assert(m("nonpos_qty") == direct.getLong(2))
  }
}
