package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Executed-plan evidence for the skew story SCALE.md §4 tells: a
  * deliberately skewed shuffle join must either be split by AQE's
  * skew-join handling (the preferred, zero-code path) or go through
  * the salted two-phase fallback ([[Skew]]) — never a straggler
  * partition quietly owning 80% of the work. */
class AqeSkewSpec extends SparkSpec {

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // ~80% of the fact lands on one hot key — the shape a hot customer,
  // hot domain, or boilerplate document produces at 100 TB
  private def skewedFact = spark.range(0, 120000).select(
    when(col("id") % 10 < 8, lit(7L)).otherwise(col("id") % 1000).as("k"),
    (col("id") * 31 % 997).as("payload"))
  private def dim = spark.range(0, 1000).select(
    col("id").as("k"), (col("id") * 7).as("dval"))

  test("AQE splits the skewed partition of a sort-merge join (skew=true, correct result)") {
    withConf(
      // force the shuffle join (the dim would otherwise broadcast —
      // which is ALSO a fine answer to skew, but not the one under test)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // test-scale thresholds: the defaults (256m threshold) never
      // trigger on a compressed test shuffle of a few hundred KB
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32kb",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16kb",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    ) {
      // NOTE: the consumer must not require the join's output
      // partitioning (e.g. a groupBy on the join key) — AQE skips the
      // skew split when it would force an extra shuffle downstream
      // (forceOptimizeSkewedJoin=false), which is the right trade and
      // worth pinning here as documentation
      val df = skewedFact.join(dim, "k")
        .select(sum(col("payload") + col("dval")).as("s"))
      df.collect()
      // the FINAL adaptive plan (post-execution, same QueryExecution)
      // must show the skew split on the join
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the join skew-handled:\n${p.take(1200)}")
      // every fact row matches exactly one dim row (hot key included)
      assert(skewedFact.join(dim, "k").count() == 120000)
      // and when the consumer DOES need the join's partitioning, AQE
      // correctly declines to split rather than double-shuffle
      val kept = skewedFact.join(dim, "k").groupBy("k").agg(sum("payload").as("s"))
      kept.collect()
      assert(!kept.queryExecution.executedPlan.toString.contains("skew=true"))
    }
  }

  test("salted fallback spreads the same hot key across all salt buckets") {
    // for engines/paths where AQE is unavailable (e.g. a non-shuffle
    // consumer needs the spread), the explicit two-phase salt must
    // agree with the plain aggregation on the same skewed input
    val agg = Skew.saltedAgg(skewedFact, Seq("k"), col("payload"),
      Map("sum_payload" -> (col("payload"), "sum")), salts = 8)
    val plain = skewedFact.groupBy("k").agg(sum("payload").as("sum_payload"))
    val a = agg.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = plain.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }
}
