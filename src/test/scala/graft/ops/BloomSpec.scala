package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  // fact: 40k rows over 4000 keys; dim: 40 keys → 99% of fact rows are
  // non-matching and should never reach the join shuffle
  private def fact = spark.range(40000L)
    .select(($"id" % 4000).as("k"), ($"id" * 7).as("payload"))
  private def dim = spark.range(40L)
    .select(($"id" * 100).as("k"), concat(lit("d"), $"id").as("attr"))

  test("pruned join returns exactly the plain join's rows (no false negatives)") {
    val plain = fact.join(dim, Seq("k")).orderBy("k", "payload")
      .as[(Long, Long, String)].collect().toSeq
    val pruned = Bloom.prunedEquiJoin(fact, dim, "k").orderBy("k", "payload")
      .as[(Long, Long, String)].collect().toSeq
    assert(pruned == plain)
    assert(plain.nonEmpty)
  }

  test("the Bloom pre-filter drops the vast majority of non-matching fact rows") {
    val bf = Bloom.buildKeyFilter(dim, "k", expectedItems = 1000L)
    val surviving = fact.filter(Bloom.mightContain(bf, $"k")).count()
    val matching = fact.join(dim.select("k"), Seq("k"), "left_semi").count()
    assert(matching == 400L) // 40 dim keys x 10 fact rows each
    // at 3% fpp the survivors are the true matches plus a thin band of
    // false positives — orders of magnitude below the 40k unpruned rows
    assert(surviving >= matching, "false negatives are impossible")
    assert(surviving <= matching + (0.10 * 40000).toLong,
      s"pruning too weak: $surviving of 40000 rows survived for $matching matches")
  }

  test("an empty dim prunes everything instead of breaking analysis") {
    val emptyDim = dim.filter($"k" < 0)
    val out = Bloom.prunedEquiJoin(fact, emptyDim, "k")
    assert(out.count() == 0)
  }

  test("the probe is a real engine predicate usable in any plan position") {
    val bf = Bloom.buildKeyFilter(dim, "k", expectedItems = 1000L)
    // the filter composes with other predicates and survives codegen
    val n = fact.filter(Bloom.mightContain(bf, $"k") && $"payload" % 2 === 0).count()
    assert(n > 0 && n < 40000)
    // and the plan carries the bloom probe, not an opaque UDF
    val plan = fact.filter(Bloom.mightContain(bf, $"k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected bloom probe in plan:\n$plan")
  }
}
