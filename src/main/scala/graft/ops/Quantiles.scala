package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles — the audited twin of the GK sketch
  * ([[Approx.percentiles]], q15): where the sketch answers "p99
  * within ε" in one sketch-sized shuffle, this returns the exact
  * inverse-ECDF value (the element at rank ⌈q·N⌉, SQL's
  * discrete/type-1 quantile) and is therefore DuckDB-oracleable —
  * the one quantile form a compliance report can replay bit-for-bit
  * in another engine.
  *
  * The idiomatic exact form is `ORDER BY value` + pick offsets — a
  * global sort whose final selection serializes through one task.
  * This rides [[Rank.globalRank]] instead: one RANGE exchange
  * (sampled boundaries, balanced partitions), per-partition counts,
  * rank assignment in internal-row terms — and the quantile pick is
  * a broadcast hash join of the (probability, rank) table against
  * the ranked frame, a map-side filter in effect. No SinglePartition
  * anywhere (plan-audited); N rides the rank's own partition-size
  * collect.
  */
object Quantiles {

  /** Exact quantiles of `valCol` at `probs` (each in (0, 1]):
    * output (p, rank, value) — value = the element at rank
    * max(1, ⌈p·N⌉) under the total order (valCol, tieCol). Duplicate
    * values make the VALUE at a rank unambiguous regardless of tie
    * order; `tieCol` makes the rank walk itself total (the
    * [[Rank.globalRank]] contract). */
  def exact(
      df: DataFrame,
      valCol: String,
      tieCol: String,
      probs: Seq[Double],
  ): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    val spark = df.sparkSession
    import spark.implicits._
    val (ranked, n) =
      Rank.globalRankWithCount(df.select(col(valCol), col(tieCol)),
        Seq(valCol, tieCol))
    // the same fixed IEEE expression the oracle runs: ceil of one
    // double product of exact small terms — identical cross-engine
    val picks = probs.map(p => (p, math.max(1L, math.ceil(p * n).toLong)))
      .toDF("p", "rank")
    ranked
      .join(broadcast(picks), Seq("rank"))
      .select(col("p"), col("rank"), col(valCol).as("value"))
  }
}
