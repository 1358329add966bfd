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

  /** Per-GROUP exact quantiles — the form mix design actually asks
    * for ("p99 doc length per source"): the same inverse-ECDF pick,
    * ranked by a window PARTITIONED on the group (bounded per-group
    * state, never the global-window cliff [[Rank.globalRank]] exists
    * to avoid — here the partitioning makes the window itself the
    * scale-safe shape). Group counts are a tiny aggregate; the
    * (group, p, rank) pick table broadcasts. Output:
    * (groupCol, p, rank, value). */
  def exactPerGroup(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      tieCol: String,
      probs: Seq[Double],
  ): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valCol), col(tieCol))
    val ranked = df
      .select(col(groupCol), col(valCol), col(tieCol))
      .withColumn("graft_rnk_", row_number().over(w))
    val picks = df
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("graft_n_"))
      .crossJoin(probs.toDF("p"))
      // ceil of one double product of exact terms — the identical
      // fixed IEEE expression the oracle evaluates
      .select(col(groupCol), col("p"),
        greatest(lit(1L), ceil(col("graft_n_") * col("p"))).as("graft_rnk_"))
    ranked
      .join(broadcast(picks), Seq(groupCol, "graft_rnk_"))
      .select(col(groupCol), col("p"), col("graft_rnk_").as("rank"),
        col(valCol).as("value"))
  }
}
