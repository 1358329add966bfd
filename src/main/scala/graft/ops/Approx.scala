package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregation rollups — the 100 TB shapes for distinct
  * counts and percentiles.
  *
  * Exact `countDistinct` shuffles every distinct value to a single
  * reducer per group; exact percentiles need a full sort. The approx
  * forms keep a constant-size sketch per group (HyperLogLog++ /
  * Greenwald-Khanna) that merges associatively, so partial aggregation
  * stays map-side and the shuffle carries sketches, not values — the
  * only form that survives a 1000-executor scan of a 100 TB table.
  *
  * Not DuckDB-oracle-checkable (sketch implementations differ across
  * engines by design); correctness is bounded-error vs exact on small
  * data in ApproxSpec.
  */
object Approx {

  /** HyperLogLog++ distinct count, default 5% relative standard dev.
    * Tighter rsd costs exponentially more sketch memory. */
  def distinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** Greenwald-Khanna quantile sketch. `accuracy` trades memory for
    * error: err <= 1/accuracy relative rank. */
  def percentiles(c: Column, probs: Seq[Double], accuracy: Int = 10000): Column =
    percentile_approx(
      c,
      array(probs.map(lit): _*),
      lit(accuracy),
    )

  /** Rollup: per `groupCols`, approx distinct of `distinctCol` and
    * approx percentiles of `valueCol`. One shuffle, sketch-sized. */
  def rollup(
      df: DataFrame,
      groupCols: Seq[String],
      distinctCol: String,
      valueCol: String,
      probs: Seq[Double] = Seq(0.5, 0.95, 0.99),
  ): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        distinct(col(distinctCol)).as("approx_distinct"),
        percentiles(col(valueCol), probs).as("approx_percentiles"),
      )
}
