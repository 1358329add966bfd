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

  /** Mergeable distinct-count sketches (Apache DataSketches HLL via
    * the built-in `hll_*` functions) — the REAGGREGATABLE form
    * `approx_count_distinct` cannot give you: that one returns a
    * number, these return the sketch itself as bytes, and sketches
    * union associatively. The pattern that matters at 100 TB:
    * materialize ONE fine-grained sketch table (per day × key), then
    * answer distinct counts over ANY coarser slice — any date range,
    * any key subset — by unioning the stored sketches instead of
    * rescanning raw data. A year of daily sketches reaggregates in
    * milliseconds; the raw-scan alternative is a year-long table
    * pass per question. */
  def hllSketch(c: Column, lgK: Int = 12): Column = hll_sketch_agg(c, lgK)
  def hllMerge(sketch: Column): Column = hll_union_agg(sketch, false)
  def hllEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** The fine-grained sketch table: per `fineKeys`, an HLL sketch of
    * `c` (binary column `sketch`). Write this once per batch/day. */
  def preaggDistinct(df: DataFrame, fineKeys: Seq[String], c: String, lgK: Int = 12): DataFrame =
    df.groupBy(fineKeys.map(col): _*)
      .agg(hllSketch(col(c), lgK).as("sketch"))

  /** Answer a coarser question from the sketch table: union the
    * stored sketches per `coarseKeys` and estimate. Input is the
    * OUTPUT of [[preaggDistinct]] (optionally filtered), never raw
    * data. */
  def reaggregateDistinct(sketches: DataFrame, coarseKeys: Seq[String]): DataFrame =
    sketches.groupBy(coarseKeys.map(col): _*)
      .agg(hllEstimate(hllMerge(col("sketch"))).as("approx_distinct"))

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
