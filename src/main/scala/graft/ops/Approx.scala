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
  * Sketch ESTIMATES are engine-specific (implementations differ by
  * design), so they never enter a hash-compared output directly;
  * the q15 catalog query instead emits exact keys/counts plus
  * error-bound booleans the DuckDB oracle asserts — a sketch
  * drifting outside its published budget breaks the hash match —
  * and ApproxSpec pins bounded error vs exact on small data.
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

  /** RELATIONAL count-min sketch: instead of an opaque binary blob
    * (which would need a custom UDAF to merge), the sketch is a table
    * of (j, cell, cnt) rows — depth × width counters at most. Merging
    * sketches is cell-wise SUM (a plain groupBy — associative,
    * map-side-combinable, streaming-compatible); estimating a key is
    * MIN over its depth cells. Everything stays inside whole-stage
    * codegen, and because the hash family is the md5-based
    * [[graft.llm.TextOps.hash60]], DuckDB reproduces every counter
    * bit-for-bit — the q46 heavy-hitter query is hash-match oracled,
    * which no binary-sketch engine form could be.
    *
    * Standard CMS guarantees apply per (depth d, width w): estimates
    * never undercount, and overcount ≤ εN with probability 1−δ for
    * ε = e/w, δ = e^−d. The sketch table is ≤ d·w rows per fine-key
    * group regardless of input size — the constant-size property that
    * matters at 100 TB. */
  def cmsCells(
      df: DataFrame,
      c: String,
      fineKeys: Seq[String] = Nil,
      depth: Int = 4,
      width: Int = 512,
  ): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1 and width >= 2")
    val out = df
      .withColumn("j", explode(array((0 until depth).map(lit): _*)))
      .withColumn("cell", cmsCell(col("j"), col(c), width))
      .groupBy((fineKeys :+ "j" :+ "cell").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    out
  }

  /** The cell index of value `v` in depth row `j`: an independent hash
    * per j via seed-prefixed md5 — mirrored textually by the oracle. */
  private def cmsCell(j: Column, v: Column, width: Int): Column =
    pmod(graft.llm.TextOps.hash60(
      concat(j.cast("string"), lit(":"), v.cast("string"))), lit(width.toLong))

  /** Merge sketch tables to a coarser grain: cell-wise sum. Input is
    * the OUTPUT of [[cmsCells]] (possibly unioned across batches /
    * days), never raw data — the same preagg/reagg discipline as the
    * HLL sketch tables above. */
  def cmsMerge(cells: DataFrame, coarseKeys: Seq[String] = Nil): DataFrame =
    cells.groupBy((coarseKeys :+ "j" :+ "cell").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Estimate each candidate key's count from a (merged) sketch table:
    * min over the key's depth cells, 0 when a cell was never touched.
    * `keys` is a one-column frame of candidate values; the join is on
    * (j, cell) — candidate-sized, broadcast-friendly. */
  def cmsEstimate(
      cells: DataFrame,
      keys: DataFrame,
      depth: Int = 4,
      width: Int = 512,
  ): DataFrame = {
    val keyCol = keys.columns.head
    val probes = keys
      .withColumn("j", explode(array((0 until depth).map(lit): _*)))
      .withColumn("cell", cmsCell(col("j"), col(keyCol), width))
    probes
      .join(cells.select(col("j"), col("cell"), col("cnt")), Seq("j", "cell"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** Top-k heavy hitters of `c` by CMS estimate. Candidates come from
    * a DETERMINISTIC row sample — rows whose `sampleCol` hash lands in
    * a 1/`sampleMod` slice — because querying a CMS needs keys to
    * probe, and a key with count ≥ N/k appears in such a sample with
    * probability ≈ 1 − (1 − 1/sampleMod)^(N/k) (vanishingly unlikely
    * to miss for any genuine heavy hitter at scale). Candidate keys
    * then probe the sketch; ties break on the key for determinism.
    * Two shuffles (sketch build + estimate), sketch-and-candidate-
    * sized — never a full exact count of all keys. */
  def heavyHitters(
      df: DataFrame,
      c: String,
      sampleCol: String,
      k: Int,
      depth: Int = 4,
      width: Int = 512,
      sampleMod: Int = 10,
  ): DataFrame = {
    val cells = cmsCells(df, c, Nil, depth, width)
    val cand = df
      .filter(pmod(graft.llm.TextOps.hash60(
        concat(lit("s:"), col(sampleCol).cast("string"))), lit(sampleMod.toLong)) === 0)
      .select(col(c)).distinct()
    cmsEstimate(cells, cand, depth, width)
      .orderBy(col("est_count").desc, col(c))
      .limit(k)
  }

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
