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

  /** WEIGHTED exact quantiles — quantiles of MASS, not of rows: the
    * smallest value v such that rows with value <= v carry at least
    * p of the total weight. The design question row quantiles can't
    * answer: "what sequence length covers 95% of the corpus TOKENS"
    * weights each document by its token count, and a few long docs
    * move the answer far from the row-p95 (q91).
    *
    * Shape: one [[Rank.prefixSumWithTotal]] walk under
    * (valCol, tieCol) — range exchange + internal-row cumulative
    * weight, no global sort — then ONE aggregate whose per-p pick is
    * min(struct(cum, value)) over rows with cum >= p·W: map-side
    * combinable, and cum is strictly increasing (non-positive
    * weights are dropped up front — they carry no mass and their
    * cum ties would make min_by ambiguous on BOTH engines), so the
    * pick is unique. p·W is one double product of exact longs —
    * identical IEEE cross-engine. Output: (p, value, cum_weight). */
  def weighted(
      df: DataFrame,
      valCol: String,
      tieCol: String,
      weightCol: String,
      probs: Seq[Double],
  ): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    // cast FIRST, then filter the casted value: a fractional weight in
    // (0, 1) would pass a pre-cast `> 0` filter and truncate to 0 mass,
    // producing tied cum values that break the unique-pick invariant
    val rows = df
      .select(col(valCol), col(tieCol), col(weightCol).cast("long").as("graft_w_"))
      .filter(col("graft_w_") > 0)
    val (cum, total) =
      Rank.prefixSumWithTotal(rows, Seq(valCol, tieCol), "graft_w_")
    val picks = probs.zipWithIndex.map { case (p, i) =>
      min(when(col("cum") >= lit(p * total),
        struct(col("cum"), col(valCol)))).as(s"graft_p${i}_")
    }
    val one = cum.agg(picks.head, picks.tail: _*)
    val out = one.select(explode(array(probs.zipWithIndex.map { case (p, i) =>
      struct(lit(p).as("p"),
        col(s"graft_p${i}_").getField(valCol).as("value"),
        col(s"graft_p${i}_").getField("cum").as("cum_weight"))
    }: _*)).as("r"))
      .select(col("r.p"), col("r.value"), col("r.cum_weight"))
    // an all-zero-weight (or empty) input has no mass to cover: no rows
    if (total == 0L) out.filter(lit(false)) else out
  }

  /** Per-GROUP weighted quantiles — [[weighted]] computed within each
    * group ("the length covering 95% of EACH SOURCE's tokens", the
    * per-source seqLen/mix question). The cumulative runs in a
    * GROUP-partitioned window (bounded per group — the scale-safe
    * window shape, same as [[exactPerGroup]]), group totals are a
    * tiny aggregate joined back broadcast, and the per-(group, p)
    * pick is the same map-side-combinable min(struct(cum, value))
    * aggregate. Non-positive weights drop for the same
    * pick-uniqueness reason. Output: (groupCol, p, value,
    * cum_weight). */
  def weightedPerGroup(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      tieCol: String,
      weightCol: String,
      probs: Seq[Double],
  ): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // cast-then-filter for the same unique-pick reason as [[weighted]]
    val rows = df
      .select(col(groupCol), col(valCol), col(tieCol),
        col(weightCol).cast("long").as("graft_w_"))
      .filter(col("graft_w_") > 0)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = rows.withColumn("graft_cum_", sum(col("graft_w_")).over(w))
    val totals = rows.groupBy(col(groupCol))
      .agg(sum(col("graft_w_")).cast("long").as("graft_tot_"))
      .crossJoin(probs.toDF("p"))
    cum
      .join(broadcast(totals), Seq(groupCol))
      .filter(col("graft_cum_").cast("double") >= col("p") * col("graft_tot_"))
      .groupBy(col(groupCol), col("p"))
      .agg(min(struct(col("graft_cum_"), col(valCol))).as("graft_pick_"))
      .select(col(groupCol), col("p"),
        col("graft_pick_").getField(valCol).as("value"),
        col("graft_pick_").getField("graft_cum_").as("cum_weight"))
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

  /** APPROXIMATE quantiles from a single-pass fixed-bin histogram —
    * the constant-memory tier below [[exact]], and unlike the GK
    * sketch (q15) fully DETERMINISTIC: the histogram is exact counts
    * over data-independent bins ([[Stats.histogram]] semantics:
    * [lo, hi), out-of-range clamps into edge bins, null/NaN
    * dropped), and the estimate is a fixed arithmetic chain over
    * those counts, so the result is merge-order-free and another
    * engine can replay it bit-for-bit — an approx quantile that
    * hash-matches its oracle.
    *
    * Estimate: with target rank t = max(1, ⌈p·N⌉), find the first
    * non-empty bin whose cumulative count reaches t, then
    * interpolate by rank fraction inside it:
    * est = lo_edge + w·(t − cum_before)/cnt. For data inside
    * [lo, hi) the error is bounded by the bin width w = (hi−lo)/bins
    * — the returned `err_bound` column; clamped out-of-range mass
    * voids the bound for the edge bins (the caller chose the range).
    *
    * Scale shape: ONE pass — the histogram's map-side integral bin
    * projection + partial-agg groupBy over ≤ `bins` keys is the only
    * data-sized work; everything after (cumulative counts via a
    * bins×bins triangular broadcast join, the per-p pick as a
    * map-side-combinable min(struct)) runs on ≤ `bins` rows.
    * O(bins) reduce state makes it exactly the mergeable-sketch
    * shape: per-split histograms add cell-wise, so this is also the
    * streaming/partitioned form ([[graft.streaming.SketchIntake]]'s
    * cell-sum compaction applies as-is). Where [[exact]] pays a
    * range exchange + rank walk over all N rows, this touches N only
    * in one combiner pass — at 100 TB that is the difference between
    * a quantile you schedule and a quantile you get for free with
    * the scan. Output: (p, bin, est, err_bound), empty for an empty
    * input (no rank 1 exists). */
  def fromHistogram(
      df: DataFrame,
      valCol: String,
      lo: Double,
      hi: Double,
      bins: Int,
      probs: Seq[Double],
  ): DataFrame =
    fromCells(
      Stats.histogram(df, valCol, lo, hi, bins).select(col("bin"), col("cnt")),
      lo, hi, bins, probs)

  /** [[fromHistogram]] over an ALREADY-BINNED cell table (bin, cnt) —
    * the read side of a maintained histogram: cells are exact
    * integers and add cell-wise, so generations appended by a
    * streaming drain ([[graft.streaming.SketchIntake
    * .drainHistogramTo]]), per-partition partials, or per-day
    * snapshots merge here by a plain groupBy-sum and the estimate is
    * BIT-IDENTICAL to a one-shot batch run over the union of the
    * data — the property no float sketch can offer. Multiple rows
    * per bin are expected (one generation each); `lo`/`hi`/`bins`
    * must be the ones the cells were binned with. */
  def fromCells(
      cells: DataFrame,
      lo: Double,
      hi: Double,
      bins: Int,
      probs: Seq[Double],
  ): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    val spark = cells.sparkSession
    import spark.implicits._
    val w = (hi - lo) / bins
    // the merged histogram is ≤ bins rows but its lineage may scan
    // the data — cut it (localCheckpoint) so the self-join + totals
    // below reuse the tiny materialized result, not the source
    val h = cells
      .groupBy(col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") > 0L)
      .localCheckpoint()
    // cumulative counts over ≤ bins rows: triangular join, both sides
    // tiny (bounded by `bins` by construction — never data-sized)
    val cum = h.as("a")
      .join(broadcast(h.as("b")), col("b.bin") <= col("a.bin"))
      .groupBy(col("a.bin").as("bin"))
      .agg(
        first(col("a.cnt")).as("cnt"),
        sum(col("b.cnt")).as("cum"))
    val totals = h.agg(sum(col("cnt")).as("graft_n_"))
    val picks = probs.toDF("p")
      .crossJoin(broadcast(totals))
      .select(col("p"),
        greatest(lit(1L), ceil(col("p") * col("graft_n_"))).as("target"))
    // first bin reaching the target: cum is strictly increasing over
    // the non-empty bins, so min(struct(cum, …)) picks uniquely
    picks
      .join(broadcast(cum), col("cum") >= col("target"))
      .groupBy(col("p"))
      .agg(min(struct(col("cum"), col("bin"),
        col("cnt"), col("target"))).as("pick"))
      .select(col("p"), col("pick.bin").as("bin"),
        (lit(lo) + col("pick.bin") * lit(w) + lit(w) *
          ((col("pick.target") - (col("pick.cum") - col("pick.cnt")))
            .cast("double") / col("pick.cnt").cast("double"))).as("est"),
        lit(w).as("err_bound"))
  }

  /** [[fromHistogramPerGroup]] over an already-binned cell table
    * (groupCol, bin, cnt) — the per-group read side of a maintained
    * histogram (multiple rows per (group, bin) merge by exact sum,
    * same losslessness argument as [[fromCells]]). Bounds must match
    * what the cells were binned with. */
  def fromCellsPerGroup(
      cells: DataFrame,
      groupCol: String,
      lo: Double,
      hi: Double,
      bins: Int,
      probs: Seq[Double],
  ): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    val spark = cells.sparkSession
    import spark.implicits._
    val w = (hi - lo) / bins
    val h = cells
      .select(col(groupCol).as("g"), col("bin"), col("cnt"))
      .groupBy(col("g"), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") > 0L)
      .localCheckpoint()
    val cum = h.as("a")
      .join(h.as("b"),
        col("a.g") === col("b.g") && col("b.bin") <= col("a.bin"))
      .groupBy(col("a.g").as("g"), col("a.bin").as("bin"))
      .agg(first(col("a.cnt")).as("cnt"), sum(col("b.cnt")).as("cum"))
    val totals = h.groupBy(col("g")).agg(sum(col("cnt")).as("graft_n_"))
    val picks = totals
      .crossJoin(probs.toDF("p"))
      .select(col("g"), col("p"),
        greatest(lit(1L), ceil(col("p") * col("graft_n_"))).as("target"))
    picks.as("pk")
      .join(cum.as("c"),
        col("pk.g") === col("c.g") && col("cum") >= col("target"))
      .groupBy(col("pk.g").as("g"), col("p"))
      .agg(min(struct(col("cum"), col("bin"), col("cnt"),
        col("target"))).as("pick"))
      .select(col("g").as(groupCol), col("p"),
        col("pick.bin").as("bin"),
        (lit(lo) + col("pick.bin") * lit(w) + lit(w) *
          ((col("pick.target") - (col("pick.cum") - col("pick.cnt")))
            .cast("double") / col("pick.cnt").cast("double"))).as("est"),
        lit(w).as("err_bound"))
  }

  /** Per-GROUP histogram-sketch quantiles — [[fromHistogram]] inside
    * each group (the per-feed/per-source p99 without any sort): the
    * one data-sized pass is a groupBy over (group, bin) — ≤
    * |groups|·bins keys, map-side partials — and everything after
    * (cumulative counts via a group-equi + bin-range self-join, the
    * per-(group, p) pick) runs on that bounded table. Groups are
    * feed-grain (a column you'd also GROUP BY in a report), so
    * |groups|·bins stays sketch-sized; per-group N rides the same
    * table, no extra pass. Same estimator, bound, and edge rules as
    * [[fromHistogram]]; groups whose data is all null/NaN emit
    * nothing. Output: (groupCol, p, bin, est, err_bound). */
  def fromHistogramPerGroup(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      lo: Double,
      hi: Double,
      bins: Int,
      probs: Seq[Double],
  ): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val w = (hi - lo) / bins
    val raw = floor((col(valCol) - lit(lo)) / lit(w)).cast("long")
    val bin = least(greatest(raw, lit(0L)), lit(bins - 1L))
    val cells = df
      .filter(col(valCol).isNotNull && !isnan(col(valCol).cast("double")))
      .select(col(groupCol), bin.as("bin"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    fromCellsPerGroup(cells, groupCol, lo, hi, bins, probs)
  }
}
