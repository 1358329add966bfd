package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bivariate statistics over grouped measures, engineered for
  * cross-engine exactness the same way [[Anomaly]] is: Spark's
  * built-in `corr`/`covar_pop` reduce FLOAT sums, whose value depends
  * on reduction order — two runs of the same query can disagree in
  * the last bits, and no other engine can replay them. Here every
  * data-dependent reduction (n, Σx, Σy, Σxy, Σx², Σy²) rides exact
  * DECIMAL sums — order-independent — and the correlation itself is
  * a FIXED chain of correctly-rounded IEEE ops evaluated in the same
  * shape on both engines, so r is bit-identical to the DuckDB replay.
  */
object Stats {

  /** Per-group Pearson correlation of (xCol, yCol) from exact-decimal
    * moment sums: r = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)).
    *
    * Rows where EITHER measure is null drop up front, so n counts
    * exactly the pairs that contributed to every moment (the q75
    * null-semantics lesson, applied from the start). Groups with zero
    * variance in either variable are filtered BEFORE the division —
    * r is undefined there, and ANSI mode would throw DIVIDE_BY_ZERO
    * rather than emit a NaN to compare.
    *
    * Shape: one partial-aggregated groupBy over the (tiny) group key
    * space — six decimal sums, map-side combinable; the r projection
    * is map-side arithmetic on the aggregate row. One shuffle of
    * |groups| rows. Output: (groupCol, n, r).
    *
    * INPUT QUANTIZATION: both measures are cast to decimal(18,
    * `scale`) BEFORE the moment sums — with the default scale 2 the
    * inputs are rounded to 0.01 (money-grain; exactly what makes the
    * sums order-independent and cross-engine replayable), and under
    * ANSI mode a value with |x| >= 10^(18-scale) overflows the cast
    * and THROWS rather than silently wrapping. For finer-grain
    * measures raise `scale` (the 18-digit precision budget then
    * shrinks the representable range accordingly); the oracle must
    * mirror the same DECIMAL(18, scale) cast. */
  def pearsonByGroup(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String,
      scale: Int = 2,
  ): DataFrame = {
    def d2(c: Column) = c.cast(s"decimal(18,$scale)")
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val m = rows
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(d2(col(xCol))).cast("double").as("sx"),
        sum(d2(col(yCol))).cast("double").as("sy"),
        sum(d2(col(xCol)) * d2(col(yCol))).cast("double").as("sxy"),
        sum(d2(col(xCol)) * d2(col(xCol))).cast("double").as("sxx"),
        sum(d2(col(yCol)) * d2(col(yCol))).cast("double").as("syy"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    m
      .filter(vx > 0 && vy > 0)
      .select(col(groupCol), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(vx) * sqrt(vy))).as("r"))
  }

  /** Per-group least-squares line y = slope·x + intercept from the
    * SAME six exact moments as [[pearsonByGroup]]:
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),
    * intercept = (Σy − slope·Σx) / n. The trend-per-segment op
    * (value drift per event type, tokens-vs-chars slope per source)
    * with the same null/zero-variance discipline; x must vary,
    * y need not. One |groups|-row shuffle. Inputs quantize to
    * decimal(18, `scale`) exactly as in [[pearsonByGroup]] — 0.01
    * grain and a 10^(18-scale) ANSI range limit at the default. */
  def fitLineByGroup(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String,
      scale: Int = 2,
  ): DataFrame = {
    def d2(c: Column) = c.cast(s"decimal(18,$scale)")
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val m = rows
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(d2(col(xCol))).cast("double").as("sx"),
        sum(d2(col(yCol))).cast("double").as("sy"),
        sum(d2(col(xCol)) * d2(col(yCol))).cast("double").as("sxy"),
        sum(d2(col(xCol)) * d2(col(xCol))).cast("double").as("sxx"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / vx
    m
      .filter(vx > 0)
      .select(col(groupCol), col("n"),
        slope.as("slope"),
        ((col("sy") - slope * col("sx")) / col("n")).as("intercept"))
  }

  /** Fixed-bin histogram of a measure over explicit [lo, hi) bounds:
    * bin i covers [lo + i·w, lo + (i+1)·w) with w = (hi−lo)/bins;
    * values below `lo` clamp into bin 0, at/above `hi` into the last
    * bin (closed ends — a histogram that silently drops out-of-range
    * rows misreports the distribution). Bounds are EXPLICIT by
    * design: deriving min/max would cost an extra pass and make the
    * binning data-dependent (two corpora, two meanings per bin).
    *
    * One map-side integral bin projection + a groupBy over at most
    * `bins` keys with partial agg; empty bins emit as zero rows via
    * a broadcast grid join, so downstream plotting never invents
    * gaps. Bin edges are the same fixed IEEE arithmetic on both
    * engines. Output: (bin, lo_edge, cnt). */
  def histogram(
      df: DataFrame,
      valCol: String,
      lo: Double,
      hi: Double,
      bins: Int,
  ): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val spark = df.sparkSession
    import spark.implicits._
    val w = (hi - lo) / bins
    val raw = floor((col(valCol) - lit(lo)) / lit(w)).cast("long")
    val bin = least(greatest(raw, lit(0L)), lit(bins - 1L))
    val counts = df
      // NaN is droppable like null (no bin is right for it) — and
      // under ANSI mode the long cast of floor(NaN) would THROW
      // rather than misbin
      .filter(col(valCol).isNotNull && !isnan(col(valCol).cast("double")))
      .select(bin.as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val grid = (0 until bins).map(i => (i.toLong, lo + i * w)).toDF("bin", "lo_edge")
    broadcast(grid)
      .join(counts, Seq("bin"), "left")
      .select(col("bin"), col("lo_edge"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Per-group WINSORIZATION: clip every value into its own group's
    * [p_lo, p_hi] exact quantile band — the standard tail-taming step
    * before any moment-based statistic or feature normalization (the
    * q116 MAD report finds the tails; this is the remediation that
    * keeps the rows). Bounds are [[Quantiles.exactPerGroup]] picks —
    * ACTUAL data values at ranks ⌈p·n⌉, not interpolations — and the
    * clip is two comparisons, so output values are always drawn from
    * the input's own value set and the whole frame hash-replays.
    *
    * Shape: two rank picks off ONE group-partitioned window pass
    * (both probs share the walk), broadcast back, map-side clip.
    * Output: every non-null-measure row + lo, hi, clipped,
    * was_clipped (null measures drop up front — they carry no rank
    * and have nothing to clip; the [[Anomaly.madOutliers]] rule). */
  def winsorizeByGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      valCol: String,
      pLo: Double = 0.01,
      pHi: Double = 0.99,
  ): DataFrame = {
    require(pLo > 0 && pHi <= 1 && pLo < pHi,
      s"need 0 < pLo < pHi <= 1, got ($pLo, $pHi)")
    val rows = df.filter(col(valCol).isNotNull)
      .select(col(idCol), col(groupCol), col(valCol))
    val picks = Quantiles.exactPerGroup(rows, groupCol, valCol, idCol,
        Seq(pLo, pHi))
    val bounds = picks.groupBy(col(groupCol)).agg(
      min(when(col("p") === pLo, col("value"))).as("lo"),
      max(when(col("p") === pHi, col("value"))).as("hi"))
    rows.join(broadcast(bounds), Seq(groupCol))
      .select(col(idCol), col(groupCol), col(valCol),
        col("lo"), col("hi"),
        least(greatest(col(valCol), col("lo")), col("hi")).as("clipped"),
        (col(valCol) < col("lo") || col(valCol) > col("hi")).as("was_clipped"))
  }
}
