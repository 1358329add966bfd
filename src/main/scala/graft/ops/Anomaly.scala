package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical outlier detection over grouped measures: per-group
  * z-scores from exact-decimal moment sums, ranked by |z|.
  *
  * Cross-engine determinism is engineered the same way as every
  * money aggregate in the catalog: the two data-dependent reductions
  * (Σv, Σv²) ride exact DECIMAL sums — order-independent — and
  * everything after is a FIXED chain of correctly-rounded IEEE ops
  * (divide, multiply, subtract, sqrt) evaluated in the same shape on
  * both engines, so z-scores are bit-identical to the DuckDB replay.
  * A float-sum variance would be reduction-order dependent and could
  * not be oracled.
  */
object Anomaly {

  /** Top-k rows by |z| where z = (v − mean_g) / std_g against the
    * row's own group (population std from the moment identity
    * var = Σv²/n − mean²). One groupBy over the tiny group space, a
    * broadcast-friendly stats join back, a map-side z projection, and
    * a TakeOrdered top-k — no global sort, no second pass over the
    * data. `idCol` breaks |z| ties deterministically.
    *
    * Zero-variance groups are filtered BEFORE the division: every
    * member equals the mean, so no member is an outlier — and under
    * ANSI mode (Spark 4 default) the division would throw
    * DIVIDE_BY_ZERO rather than produce an Inf to rank. */
  def zScoreOutliers(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      valCol: String,
      k: Int,
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def d2(c: Column) = c.cast("decimal(18,2)")
    // null measures neither shift the moments nor score: dropped up
    // front so n counts exactly the rows that contributed to s/sq
    val rows = df.filter(col(valCol).isNotNull)
    val stats = rows
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(d2(col(valCol))).cast("double").as("s"),
        sum(d2(col(valCol)) * d2(col(valCol))).cast("double").as("sq"))
    val mean = col("s") / col("n")
    rows
      .join(stats, Seq(groupCol))
      .withColumn("graft_var_", col("sq") / col("n") - mean * mean)
      .filter(col("graft_var_") > 0)
      .select(col(idCol), col(groupCol), col(valCol),
        ((col(valCol) - mean) / sqrt(col("graft_var_"))).as("z"))
      .orderBy(abs(col("z")).desc, col(idCol))
      .limit(k)
  }

  /** ROBUST outlier flags via median/MAD (Hampel's rule — the
    * published robust alternative to [[zScoreOutliers]]: mean and std
    * are themselves dragged by the outliers they're supposed to find;
    * the median and the median-absolute-deviation have 50% breakdown,
    * so one wild batch can't mask itself). A row is flagged when
    *
    *   |v − med_g| · threshDen  >  mad_g · threshNum
    *
    * i.e. deviation > (threshNum/threshDen)·MAD, the threshold kept
    * RATIONAL so each side is one IEEE multiply of an exact median by
    * a small integer — bit-replayable cross-engine where the
    * conventional 1.4826·k·MAD float chain is not (the constant is
    * only a normal-consistency rescale; fold it into the ratio).
    *
    * Exactness: medians come from [[Quantiles.exactPerGroup]] — rank
    * ⌈n/2⌉ under (value, tie) order, an ACTUAL data value, no
    * averaging — and |v − med| is one IEEE subtraction, so every
    * derived quantity hash-matches. Known MAD caveat, kept
    * deliberately: in a group where > half the values are identical,
    * mad = 0 and EVERY deviating row flags — that is Hampel's rule
    * working as published (the caller sees it via the mad column).
    *
    * Shape: two group-partitioned rank walks (the q83 window shape —
    * per-group windows, never a global sort), one broadcast stats
    * join back, and a map-side flag projection. Output: every input
    * row (null measures dropped) + med, mad, dev, is_outlier —
    * filter `is_outlier` for the alert list, aggregate the flag for
    * rates; nothing is silently removed. */
  def madOutliers(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      valCol: String,
      threshNum: Long = 7L,
      threshDen: Long = 2L,
  ): DataFrame = {
    require(threshNum > 0 && threshDen > 0,
      s"threshold must be positive: $threshNum/$threshDen")
    val rows = df.filter(col(valCol).isNotNull)
      .select(col(idCol), col(groupCol), col(valCol))
    val med = Quantiles.exactPerGroup(rows, groupCol, valCol, idCol, Seq(0.5))
      .select(col(groupCol), col("value").as("med"))
    val withMed = rows.join(broadcast(med), Seq(groupCol))
      .withColumn("dev", abs(col(valCol) - col("med")))
    val mad = Quantiles.exactPerGroup(
        withMed.select(col(idCol), col(groupCol), col("dev")),
        groupCol, "dev", idCol, Seq(0.5))
      .select(col(groupCol), col("value").as("mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .select(col(idCol), col(groupCol), col(valCol),
        col("med"), col("mad"), col("dev"),
        (col("dev") * threshDen.toDouble >
          col("mad") * threshNum.toDouble).as("is_outlier"))
  }
}
