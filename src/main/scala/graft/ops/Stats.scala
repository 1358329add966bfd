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
    * |groups| rows. Output: (groupCol, n, r). */
  def pearsonByGroup(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String,
  ): DataFrame = {
    def d2(c: Column) = c.cast("decimal(18,2)")
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
}
