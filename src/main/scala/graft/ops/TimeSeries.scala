package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over the event log: resample to a fixed
  * period grid and gap-fill by last observation carried forward — the
  * step that turns an irregular event stream into the dense series
  * every downstream window/forecast op assumes.
  */
object TimeSeries {

  /** Per-key daily (or any `periodNs`) series: events aggregate to an
    * exact per-(key, period) total, each key's grid spans its OWN
    * first..last active period (no global span — a key active for a
    * week costs 7 rows regardless of corpus history), missing periods
    * fill by LOCF, `observed` marks real vs carried rows.
    *
    * Scale shape: the aggregate and the LOCF window both key on
    * (user) — partitioned windows, never a global one; the grid
    * explode is bounded by each key's own span; the sum rides the
    * exact DECIMAL(18,2) path so the filled values hash-match across
    * engines. Integral `div` for the period (epoch-ns exceeds 2^53).
    * Leading rows are always observed by construction (the grid
    * starts at the key's first active period), so LOCF never emits a
    * null. Output: (userCol, period, value_filled, observed). */
  def gapFillLocf(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valCol: String,
      periodNs: Long,
  ): DataFrame = {
    require(periodNs > 0, s"periodNs must be positive, got $periodNs")
    val pe = events
      .select(col(userCol).as("user"), col(tsCol).cast("long").as("tsl"),
        col(valCol).as("v"))
      .select(col("user"), expr(s"tsl div ${periodNs}L").as("period"), col("v"))
      .groupBy(col("user"), col("period"))
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("v"))
    val grid = pe
      .groupBy(col("user"))
      .agg(min(col("period")).as("d0"), max(col("period")).as("d1"))
      .select(col("user"),
        explode(sequence(col("d0"), col("d1"))).as("period"))
    val w = Window.partitionBy(col("user")).orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(pe, Seq("user", "period"), "left")
      .select(
        col("user").as(userCol),
        col("period"),
        last(col("v"), ignoreNulls = true).over(w).as("value_filled"),
        col("v").isNotNull.as("observed"))
  }
}
