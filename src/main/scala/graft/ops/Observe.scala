package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inline data-quality observation — production observability without
  * a second scan: `Dataset.observe` rides caller-chosen aggregates on
  * the SAME job that produces the output (a `CollectMetrics` node in
  * the plan, accumulator-backed), so "how many rows, how many nulls,
  * how many contract violations" costs nothing beyond the arithmetic.
  * The alternative — a separate `df.agg(...)` pass — re-reads the
  * source; at 100 TB that is a second 100 TB scan for a handful of
  * counters.
  *
  * Works identically on batch (read back via
  * `queryExecution.observedMetrics` after the action) and streaming
  * (per-batch via the progress listener / `StreamingQueryProgress
  * .observedMetrics`) — one instrumentation seam for both runtimes.
  * Metrics must be aggregates the engine can merge per-task
  * (sum/count/min/max shapes); that is Spark's own `observe`
  * contract, enforced at analysis.
  */
object Observe {

  /** Attach standard quality counters plus caller extras to `df`
    * under metric-set `name`: `n_rows`, one `null_<col>` counter per
    * requested column, and any named aggregate in `extras`
    * (e.g. `"neg_qty" -> sum(when(col("qty") < 0, 1).otherwise(0))`).
    */
  def withQualityMetrics(
      df: DataFrame,
      name: String,
      nullCols: Seq[String] = Nil,
      extras: Map[String, Column] = Map.empty,
  ): DataFrame = {
    val nulls = nullCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    val ex = extras.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }
    val all = (count(lit(1)).as("n_rows") +: nulls) ++ ex
    df.observe(name, all.head, all.tail: _*)
  }

  /** The observed metric rows of a COMPLETED batch action on `df`
    * (call after `collect`/`write`): metric-set name → (metric name →
    * value). Empty until an action ran — observation is a side effect
    * of execution, not of planning. */
  def metrics(df: DataFrame): Map[String, Map[String, Any]] =
    df.queryExecution.observedMetrics.map { case (name, row) =>
      name -> row.schema.fieldNames.zip(row.toSeq).toMap
    }
}
