package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational (batch) gap-based sessionization: the classic
  * lag → new-session flag → running sum → group pattern.
  *
  *   flag_i = (ts_i − ts_{i−1} > gap)            one window pass
  *   session_ordinal = Σ flag over (user, ≤ts)   same window shuffle
  *   per-session aggregate                       one groupBy
  *
  * Both window functions and the final aggregate partition on the
  * user key → ONE shuffle total. This is the set-semantics twin of
  * the stateful streaming form
  * ([[graft.streaming.EventStreams.sessionize]]); the two are
  * equivalence-tested against each other, and this form is simple
  * SQL — so it carries the DuckDB oracle for both (q25).
  */
object Sessionize {

  /** Per-session aggregates: (user, session_id ordinal, n_events,
    * sum of `valueCol`). `gap` in the units of `tsCol`. */
  def byGap(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      gap: Long,
      tieBreak: String,
  ): DataFrame = {
    val order = Seq(col(tsCol), col(tieBreak))
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val newSession: Column =
      when(col(tsCol) - lag(col(tsCol), 1).over(w) > gap, 1).otherwise(0)
    df.withColumn("_ns", newSession)
      .withColumn("session_id", sum(col("_ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        graft.Tables.dsum(col(valueCol)).as("sum_value"),
      )
  }
}
