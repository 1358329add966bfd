package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream INTERVAL joins — the Structured
  * Streaming capability the batch as-of/range joins (q28/q29) cannot
  * replace when BOTH sides arrive continuously: attribute each right
  * event to the left events it follows within a bounded delay
  * (click → conversion, impression → install, request → response).
  *
  * The shape Spark's engine needs to bound state: a watermark on BOTH
  * sides plus a two-sided event-time constraint in the join condition
  * — then each side's buffered rows are dropped once the other side's
  * watermark passes `leftTs + maxDelay` (left buffer) / `rightTs`
  * (right buffer), so state is O(rate × (watermark + maxDelay)), not
  * O(history). Without the time bound the same join would buffer both
  * streams forever — the documented anti-pattern this module exists
  * to avoid.
  *
  * Outer variants emit the unmatched row with nulls only once the
  * watermark proves no match can still arrive — correctness over
  * latency, the standard Structured Streaming trade.
  *
  * At 100 TB-rate deployment: state is keyed by the join key in the
  * state store, micro-batches shuffle both sides on that key; skewed
  * keys follow the same salting escape hatch as batch (split the hot
  * key upstream). No oracle — streaming semantics (watermark-gated
  * emission) are outside DuckDB's reach; StreamJoinSpec pins inner ≡
  * batch on on-time data, the delay bound, and the outer null
  * emission.
  */
object StreamJoin {

  /** `left ⋈ right` where `right.ts ∈ [left.ts, left.ts + maxDelay]`
    * and the key columns match. Column names must be disjoint across
    * the two frames (rename upstream — the output carries both
    * sides' columns). `joinType`: "inner", "leftOuter", "rightOuter",
    * or "fullOuter" (Spark's supported stream-stream set). */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftTsCol: String,
      rightTsCol: String,
      keyCondition: Column,
      maxDelay: String,
      watermarkDelay: String = "1 hour",
      joinType: String = "inner",
  ): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    val r = right.withWatermark(rightTsCol, watermarkDelay)
    l.join(r,
      keyCondition &&
        col(rightTsCol) >= col(leftTsCol) &&
        col(rightTsCol) <= col(leftTsCol) + expr(s"INTERVAL $maxDelay"),
      joinType)
  }

  /** The canonical instance: click → conversion attribution. Every
    * conversion joins the clicks of the SAME user it trails by at
    * most `maxDelay`; `leftOuter` keeps never-converting clicks
    * (emitted with nulls once the watermark closes their window) —
    * the funnel denominator. Output: one row per (click, conversion
    * within window) pair plus, for leftOuter, one null-extended row
    * per unconverted click. */
  def attribution(
      clicks: DataFrame, // (user_id, click_id, click_ts)
      conversions: DataFrame, // (conv_user, conv_id, conv_ts)
      maxDelay: String,
      watermarkDelay: String = "1 hour",
      joinType: String = "inner",
  ): DataFrame =
    intervalJoin(
      clicks, conversions, "click_ts", "conv_ts",
      col("user_id") === col("conv_user"),
      maxDelay, watermarkDelay, joinType)
}
