package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (point-in-time) join — for each left row, the most recent
  * right row with `right.ts <= left.ts` in the same key group. The
  * attribution/market-data join Spark has no built-in for.
  *
  * Implementation is the scale-canonical union+window form, NOT a
  * range join: tag both inputs, union, one window partitioned by the
  * key ordered by (ts, side, ordinal) carrying `last_value(...,
  * ignoreNulls)` of the right payload — every left row then holds the
  * latest right values at or before its timestamp. Cost: ONE shuffle
  * on the key for any data size; a range-join formulation explodes on
  * wide time ranges, and per-key sorting is exactly what the window
  * shuffle already provides. Right rows sort BEFORE left rows on
  * timestamp ties, giving inclusive (<=) semantics — matching DuckDB's
  * native ASOF JOIN, which is the oracle for q28.
  */
object AsOf {

  /** @param payload right-side columns to carry; they appear on the
    *                output prefixed `asof_`, null when no right row
    *                precedes the left row. `ord` breaks ts ties within
    *                a side deterministically. */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      ord: String,
      payload: Seq[String],
  ): DataFrame = {
    val r = right.select(
      (Seq(col(key), col(tsCol), col(ord)) ++
        payload.map(c => col(c).as(s"asof_$c"))): _*)
      .withColumn("_side", lit(0))
    val l = left.withColumn("_side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(tsCol), col("_side"), col(ord))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).drop("_side")
  }
}
