package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 history building: collapse a
  * change stream (key, attribute, version) into validity intervals —
  * one row per maximal run of an unchanged attribute value, with
  * `valid_from` = the run's first version, `valid_to` = the next run's
  * first version (−1 for the open/current interval; explicit sentinel
  * rather than null so downstream interval joins and the cross-engine
  * hash compare stay null-free). An attribute that returns to an
  * earlier value opens a NEW interval — history, not distinct states.
  *
  * Relational shape (one shuffle on the key, reused by all three
  * phases since every window/group keys on it): lag-change flag →
  * running-sum run id (the gaps-and-islands idiom, same family as
  * [[Sessionize]]) → per-run aggregate → lead for the interval end.
  * `version` must be totally ordered per key with `tiebreak`
  * (an event/sequence id); `attr` must be non-null.
  */
object Scd {

  def type2(
      df: DataFrame,
      key: String,
      attr: String,
      version: String,
      tiebreak: String,
  ): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(version), col(tiebreak))
    val prev = lag(col(attr), 1).over(w)
    val flagged = df
      .withColumn("_chg", when(prev.isNull || prev =!= col(attr), 1L).otherwise(0L))
      .withColumn("_run",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = flagged
      .groupBy(col(key), col("_run"))
      .agg(
        min(col(attr)).as(attr), // constant within a run by construction
        min(col(version)).as("valid_from"),
        count(lit(1)).as("n_rows"),
      )
    val w2 = Window.partitionBy(col(key)).orderBy(col("valid_from"))
    runs
      .withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(w2), lit(-1L)))
      .select(col(key), col(attr), col("valid_from"), col("valid_to"), col("n_rows"))
  }
}
