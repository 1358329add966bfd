package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality sweep run before a table is
  * trusted: per column, row count, null count, exact distinct count,
  * min/max, and an exact decimal sum (for drift checks between
  * pipeline runs).
  *
  * Single pass: ALL columns' statistics ride one aggregate job (the
  * multi-countDistinct expands inside the same Expand/Aggregate pair),
  * then the 1×(5·cols) stat row is unpivoted to one row per column —
  * a driver-free explode of a constant-width array. A 100 TB table
  * profiles in one scan.
  *
  * Numeric columns only: cross-engine min/max of strings would hinge
  * on collation, and double→string rendering differs between engines;
  * numeric stats compare exactly (q32 oracle).
  */
object Profile {

  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"),
        graft.Tables.dsum(col(c)).as(s"sum_$c"),
      )
    }
    val one = df.agg(count(lit(1)).as("n"), aggs: _*)
    val stacked = one.select(
      col("n"),
      explode(array(cols.map { c =>
        struct(
          lit(c).as("col_name"),
          col(s"nulls_$c").as("nulls"),
          col(s"nd_$c").as("n_distinct"),
          col(s"min_$c").as("min_value"),
          col(s"max_$c").as("max_value"),
          col(s"sum_$c").as("sum_value"),
        )
      }: _*)).as("s"),
    )
    stacked.select(
      col("s.col_name"),
      col("n"),
      col("s.nulls"),
      col("s.n_distinct"),
      col("s.min_value"),
      col("s.max_value"),
      col("s.sum_value"),
    )
  }
}
