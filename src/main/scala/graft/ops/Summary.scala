package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's per-country aggregate (A1–A5,
  * /root/reference/lambda.py:183-190): groupBy Country → max units sold
  * + three means, with the reference's exact output column names.
  *
  * Semantics trap reproduced deliberately (SURVEY.md §7.4 risk 3): the
  * reference aggregates ONLY the current batch yet fully replaces the
  * summary table. `fromTarget=true` offers the "fixed" mode (aggregate
  * the merged target) behind a flag.
  */
object Summary {

  def countrySummary(df: DataFrame): DataFrame =
    df.groupBy(col("Country"))
      .agg(
        max(col("UnitsSold")).as("max_units_sold"),
        avg(col("TotalRevenue")).as("average_total_revenue"),
        avg(col("TotalCost")).as("average_total_cost"),
        avg(col("TotalProfit")).as("average_total_profit"),
      )

  /** Oracle-stable variant: same shape, but the means flow through
    * exact DECIMAL(18,2) sums ([[graft.Tables.davg]]) so the result is
    * bit-identical regardless of partial-aggregation order — float
    * `avg` is not reproducible even across two Spark runs with
    * different partitioning, let alone across engines. */
  def countrySummaryExact(df: DataFrame): DataFrame =
    df.groupBy(col("Country"))
      .agg(
        max(col("UnitsSold")).as("max_units_sold"),
        graft.Tables.davg(col("TotalRevenue")).as("average_total_revenue"),
        graft.Tables.davg(col("TotalCost")).as("average_total_cost"),
        graft.Tables.davg(col("TotalProfit")).as("average_total_profit"),
      )
}
