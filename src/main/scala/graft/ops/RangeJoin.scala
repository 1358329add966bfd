package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — points matched to intervals containing
  * them, with NO equi-key. Spark's planner turns a bare inequality
  * join into BroadcastNestedLoopJoin (or worse, a cartesian product):
  * O(points × intervals). This operator restores an equi-join shape by
  * BINNING: each interval explodes to the coarse time bins it covers,
  * each point maps to its one bin, the join runs hash-equi on the bin
  * id, and the exact range predicate filters the bin-local candidates.
  *
  * Cost: |intervals| × (span/binWidth + 1) exploded rows and a hash
  * join — linear, shuffle on the bin key. Pick `binWidth` near the
  * typical interval span so intervals explode to ~2 bins; a bin much
  * smaller than spans inflates the build side, much larger inflates
  * the per-bin candidate count (the usual histogram tradeoff).
  */
object RangeJoin {

  /** Join `points` (with numeric `ptCol`) to `intervals` rows whose
    * [startCol, endCol) contains the point. All three columns must be
    * in the same numeric units (cast dates up front). Output: point
    * row ++ interval row (inner semantics). */
  def pointInInterval(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long,
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = intervals.withColumn(
      "_bin",
      explode(
        sequence(
          floor(col(startCol) / binWidth).cast("long"),
          // end is exclusive, but a point in the end bin can still be
          // < end; include it and let the exact filter decide
          floor(col(endCol) / binWidth).cast("long"),
        )
      ),
    )
    points
      .withColumn("_bin", floor(col(ptCol) / binWidth).cast("long"))
      .join(binned, Seq("_bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bin")
  }
}
