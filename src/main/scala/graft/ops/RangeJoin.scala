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

  /** INTERVAL × INTERVAL overlap join — both sides are half-open
    * ranges, matched when they intersect: lS < rE && rS < lE. The
    * naive form is again a nested-loop; both sides explode to their
    * covered bins and hash-join on the bin id instead.
    *
    * The subtlety point-in-interval doesn't have: two overlapping
    * intervals can share MANY bins, and the bin join would emit the
    * pair once per shared bin — the classic duplicate blowup that a
    * corpus-sized DISTINCT would have to mop up. Instead each pair is
    * kept ONLY in the first bin both sides cover, which for
    * overlapping intervals is exactly max(lStartBin, rStartBin) —
    * a map-side predicate, so every overlapping pair emits exactly
    * once and NO distinct pass (and no wide shuffle of the payload)
    * exists anywhere in the plan. Empty intervals (end <= start)
    * overlap nothing and are dropped up front — their bin sequence
    * would otherwise count DOWN (the Spark sequence() footgun).
    *
    * Column names must be disjoint across the two sides (the output
    * is left row ++ right row, inner semantics). Same binWidth
    * tradeoff as [[pointInInterval]]. */
  def intervalOverlap(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      binWidth: Long,
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binOf(c: Column) = floor(c / binWidth).cast("long")
    def explodeBins(df: DataFrame, s: String, e: String) =
      df
        .filter(col(e) > col(s))
        .withColumn("_bin",
          explode(sequence(binOf(col(s)), binOf(col(e)))))
    explodeBins(left, lStart, lEnd)
      .join(explodeBins(right, rStart, rEnd), Seq("_bin"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      // first-shared-bin rule: emit each overlapping pair exactly once
      .filter(col("_bin") === greatest(binOf(col(lStart)), binOf(col(rStart))))
      .drop("_bin")
  }
}
