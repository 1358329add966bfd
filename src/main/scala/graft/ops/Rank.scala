package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{JoinedRow, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed GLOBAL ranking — the single-partition-window killer.
  *
  * The idiomatic `row_number() OVER (ORDER BY ...)` with no PARTITION
  * BY plans a SinglePartition exchange: the entire dataset serializes
  * through one task — the canonical 100 TB cliff, and the same hazard
  * `NTILE`, global `percent_rank`, and "add a row id" hide. This
  * computes the identical 1-based rank the scale-safe way (the
  * [[graft.llm.Splits.packSequences]] prefix-sum pattern, weight = 1):
  *
  *   1. range-repartition on the order columns (sampled boundaries →
  *      balanced partitions whatever the input layout);
  *   2. per-partition row counts — ONE driver hop of #partitions longs;
  *   3. per-partition running offsets assign each row its rank.
  *
  * The rank walk runs in INTERNAL-row terms end to end: the sorted
  * plan's `toRdd` feeds an UnsafeProjection that appends the rank
  * column, and the result re-enters SQL via the internal-rows
  * constructor — no external Row materializes anywhere, so the ranked
  * frame's consumers read UnsafeRows and stay inside whole-stage
  * codegen (plan-audited on q72) instead of paying the interpreted
  * Row→Catalyst converter `createDataFrame(RDD[Row], …)` threads
  * through every row and field.
  *
  * `orderCols` must be a TOTAL order (tie-break on a key column, same
  * rule every catalog query follows); given that, ranks are unique,
  * dense, reproducible on any cluster, and a SQL engine's ROW_NUMBER
  * replays them exactly (the q72 oracle).
  */
object Rank {

  /** Appends 1-based `rank` under the total order `orderCols`. */
  def globalRank(df: DataFrame, orderCols: Seq[String]): DataFrame =
    globalRankWithCount(df, orderCols)._1

  /** [[globalRank]] also returning the TOTAL row count — already in
    * hand as the sum of the per-partition sizes, so callers needing N
    * ([[curriculum]]'s phase arithmetic) skip a whole extra pass. */
  def globalRankWithCount(
      df: DataFrame,
      orderCols: Seq[String],
  ): (DataFrame, Long) = {
    require(orderCols.nonEmpty, "need at least one order column")
    val spark = df.sparkSession
    // two passes walk the same sorted partitions (counts, then rank
    // assignment) — lazy checkpoint shares one materialization
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .localCheckpoint(false)
    val internal = sorted.queryExecution.toRdd
    val sizes = internal
      .mapPartitions(it => Iterator(it.size.toLong), preservesPartitioning = true)
      .collect()
    val starts = sizes.scanLeft(0L)(_ + _)
    val outSchema =
      StructType(sorted.schema :+ StructField("rank", LongType, nullable = false))
    val rows = internal.mapPartitionsWithIndex { case (p, it) =>
      val proj = UnsafeProjection.create(outSchema)
      val joined = new JoinedRow
      val rankRow = new SpecificInternalRow(Seq(LongType))
      var acc = starts(p)
      it.map { r =>
        acc += 1
        rankRow.setLong(0, acc)
        proj(joined(r, rankRow)): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    (org.apache.spark.sql.GraftBridge.internalCreateDataFrame(spark, rows, outSchema),
      sizes.sum)
  }

  /** Order-preserving global PREFIX SUM of a long weight column —
    * [[globalRank]] is this at weight 1 (and
    * [[graft.llm.Splits.packSequences]] is this at weight = token
    * count, specialized): appends `cum`, the INCLUSIVE running sum of
    * `weightCol` under the total order `orderCols`, plus returns the
    * grand total (already in hand from the partition-sizes hop).
    * Same shape as the rank walk: range repartition, one
    * #partitions-longs driver hop, internal-row append — consumers
    * stay codegen'd. */
  def prefixSumWithTotal(
      df: DataFrame,
      orderCols: Seq[String],
      weightCol: String,
  ): (DataFrame, Long) = {
    require(orderCols.nonEmpty, "need at least one order column")
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .localCheckpoint(false)
    val wIdx = sorted.schema.fieldIndex(weightCol)
    require(sorted.schema(wIdx).dataType == LongType,
      s"$weightCol must be LongType (cast up front), got ${sorted.schema(wIdx).dataType}")
    val internal = sorted.queryExecution.toRdd
    val sums = internal
      .mapPartitions(it => Iterator(it.map(_.getLong(wIdx)).sum),
        preservesPartitioning = true)
      .collect()
    val starts = sums.scanLeft(0L)(_ + _)
    val outSchema =
      StructType(sorted.schema :+ StructField("cum", LongType, nullable = false))
    val rows = internal.mapPartitionsWithIndex { case (p, it) =>
      val proj = UnsafeProjection.create(outSchema)
      val joined = new JoinedRow
      val cumRow = new SpecificInternalRow(Seq(LongType))
      var acc = starts(p)
      it.map { r =>
        acc += r.getLong(wIdx)
        cumRow.setLong(0, acc)
        proj(joined(r, cumRow)): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    (org.apache.spark.sql.GraftBridge.internalCreateDataFrame(spark, rows, outSchema),
      sums.sum)
  }

  /** Curriculum phase assignment on top of [[globalRank]]: rows split
    * into `phases` contiguous rank ranges (floor distribution —
    * phase = (rank−1)·phases div N), the "train on short docs first"
    * schedule when ordered by length. N rides the partition-size
    * collect the rank already does — no extra job; the phase itself
    * is a map-side integral expression — `div`, not `/`, so ranks
    * past 2^53 stay exact. */
  def curriculum(df: DataFrame, orderCols: Seq[String], phases: Int): DataFrame = {
    require(phases >= 1, s"phases must be >= 1, got $phases")
    val (ranked, n0) = globalRankWithCount(df, orderCols)
    val n = math.max(n0, 1L)
    ranked.withColumn("phase",
      expr(s"((rank - 1) * $phases) div ${n}L").cast("int"))
  }
}
