package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines:
  * train/val/test assignment as a PURE FUNCTION of the row key and a
  * salt — no RNG, no state. The properties that matter at scale:
  *
  *   - stable: re-running (or re-reading on another cluster) assigns
  *     every row identically — eval sets never bleed into train
  *     between pipeline runs;
  *   - salt-keyed: a new salt is a fresh independent split without
  *     touching the data;
  *   - map-side: a projection, no shuffle, no sampling pass.
  *
  * Uses the md5-based [[TextOps.hash60]] family so assignments are
  * reproducible OUTSIDE Spark too (the DuckDB oracle replays them
  * bit-for-bit in q31 — ops teams can audit a split with any SQL
  * engine).
  */
object Splits {

  val Buckets = 10000L // assignment granularity: 0.01% steps

  /** Bucket in [0, Buckets) for a key column — the shared primitive. */
  def bucketOf(id: Column, salt: String): Column =
    pmod(TextOps.hash60(concat(lit(salt), lit(":"), id.cast("string"))), lit(Buckets))

  /** Split-name column from cumulative weight thresholds. `weights`
    * need not sum to 1 — they are normalized; order matters (splits
    * are assigned in the given order). */
  def assign(
      id: Column,
      weights: Seq[(String, Double)],
      salt: String = "split",
  ): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "positive weights required")
    val total = weights.map(_._2).sum
    val cuts = weights
      .scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail
      .map(f => math.round(f * Buckets))
    val b = bucketOf(id, salt)
    weights.map(_._1).zip(cuts).reverse.foldLeft(lit(weights.last._1)) {
      case (els, (name, cut)) => when(b < cut, lit(name)).otherwise(els)
    }
  }

  /** Deterministic stratified sampling: keep each row with a
    * per-stratum rate — the corpus-rebalancing op (downsample the
    * over-represented language, keep the rare ones). Same hash-bucket
    * machinery as [[assign]], so the SAME rows are kept on every run
    * and engine; map-side filter, no sampling pass. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      salt: String = "sample",
  ): DataFrame = {
    val cut = rates.foldLeft(lit(math.round(defaultRate * Buckets)): Column) {
      case (els, (k, r)) =>
        when(col(strataCol) === k, lit(math.round(r * Buckets))).otherwise(els)
    }
    df.filter(bucketOf(col(idCol), salt) < cut)
  }

  /** Materialized split column on a frame. */
  def withSplit(
      df: DataFrame,
      idCol: String,
      weights: Seq[(String, Double)] = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      salt: String = "split",
  ): DataFrame =
    df.withColumn("split", assign(col(idCol), weights, salt))
}
