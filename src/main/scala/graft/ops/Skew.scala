package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the one window-shaped weakness AQE
  * does not cover (AQE splits skewed JOIN partitions, but a window
  * over a pathologically hot partition key still lands every row of
  * that key in one task; docs/SCALE.md §8 item 2).
  *
  * Both helpers use the standard two-phase salt: phase 1 computes a
  * partial result per (key, salt) — `salts`-way parallel for the hot
  * key — and phase 2 merges the ≤ `salts` partials per key. Correct
  * for any associative reduction; keep-last qualifies because "row
  * with max ordinal" is an associative argmax.
  *
  * The salt is derived from a hash of the full row's ordinal (not
  * `rand()`): deterministic → retryable tasks produce identical
  * output, and the oracle/test can replay it.
  */
object Skew {

  /** The shared salt derivation: a hash of the caller-supplied per-row
    * ordinal, folded into `salts` buckets. Derived from the ordinal —
    * never from an aggregate's value column — because the canonical
    * skew case is millions of IDENTICAL rows under one hot key: a
    * value-derived salt would hash them all to one bucket and spread
    * nothing. Any per-row-distinct-ish column qualifies (an event id,
    * a file offset, a timestamp). */
  def salt(ordinal: Column, salts: Int): Column =
    pmod(xxhash64(ordinal), lit(salts.toLong))

  /** Keep-last (max-ordinal row per key) with salted two-phase
    * windows. Equivalent to [[Upsert.keepLast]] when `ordinal` is a
    * total order per key; the hot key's rows spread over `salts`
    * tasks in phase 1. */
  def saltedKeepLast(
      df: DataFrame,
      keys: Seq[String],
      ordinal: Column,
      salts: Int = 16,
  ): DataFrame = {
    val salted = df.withColumn("_graft_salt", salt(ordinal, salts))
    val phase1 = Window
      .partitionBy((keys.map(col) :+ col("_graft_salt")): _*)
      .orderBy(ordinal.desc)
    val phase2 = Window.partitionBy(keys.map(col): _*).orderBy(ordinal.desc)
    salted
      .withColumn("_graft_rn1", row_number().over(phase1))
      .filter(col("_graft_rn1") === 1) // ≤ salts survivors per key
      .withColumn("_graft_rn2", row_number().over(phase2))
      .filter(col("_graft_rn2") === 1)
      .drop("_graft_salt", "_graft_rn1", "_graft_rn2")
  }

  /** Salted two-phase sum/count/min/max aggregation: phase 1 partials
    * per (key, salt), phase 2 merge per key. `aggs` maps output name →
    * (valueColumn, "sum" | "count" | "min" | "max"). The phase-1
    * shuffle spreads a hot key across `salts` reducers; phase 2 only
    * sees ≤ salts rows per key. `ordinal` is any per-row-distinct-ish
    * column (event id, offset) the salt is derived from — see [[salt]]
    * for why it must not be an aggregated value column. (For
    * non-skewed data Spark's own partial aggregation already does this
    * map-side — use this ONLY when one key overwhelms a single
    * reducer.) */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      ordinal: Column,
      aggs: Map[String, (Column, String)],
      salts: Int = 16,
  ): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregate required")
    val salted = df.withColumn("_graft_salt", salt(ordinal, salts))
    val partial = aggs.toSeq.map { case (name, (c, kind)) =>
      (kind match {
        case "sum"   => sum(c)
        case "count" => count(c)
        case "min"   => min(c)
        case "max"   => max(c)
        case other   => throw new IllegalArgumentException(s"unsupported agg: $other")
      }).as(s"_p_$name")
    }
    val merge = aggs.toSeq.map { case (name, (_, kind)) =>
      (kind match {
        case "sum" | "count" => sum(col(s"_p_$name"))
        case "min"           => min(col(s"_p_$name"))
        case "max"           => max(col(s"_p_$name"))
      }).as(name)
    }
    salted
      .groupBy((keys.map(col) :+ col("_graft_salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
