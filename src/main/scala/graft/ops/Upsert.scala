package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert / keep-last dedup — the reference's W1+U1
  * (/root/reference/lambda.py:179-181): concat existing-then-incoming,
  * `drop_duplicates(subset=['uuid'], keep='last')`, so incoming beats
  * existing and later rows within the batch beat earlier ones.
  *
  * pandas' positional "last" is undefined under Spark partitioning
  * (SURVEY.md §7.4 risk 1), so the ordinal is explicit: a source rank
  * (existing=0, incoming=1) plus an optional caller-supplied within-
  * batch ordinal column. NOT `dropDuplicates` — that keeps an
  * arbitrary row.
  *
  * Scale shape: one shuffle on the key (window partitionBy); no
  * driver-side state. For small incoming batches the anti-join form
  * with `broadcast(incoming)` avoids shuffling the big side entirely
  * when the existing table is already bucketed by the key.
  */
object Upsert {

  /** Generic keep-last: one row per key set, winner = max ordinal.
    * Ties broken by... nothing — callers must supply a total ordinal
    * per key (tests enforce this). */
  def keepLast(df: DataFrame, keys: Seq[String], ordinal: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordinal.desc)
    df.withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
      .drop("_graft_rn")
  }

  /** Reference-exact upsert: incoming rows replace existing rows with
    * the same key; within incoming, `ordinalInBatch` decides (defaults
    * to a constant, i.e. "any incoming row", which is only safe when
    * the batch itself is key-unique — the validator guarantees that).
    *
    * Schema widening is allowed (`allowMissingColumns`): a batch that
    * ADDS a column upserts cleanly, existing rows carry null in the
    * new column — the standard lake evolution contract. A batch that
    * silently DROPS columns also unions (its rows get nulls), which
    * keepLast then propagates for replaced keys; stores guard against
    * that where it matters. */
  def upsert(
      existing: DataFrame,
      incoming: DataFrame,
      key: String,
      ordinalInBatch: Option[Column] = None,
  ): DataFrame = {
    val rank = ordinalInBatch.getOrElse(lit(0L))
    val tagged = existing.withColumn("_graft_src", lit(0L)).withColumn("_graft_ord", lit(0L))
      .unionByName(
        incoming.withColumn("_graft_src", lit(1L)).withColumn("_graft_ord", rank.cast("long")),
        allowMissingColumns = true)
    keepLast(tagged, Seq(key), struct(col("_graft_src"), col("_graft_ord")))
      .drop("_graft_src", "_graft_ord")
  }

  /** Equivalent anti-join form: existing ⟕anti incoming, then union.
    * Correct only when incoming is key-unique (validator-guaranteed).
    * `broadcastIncoming` skips the shuffle of the (big) existing side
    * when the batch is small — the common ETL case. */
  def upsertAntiJoin(
      existing: DataFrame,
      incoming: DataFrame,
      key: String,
      broadcastIncoming: Boolean = true,
  ): DataFrame = {
    val inc = if (broadcastIncoming) broadcast(incoming) else incoming
    existing.join(inc.select(key), Seq(key), "left_anti").unionByName(incoming)
  }
}
