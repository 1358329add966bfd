package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the shuffle-side complement to
  * broadcast joins. A fact–dim equi-join where the dim is too big to
  * broadcast pays a full shuffle of the fact side; but the dim's KEY
  * SET usually compresses into a few-MB Bloom filter, and filtering
  * the fact side against it BEFORE the shuffle means non-matching fact
  * rows (often the vast majority after dim-side predicates) are never
  * serialized, never shuffled, never sorted. This is exactly what
  * Spark's AQE runtime row-level filter injects opportunistically;
  * the helper makes it explicit and unconditional, built on the same
  * engine machinery ([[org.apache.spark.sql.catalyst.expressions
  * .aggregate.BloomFilterAggregate]] / [[org.apache.spark.sql.catalyst
  * .expressions.BloomFilterMightContain]] — codegen'd, xxhash64-keyed).
  *
  * The sketch itself passes through the driver as a constant-size
  * byte array (like the IVF centroid hop: size is set by
  * `expectedItems`/fpp, never by data volume) and embeds in the fact
  * filter as a literal. False positives only cost unpruned rows (the
  * join stays exact); false negatives cannot occur. */
object Bloom {

  import org.apache.spark.sql.GraftBridge.{toColumn, toExpr}

  /** One distributed aggregate over the dim side → the serialized
    * Bloom filter of xxhash64(key). ~1.2 MB per million expected keys
    * at the default 3% fpp. */
  def buildKeyFilter(
      dim: DataFrame,
      key: String,
      expectedItems: Long = 1000000L,
  ): Array[Byte] = {
    val agg = new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      toExpr(xxhash64(col(key))), expectedItems).toAggregateExpression()
    dim.select(toColumn(agg)).head().getAs[Array[Byte]](0)
  }

  /** Membership probe against a built filter — a codegen'd engine
    * expression, usable anywhere a Column is. An EMPTY dim side yields
    * a null filter from the aggregate; membership is then vacuously
    * false (the join would produce nothing anyway). */
  def mightContain(filter: Array[Byte], key: Column): Column =
    if (filter == null) lit(false)
    else toColumn(new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      toExpr(lit(filter)), toExpr(xxhash64(key))))

  /** The composed pattern: build the filter from the dim's keys,
    * pre-filter the fact side, then run the ordinary equi-join. The
    * join result is EXACTLY the plain join's (no false negatives);
    * the difference is how many fact rows reach the shuffle. */
  def prunedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      expectedItems: Long = 1000000L,
  ): DataFrame = {
    val bf = buildKeyFilter(dim, key, expectedItems)
    fact.filter(mightContain(bf, col(key))).join(dim, Seq(key))
  }
}
