package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver testdata tables (TESTDATA.md) plus numeric
  * helpers that keep aggregates bit-exact across engines.
  *
  * All double measure columns in the testdata are exact 2-decimal values,
  * so summing them as DECIMAL(18,2) is exact (no float summation-order
  * drift) in both Spark and DuckDB; casting the exact decimal back to
  * double yields the identical IEEE value in both engines. That makes
  * the driver's hash-compare deterministic while staying cheap: the
  * decimal path is only in the oracle-facing query definitions.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** The events stream table, with `ts` NORMALIZED to epoch-nanosecond
    * long regardless of how the driver generated the parquet. Earlier
    * testdata builds wrote TIMESTAMP(NANOS) (unreadable as a timestamp
    * by Spark → sessions set `nanosAsLong` and the column arrived as
    * epoch-ns long); the round-13 regeneration writes timestamp[us].
    * Every catalog query and its DuckDB oracle (`epoch_ns(ts)`) is
    * defined over epoch-ns, so the loader adapts: long passes through,
    * timestamp converts via unix_micros (exact — micros source) ×1000.
    * NTZ→TIMESTAMP cast is identity under the UTC session TZ all
    * entrypoints pin. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** 2-decimal money type: exact for every measure column in the testdata. */
  val dec2: DecimalType = DecimalType(18, 2)

  /** Exact sum of a 2-decimal double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(dec2)).cast("double")

  /** Exact-sum average of a 2-decimal double column (nulls excluded from
    * both numerator and denominator, matching pandas mean / SQL AVG). */
  def davg(c: Column): Column = sum(c.cast(dec2)).cast("double") / count(c)

  /** Exact sum of extendedprice*(1-discount)-style products: both factors
    * 2-decimal, product 4-decimal, still exact decimal arithmetic. */
  def dsumProduct(a: Column, b: Column): Column =
    sum(a.cast(dec2) * b.cast(dec2)).cast("double")
}
