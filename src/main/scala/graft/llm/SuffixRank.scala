package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed suffix ranking by PREFIX DOUBLING — the suffix-array
  * family operator, completing the substring-dedup ladder above the
  * fixed-w window hashes ([[Dedup.repeatedPassages]]) and the
  * multi-width sweep ([[Dedup.repeatedSegmentsSweep]]): those detect
  * repeats at w-token resolution with hash confidence; suffix ranks
  * are EXACT (no hashing anywhere) and, fully doubled, order every
  * suffix lexicographically.
  *
  * The classic construction, re-expressed relationally: every (doc,
  * pos) token suffix starts ranked by its first token; each round
  * re-ranks by the pair (rank of first half, rank of second half) of
  * a window twice as long, so after round k equal ranks mean equal
  * first 2^k tokens — and once all ranks are distinct, rank order IS
  * lexicographic suffix order (the suffix array). O(log maxDocLen)
  * rounds; each round is one self-join on the shifted position plus
  * one dense-rank (sort + zipWithIndex + join back — all distributed,
  * nothing driver-sized except the round counter).
  *
  * Out-of-doc positions rank 0 (< every real rank), the standard
  * sentinel convention: a suffix that is a proper prefix of another
  * sorts first. Suffixes never cross document boundaries.
  *
  * Scale: rows = total corpus tokens. Each round shuffles (id, pos,
  * rank) triples — ~24 bytes a row, text never moves after the one
  * tokenization pass. The log-round trade is the same one the
  * star-contraction CC makes: more rounds than a hash approach, but
  * an exactness no hash family gives. */
object SuffixRank {

  /** Dense rank of distinct (a, b) long pairs, 1-based: sort the
    * distinct pairs, number them contiguously, join back. The sort is
    * range-partitioned and zipWithIndex is per-partition arithmetic —
    * no single-reducer window anywhere. */
  private def denseRankPairs(spark: SparkSession, pairs: DataFrame): DataFrame = {
    val distinctSorted = pairs.select(col("a"), col("b")).distinct().orderBy("a", "b")
    val ranked = distinctSorted.rdd.zipWithIndex().map { case (r, i) =>
      Row(r.getLong(0), r.getLong(1), i + 1L)
    }
    spark.createDataFrame(ranked, StructType(Seq(
      StructField("a", LongType), StructField("b", LongType),
      StructField("rank", LongType))))
  }

  /** (id, pos, t) token table → seed ranks from sorted distinct
    * token strings (exact, 1-based). */
  private def seedRanks(spark: SparkSession, tok: DataFrame): DataFrame = {
    val distinctSorted = tok.select(col("t")).distinct().orderBy("t")
    val ranked = distinctSorted.rdd.zipWithIndex().map { case (r, i) =>
      Row(r.getString(0), i + 1L) }
    val tokRank = spark.createDataFrame(ranked, StructType(Seq(
      StructField("t", StringType), StructField("rank", LongType))))
    tok.join(tokRank, "t").select(col("id"), col("pos"), col("rank"))
  }

  /** One doubling step: re-rank every position by (its rank, the rank
    * `off` positions later, 0 past the doc end). After the step equal
    * ranks ⟺ equal first 2·off tokens (sentinel-padded). */
  private def doubleOnce(spark: SparkSession, cur: DataFrame, off: Long): DataFrame = {
    val right = cur.select(col("id"), (col("pos") - off.toInt).as("pos"),
      col("rank").as("rank2"))
    val paired = cur.join(right, Seq("id", "pos"), "left")
      .select(col("id"), col("pos"), col("rank").as("a"),
        coalesce(col("rank2"), lit(0L)).as("b"))
    paired.join(denseRankPairs(spark, paired.select(col("a"), col("b"))), Seq("a", "b"))
      .select(col("id"), col("pos"), col("rank"))
      .localCheckpoint()
  }

  private def tokenize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "t")))
      .localCheckpoint()

  /** (idCol, pos [0-based token index], rank) for every token suffix;
    * rank order == lexicographic suffix order over whitespace tokens,
    * ranks dense in [1, #suffixes] across the whole corpus. Doubling
    * stops as soon as all ranks are distinct. */
  def suffixRanks(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    val tok = tokenize(df, idCol, textCol)
    val total = tok.count()
    if (total == 0)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Seq(
        StructField(idCol, LongType), StructField("pos", IntegerType),
        StructField("rank", LongType))))
    var cur = seedRanks(spark, tok).localCheckpoint()
    var off = 1L
    while (cur.select(col("rank")).distinct().count() < total) {
      cur = doubleOnce(spark, cur, off)
      off *= 2
    }
    cur.withColumnRenamed("id", idCol)
  }

  /** EXACT cross-document repeated windows of `windowTokens` tokens
    * (must be a power of two — the doubling levels are the equality
    * certificates; use [[Dedup.repeatedPassages]] for arbitrary w at
    * hash confidence). Doubles only up to the requested level, then
    * groups FULL windows by that level's rank: for full windows no
    * sentinel ever enters the rank chain, so rank equality ⟺ the
    * `windowTokens`-token windows are identical — zero false
    * positives, zero false negatives, no hashing.
    *
    * Output: one row per (doc, pos) window occurrence that some OTHER
    * doc shares, with its equality class id and the class's distinct
    * doc count. */
  def crossDocRepeats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int,
  ): DataFrame = {
    require(windowTokens >= 1 && Integer.bitCount(windowTokens) == 1,
      s"windowTokens must be a power of two, got $windowTokens")
    val spark = df.sparkSession
    val tok = tokenize(df, idCol, textCol)
    var cur = seedRanks(spark, tok).localCheckpoint()
    var off = 1L
    while (off < windowTokens) {
      cur = doubleOnce(spark, cur, off)
      off *= 2
    }
    // only FULL windows: a short tail's sentinel-padded rank may only
    // equal another identical short tail's — exact but shorter than
    // the contract, so excluded
    val full = cur.join(
        tok.groupBy(col("id")).agg(max(col("pos")).as("last")), "id")
      .filter(col("pos") + windowTokens - 1 <= col("last"))
    val wh = org.apache.spark.sql.expressions.Window.partitionBy(col("rank"))
    full
      .withColumn("n_docs",
        size(array_distinct(collect_list(col("id")).over(wh))))
      .filter(col("n_docs") >= 2)
      .select(col("id").as(idCol), col("pos"),
        col("rank").as("window_class"), col("n_docs"))
  }
}
