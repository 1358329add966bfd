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
  * first 2^k tokens — and once no round refines further, rank order
  * IS lexicographic suffix order. O(log maxDocLen) rounds; each round
  * is one self-join on the shifted position plus one dense-rank (sort
  * + zipWithIndex + join back — all distributed, nothing driver-sized
  * except the round counter).
  *
  * Out-of-doc positions rank 0 (< every real rank), the standard
  * sentinel convention: a suffix that is a proper prefix of another
  * sorts first. Suffixes never cross document boundaries.
  *
  * Termination: the loop stops at a FIXPOINT — when a round's rank
  * count stops growing (no pair of tied suffixes was split) — or once
  * the certified window already covers the longest document. Tied
  * ranks can legitimately survive to the fixpoint: two IDENTICAL
  * suffixes in different documents (duplicate docs, or just a shared
  * final token) compare equal at every level and keep one shared
  * rank; ranks are then dense in [1, #distinct suffix contents].
  * The rank count comes out of the dense-rank step itself (the
  * materialized distinct-key table's row count) — no separate
  * distinct-count job per round.
  *
  * Scale: rows = total corpus tokens. Each round shuffles (id, pos,
  * rank) triples — ~24 bytes a row, text never moves after the one
  * tokenization pass. The log-round trade is the same one the
  * star-contraction CC makes: more rounds than a hash approach, but
  * an exactness no hash family gives. */
object SuffixRank {

  /** Contiguous 0-based index over an already-sorted, materialized
    * DataFrame: one small partition-sizes job (the only driver hop —
    * #partitions longs), then per-partition offset arithmetic. Does
    * the work of `count()` + `zipWithIndex` in a single pass over the
    * materialized partitions; returns (row, index) plus the total. */
  private def indexSorted(df: DataFrame): (org.apache.spark.rdd.RDD[(Row, Long)], Long) = {
    val rdd = df.rdd
    val sizes = rdd.mapPartitions(it => Iterator(it.size.toLong), true).collect()
    val offsets = sizes.scanLeft(0L)(_ + _)
    val indexed = rdd.mapPartitionsWithIndex { case (p, it) =>
      var k = offsets(p)
      it.map { r => val out = (r, k); k += 1L; out }
    }
    (indexed, offsets.last)
  }

  /** Dense rank of distinct (a, b) long pairs, 1-based, plus the rank
    * count: sort the distinct pairs, number them contiguously, join
    * back. The sort is range-partitioned and the numbering is
    * per-partition arithmetic ([[indexSorted]]) — no single-reducer
    * window anywhere. The sorted distinct table is localCheckpoint-ed
    * so the sizes pass and the join-back probe reuse one
    * materialization instead of re-sorting. */
  private def denseRankPairs(spark: SparkSession, pairs: DataFrame): (DataFrame, Long) = {
    val distinctSorted = pairs.select(col("a"), col("b")).distinct().orderBy("a", "b")
      .localCheckpoint(false)
    val (indexed, nRanks) = indexSorted(distinctSorted)
    val ranked = indexed.map { case (r, i) => Row(r.getLong(0), r.getLong(1), i + 1L) }
    (spark.createDataFrame(ranked, StructType(Seq(
      StructField("a", LongType), StructField("b", LongType),
      StructField("rank", LongType)))), nRanks)
  }

  /** (id, pos, t) token table → seed ranks from sorted distinct
    * token strings (exact, 1-based), plus the distinct-token count. */
  private def seedRanks(spark: SparkSession, tok: DataFrame): (DataFrame, Long) = {
    val distinctSorted = tok.select(col("t")).distinct().orderBy("t").localCheckpoint(false)
    val (indexed, nRanks) = indexSorted(distinctSorted)
    val ranked = indexed.map { case (r, i) => Row(r.getString(0), i + 1L) }
    val tokRank = spark.createDataFrame(ranked, StructType(Seq(
      StructField("t", StringType), StructField("rank", LongType))))
    (tok.join(tokRank, "t").select(col("id"), col("pos"), col("rank")), nRanks)
  }

  /** Above this many tokens in ONE document, [[doubleOnce]] trades its
    * per-doc window for the shifted self-join: the window serializes a
    * doc into a single task per round — fine for web-page-sized docs,
    * a straggler once a single doc approaches a partition's worth of
    * tokens (book-length concatenations, log dumps). Both entry points
    * ([[allLevels]] and [[crossDocRepeats]], including its seed) make
    * the SAME decision from the same corpus-wide max-doc-length probe.
    * `private[graft] var` is a test seam only: the equivalence spec
    * lowers it to force the join path onto small fixtures and restores
    * it — production code never writes it. */
  private[graft] var LongDocThreshold = 1L << 22

  /** One doubling step: re-rank every position by (its rank, the rank
    * `off` positions later, 0 past the doc end). After the step equal
    * ranks ⟺ equal first 2·off tokens (sentinel-padded). Returns the
    * re-ranked table and the new rank count.
    *
    * The shifted-rank lookup is `lead(rank, off)` over a per-doc
    * window — positions are contiguous 0..len−1 within a doc and
    * suffixes never cross doc boundaries, so the row `off` places
    * later IS pos+off. One keyed exchange on the doc id (per-doc
    * state, never global) instead of the two-sided self-join on
    * (id, pos) the classic formulation writes. The window puts a whole
    * doc in one task, so above [[LongDocThreshold]] tokens-per-doc the
    * caller sets `viaJoin` and the step runs the classic self-join
    * instead — two-sided shuffle on (id, pos) hash, which spreads even
    * a single enormous doc across the cluster. */
  private def doubleOnce(
      spark: SparkSession, cur: DataFrame, off: Long,
      viaJoin: Boolean = false): (DataFrame, Long) = {
    // checkpointed because three consumers walk it (the range sampler,
    // the distinct+sort, the join-back) — one pass, not three
    val paired = (if (viaJoin) {
      val shifted = cur.select(col("id"), (col("pos") - off.toInt).as("pos"),
        col("rank").as("b"))
      cur.select(col("id"), col("pos"), col("rank").as("a"))
        .join(shifted, Seq("id", "pos"), "left")
        .select(col("id"), col("pos"), col("a"),
          coalesce(col("b"), lit(0L)).as("b"))
    } else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy("pos")
      cur.select(col("id"), col("pos"), col("rank").as("a"),
        coalesce(lead(col("rank"), off.toInt).over(w), lit(0L)).as("b"))
    }).localCheckpoint(false)
    val (rankTab, nRanks) = denseRankPairs(spark, paired.select(col("a"), col("b")))
    (paired.join(rankTab, Seq("a", "b"))
      .select(col("id"), col("pos"), col("rank"))
      .localCheckpoint(false), nRanks)
  }

  private def tokenize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "t")))
      .localCheckpoint(false)

  /** Fully-doubled rank tables, one per level: `levels(k)` is (id,
    * pos, rank) where rank equality certifies equal 2^k-token
    * (sentinel-padded) windows. Runs to the refinement fixpoint (or
    * until the window covers the longest document); each level is
    * localCheckpoint-ed, so keeping all of them costs O(log maxLen)
    * copies of the ~24-byte-row rank table — the price of exact LCP
    * descent later, not of the ranking itself. */
  private def allLevels(spark: SparkSession, tok: DataFrame, total: Long): Seq[DataFrame] = {
    val maxLen = tok.agg(max(col("pos"))).head.getInt(0) + 1L
    val viaJoin = maxLen > LongDocThreshold
    var (cur0, nRanks) = seedRanks(spark, tok)
    val levels = scala.collection.mutable.ArrayBuffer(cur0.localCheckpoint(false))
    var off = 1L // certified window length of the current ranks
    var prev = 0L
    while (nRanks < total && nRanks > prev && off < maxLen) {
      prev = nRanks
      val (next, n) = doubleOnce(spark, levels.last, off, viaJoin)
      levels += next
      nRanks = n
      off *= 2
    }
    // A fixpoint stop means the last round refined NOTHING: the top
    // level partitions suffixes exactly like the level before it (its
    // dense ranks are even numerically identical — same order, same
    // classes). It is redundant both as the final ranking and as a
    // descent level (a top match ⟺ a pre-top match), so drop it —
    // one fewer materialized level and two fewer descent joins. The
    // fixpoint property transfers: equal ranks at the NEW top still
    // mean suffixes identical to their ends.
    if (levels.length >= 2 && nRanks == prev) levels.dropRight(1).toSeq
    else levels.toSeq
  }

  /** (idCol, pos [0-based token index], rank) for every token suffix;
    * rank order == lexicographic suffix order over whitespace tokens.
    * Identical suffixes in DIFFERENT documents (duplicate docs, or a
    * shared tail as short as one token) share a rank — ranks are
    * dense in [1, #distinct suffix contents], which is < #suffixes
    * exactly when such cross-doc ties exist. Doubling stops at the
    * refinement fixpoint (or once the window covers the longest doc),
    * so tied corpora terminate in O(log maxDocLen) rounds too. */
  def suffixRanks(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    val tok = tokenize(df, idCol, textCol)
    val total = tok.count()
    if (total == 0)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Seq(
        StructField(idCol, LongType), StructField("pos", IntegerType),
        StructField("rank", LongType))))
    allLevels(spark, tok, total).last.withColumnRenamed("id", idCol)
  }

  /** Arbitrary-length EXACT maximal cross-document repeats — the top
    * of the substring-dedup ladder. For every pair of suffixes that
    * are ADJACENT in generalized suffix order (ties broken by (doc,
    * pos)) and come from different documents, emits the length of
    * their longest common prefix, keeping only matches that are
    * left-maximal (the preceding tokens differ, or a side starts at
    * pos 0) and at least `minTokens` long. Right-maximality is the
    * LCP definition itself. The longest substring shared by any two
    * documents always surfaces: every cross-doc shared prefix spans
    * an interval of the suffix order that contains an adjacent
    * cross-doc pair with at least that LCP.
    *
    * LCP is computed by binary descent over the doubling levels the
    * ranking already materialized — per level one keyed lookup join
    * per side, never a token-by-token comparison, so a pair's cost is
    * O(log maxDocLen) regardless of how long the repeat is. All
    * shuffles carry (id, pos, rank/acc) rows; text never moves after
    * tokenization. Output: (idCol, pos, match_doc, match_pos,
    * lcp). */
  def maximalCrossDocRepeats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int,
  ): DataFrame = {
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    val spark = df.sparkSession
    val tok = tokenize(df, idCol, textCol)
    val total = tok.count()
    if (total == 0)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Seq(
        StructField(idCol, LongType), StructField("pos", IntegerType),
        StructField("match_doc", LongType), StructField("match_pos", IntegerType),
        StructField("lcp", IntegerType))))
    val levels = allLevels(spark, tok, total)

    // global suffix order (rank, id, pos) → contiguous index, by the
    // same range-partitioned sort + zipWithIndex the ranking uses
    val ordered = levels.last.orderBy("rank", "id", "pos").localCheckpoint(false)
    val indexed = spark.createDataFrame(
      indexSorted(ordered)._1.map { case (r, i) =>
        Row(r.getLong(0), r.getInt(1), i)
      },
      StructType(Seq(StructField("id", LongType), StructField("pos", IntegerType),
        StructField("idx", LongType))))

    // adjacent cross-doc pairs only — the candidate set shrinks before
    // any LCP work happens
    val a = indexed.select(col("id").as("ida"), col("pos").as("posa"), col("idx"))
    val b = indexed.select(col("id").as("idb"), col("pos").as("posb"),
      (col("idx") - 1).as("idx"))
    var pairs = a.join(b, "idx").filter(col("ida") =!= col("idb")).drop("idx")
      .withColumn("acc", lit(0))

    // Gate BEFORE the descent: lcp >= minTokens requires EQUAL ranks at
    // offset 0 on level g, the highest level whose certified window
    // 2^g <= minTokens. Sound at every stop condition of the doubling
    // loop — when g < topK it is the definition of level-g ranks, and
    // when g == topK (minTokens beyond the top window) equal top ranks
    // ⟺ identical suffixes while NON-identical adjacent suffixes
    // provably diverge inside the certified window. One keyed join
    // kills the vast majority of adjacent pairs (neighbors in a
    // natural corpus's suffix order rarely share minTokens tokens);
    // the SURVIVORS' doc set then semi-join-prunes every level table
    // the descent touches, so the 2·log(maxLen) descent joins shuffle
    // candidate docs' rank rows only, never the corpus — what makes
    // FULL-corpus runs viable (SCALE.md §5). Dropped pairs could never
    // pass the final lcp >= minTokens filter, so output is unchanged.
    val topK = levels.indices.last
    val g = math.min(
      63 - java.lang.Long.numberOfLeadingZeros(minTokens.toLong), topK.toLong).toInt
    pairs = pairs
      .join(levels(g).select(col("id").as("ida"), col("pos").as("posa"),
        col("rank").as("ra")), Seq("ida", "posa"))
      .join(levels(g).select(col("id").as("idb"), col("pos").as("posb"),
        col("rank").as("rb")), Seq("idb", "posb"))
      .filter(col("ra") === col("rb")).drop("ra", "rb")
      .localCheckpoint()
    val candDocs = pairs.select(col("ida").as("id"))
      .union(pairs.select(col("idb").as("id"))).distinct().localCheckpoint()
    // LAZY checkpoints: each pruned level is probed twice by one
    // descent round (the la/lb sides), so caching pays — but an EAGER
    // checkpoint here costs O(log maxLen) up-front materialization
    // jobs whether or not the descent ever reaches that level's rows
    // (measured: the eager version regressed the benched query 24% on
    // a fixture whose candidate-doc set is large). Lazy materializes
    // on first probe and reuses on the second — same plan-cut, no
    // speculative jobs.
    val pruned = levels.map(
      _.join(candDocs, Seq("id"), "left_semi").localCheckpoint(false))

    // binary LCP descent, highest level first: if the 2^k-window ranks
    // at the current match offset agree, the match extends by 2^k.
    // The TOP level is special: doubling stopped at the refinement
    // fixpoint (or with the window covering the longest doc), where
    // equal ranks provably mean suffixes identical all the way to
    // their ends — so a top-level match saturates `acc` past any doc
    // length and the final least(len−pos) cap yields the true LCP.
    // Without the saturation, acc could never exceed 2^(K+1)−1 and
    // identical docs longer than that would underreport.
    // Checkpoint every third level, not every level — enough to keep
    // the plan from re-deriving the whole descent chain, without
    // paying a materialization job per level.
    var sinceCheckpoint = 0
    for (k <- levels.indices.reverse) {
      val la = pruned(k).select(col("id").as("ida"), col("pos").as("qa"),
        col("rank").as("ra"))
      val lb = pruned(k).select(col("id").as("idb"), col("pos").as("qb"),
        col("rank").as("rb"))
      val gain = if (k == topK) lit(1 << 30) else lit(1 << k)
      pairs = pairs
        .withColumn("qa", col("posa") + col("acc"))
        .withColumn("qb", col("posb") + col("acc"))
        .join(la, Seq("ida", "qa"), "left")
        .join(lb, Seq("idb", "qb"), "left")
        .withColumn("acc", when(col("ra").isNotNull && col("ra") === col("rb"),
          col("acc") + gain).otherwise(col("acc")))
        .drop("qa", "qb", "ra", "rb")
      sinceCheckpoint += 1
      if (sinceCheckpoint == 3 || k == 0) {
        pairs = pairs.localCheckpoint()
        sinceCheckpoint = 0
      }
    }

    // sentinel-padded level equality can certify identical TAILS past
    // the doc end — cap at both remaining lengths (where it bites, the
    // suffixes are identical to their ends, so the cap IS the LCP).
    // Same candidate-doc pruning as the descent: the cap and the
    // left-maximality probes only ever look up surviving pairs' docs.
    val candTok = tok.join(candDocs, Seq("id"), "left_semi").localCheckpoint(false)
    val lens = candTok.groupBy(col("id")).agg((max(col("pos")) + 1).as("len"))
    val prevA = candTok.select(col("id").as("ida"), (col("pos") + 1).as("posa"),
      col("t").as("ta"))
    val prevB = candTok.select(col("id").as("idb"), (col("pos") + 1).as("posb"),
      col("t").as("tb"))
    pairs
      .join(lens.select(col("id").as("ida"), col("len").as("lena")), "ida")
      .join(lens.select(col("id").as("idb"), col("len").as("lenb")), "idb")
      .withColumn("lcp",
        least(col("acc"), col("lena") - col("posa"), col("lenb") - col("posb"))
          .cast("int"))
      .filter(col("lcp") >= minTokens)
      // left-maximal: no common token immediately before the match
      .join(prevA, Seq("ida", "posa"), "left")
      .join(prevB, Seq("idb", "posb"), "left")
      .filter(col("ta").isNull || col("tb").isNull || col("ta") =!= col("tb"))
      .select(col("ida").as(idCol), col("posa").as("pos"),
        col("idb").as("match_doc"), col("posb").as("match_pos"), col("lcp"))
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
    * doc count. The doc count is a per-class aggregate joined back on
    * the class id — never a per-row window function materializing the
    * occurrence list, so a boilerplate window shared by millions of
    * docs costs O(occurrences), not O(occurrences²). */
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
    // Same long-doc decision allLevels makes, from the same probe: a
    // book-length doc would otherwise serialize the seed window AND
    // every doubling round here into one task each (the seed is the
    // heaviest case — its rows carry s× token TEXT, not 24-byte rank
    // triples). Empty corpus → the aggregate row is NULL — return the
    // empty frame before probing it.
    val maxRow = tok.agg(max(col("pos"))).head
    if (maxRow.isNullAt(0))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Seq(
        StructField(idCol, LongType), StructField("pos", IntegerType),
        StructField("window_class", LongType), StructField("n_docs", IntegerType))))
    val maxLen = maxRow.getInt(0) + 1L
    val viaJoin = maxLen > LongDocThreshold
    // Seed at width min(w, 4) instead of 1: the seed key is the
    // s-token window content itself (per-doc lead()s, joined with a
    // NUL separator). Tokens are NUL-ESCAPED first — U+0001 becomes
    // U+0001 U+0002, then U+0000 becomes U+0001 U+0001, in that order
    // so introduced bytes are never re-escaped. The code is injective
    // and order-preserving and its images contain no NUL, so (a) a
    // token that itself embeds NUL can no longer collide with a token
    // boundary — the key stays injective over token SEQUENCES — and
    // (b) the separator stays strictly below every escaped byte, so
    // the concat order IS token-wise lexicographic order and
    // concat_ws skipping the null leads past the doc end IS the
    // shorter-prefix-first sentinel convention. ASCII corpora escape
    // to themselves (the q50 oracle's DENSE_RANK mirror is
    // untouched). Same dense ranks the doubling would reach, minus
    // log2(s) rounds; the trade is a seed shuffle carrying s× token
    // text (capped at 4×) instead of 24-byte rank triples — the
    // documented exactness-ladder trade.
    // Above LongDocThreshold the per-doc lead() seed window becomes
    // s−1 LEFT self-joins on (id, pos+i): hash-partitioned on
    // (id, pos), so even one enormous doc spreads across the cluster.
    // A missing join row past the doc end is a null — and concat_ws
    // skips nulls exactly like it skips null leads, so the two seeds
    // build byte-identical keys (the equivalence spec pins this).
    val s = math.min(windowTokens, 4)
    def esc(c: org.apache.spark.sql.Column) =
      replace(replace(c, lit("\u0001"), lit("\u0001\u0002")),
        lit("\u0000"), lit("\u0001\u0001"))
    val seeded =
      if (s == 1) tok
      else if (viaJoin) {
        val escaped = tok.select(col("id"), col("pos"), esc(col("t")).as("e"))
          .localCheckpoint()
        (1 until s).foldLeft(
          escaped.select(col("id"), col("pos"), col("e").as("e0"))) { (acc, i) =>
          acc.join(
            escaped.select(col("id"), (col("pos") - i).as("pos"), col("e").as(s"e$i")),
            Seq("id", "pos"), "left")
        }.select(col("id"), col("pos"),
          concat_ws("\u0000", (0 until s).map(i => col(s"e$i")): _*).as("t"))
      } else {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy("pos")
        tok.select(col("id"), col("pos"),
          concat_ws("\u0000",
            esc(col("t")) +: (1 until s).map(i => lead(esc(col("t")), i).over(w)): _*).as("t"))
      }
    var cur = seedRanks(spark, seeded)._1.localCheckpoint()
    var off = s.toLong
    while (off < windowTokens) {
      cur = doubleOnce(spark, cur, off, viaJoin)._1
      off *= 2
    }
    // only FULL windows: a short tail's sentinel-padded rank may only
    // equal another identical short tail's — exact but shorter than
    // the contract, so excluded
    val full = cur.join(
        tok.groupBy(col("id")).agg(max(col("pos")).as("last")), "id")
      .filter(col("pos") + windowTokens - 1 <= col("last"))
    val classDocs = full.groupBy(col("rank"))
      .agg(countDistinct(col("id")).cast("int").as("n_docs"))
      .filter(col("n_docs") >= 2)
    full.join(classDocs, "rank")
      .select(col("id").as(idCol), col("pos"),
        col("rank").as("window_class"), col("n_docs"))
  }
}
