package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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
  * pos) token suffix starts ranked by its first tokens; each round
  * re-ranks by the pair (rank of first half, rank of second half) of
  * a window twice as long, so after a round certifying window w equal
  * ranks mean equal first w tokens — and once no round refines
  * further, rank order IS lexicographic suffix order.
  * O(log maxDocLen) rounds.
  *
  * Round shape (optimization round 21 — guide §2.3/§2.4, "do fewer
  * shuffles"): each round is ONE keyed exchange for the shifted-rank
  * window plus ONE range exchange that sorts (id, pos, a, b) by the
  * pair — dense ranks are then assigned by per-partition arithmetic
  * over the sorted run ([[directRank]]), exactly the indexSorted
  * trick. The previous shape (distinct → sort the distinct pairs →
  * join the ranks back on (a, b)) paid two extra full-width
  * exchanges per round: the distinct's hash shuffle and the
  * join-back probe. Dense ranks are identical by construction —
  * 1-based, ordered by (a, b), ties share — so downstream (and the
  * q50/q51 oracles) see bit-identical ranks; the equivalence is
  * additionally spec-pinned by SuffixRankSpec's brute-force
  * reference checks.
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
  * The rank count comes out of the dense-rank pass itself — no
  * separate distinct-count job per round.
  *
  * Scale: rows = total corpus tokens. Each round shuffles (id, pos,
  * rank) triples — ~24 bytes a row, text never moves after the one
  * tokenization pass (the seed pass carries ≤ 4 tokens of text per
  * row, the documented exactness-ladder trade). The log-round trade
  * is the same one the star-contraction CC makes: more rounds than a
  * hash approach, but an exactness no hash family gives. */
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

  /** Dense rank (1-based, ties share, ordered by `keyCols`) assigned
    * DIRECTLY on the carrying rows — the round's only full-width
    * exchange. `df` must have `id: long` and `pos: int` columns plus
    * the key columns; output is (id, pos, rank) and the rank count.
    *
    * One range-partitioned sort of (id, pos, keys), then two passes
    * over the cached sorted runs: a per-partition (distinct-count,
    * first-key, last-key) probe — #partitions rows to the driver,
    * never data — and a per-partition sweep that numbers key changes
    * starting from the driver-computed base. A key straddling a
    * partition boundary is counted once (the `dup` adjustment), so
    * ranks are dense regardless of where the range partitioner cut.
    * Replaces the previous distinct → sort → join-back shape: same
    * ranks by construction, two fewer full-width exchanges, and no
    * join to plan. */
  private def directRank(df: DataFrame, keyCols: Seq[String]): (DataFrame, Long) = {
    val spark = df.sparkSession
    // The input is persist()ed (not localCheckpoint'ed) so it can be
    // UNPERSISTED as soon as the sorted runs are materialized: the
    // range sort walks its child twice (sampler, then shuffle write),
    // but the round's input — the widest table here when the key is a
    // seed window string — is transient, and letting every round's
    // copy pile up in the block manager until GC was measured to drag
    // later queries in the same session (guide §5: unpersist when
    // done). The SORTED runs stay lazily checkpointed: they back every
    // later probe of this level's ranks.
    val in = df.select((Seq("id", "pos") ++ keyCols).map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sorted = in.orderBy(keyCols.map(col): _*).localCheckpoint(false)
    val kIdx = keyCols.indices.map(_ + 2)
    def sameKey(a: Row, b: Row): Boolean = kIdx.forall(i => a.get(i) == b.get(i))
    val rdd = sorted.rdd
    val stats = rdd.mapPartitions { it =>
      var n = 0L; var first: Row = null; var last: Row = null
      while (it.hasNext) {
        val r = it.next()
        if (first == null) { first = r; n = 1L }
        else if (!sameKey(r, last)) n += 1L
        last = r
      }
      Iterator((n, first, last))
    }.collect()
    var cum = 0L
    var prevLast: Row = null
    val bases = stats.map { case (n, first, last) =>
      if (n == 0L) 0L
      else {
        val dup = prevLast != null && sameKey(first, prevLast)
        val base = if (dup) cum else cum + 1L
        cum += n - (if (dup) 1L else 0L)
        prevLast = last
        base
      }
    }
    val nRanks = cum
    val ranked = rdd.mapPartitionsWithIndex { case (p, it) =>
      var rank = bases(p)
      var last: Row = null
      it.map { r =>
        if (last != null && !sameKey(r, last)) rank += 1L
        last = r
        Row(r.getLong(0), r.getInt(1), rank)
      }
    }
    // the stats job above computed every partition of `sorted`, so its
    // (lazy) checkpoint blocks now exist and the input copy can go
    in.unpersist(false)
    // the rank sweep is lazily checkpointed too: levels are probed
    // repeatedly (the next round's window, the descent's semi-join
    // prunes, the global order sort), and an uncached sweep re-pays
    // the Row-conversion round-trip over the full token count per
    // probe (measured +30% on q51)
    (spark.createDataFrame(ranked, StructType(Seq(
      StructField("id", LongType), StructField("pos", IntegerType),
      StructField("rank", LongType)))).localCheckpoint(false), nRanks)
  }

  /** Above this many tokens in ONE document, the per-doc window forms
    * trade their window for shifted self-joins: a window serializes a
    * doc into a single task per round — fine for web-page-sized docs,
    * a straggler once a single doc approaches a partition's worth of
    * tokens (book-length concatenations, log dumps). Every entry
    * point makes the SAME decision from the same corpus-wide
    * max-doc-length probe. `private[graft] var` is a test seam only:
    * the equivalence spec lowers it to force the join path onto small
    * fixtures and restores it — production code never writes it. */
  private[graft] var LongDocThreshold = 1L << 22

  /** NUL-escape for seed-window keys: U+0001 → U+0001 U+0002 first,
    * then U+0000 → U+0001 U+0001, so introduced bytes are never
    * re-escaped. Injective and order-preserving with NUL-free images,
    * so a NUL-separated concat of escaped tokens is injective over
    * token SEQUENCES and its string order IS token-wise lexicographic
    * order (ASCII corpora escape to themselves). */
  private def esc(c: Column): Column =
    replace(replace(c, lit("\u0001"), lit("\u0001\u0002")),
      lit("\u0000"), lit("\u0001\u0001"))

  /** (id, pos, t) where `t` is the NUL-joined escaped `s`-token
    * window starting at pos (s = 1 returns the token table as-is).
    * concat_ws skips the null leads past the doc end, which IS the
    * shorter-prefix-first sentinel convention (the separator sorts
    * strictly below every escaped byte). Above [[LongDocThreshold]]
    * the per-doc lead() window becomes s−1 LEFT self-joins on
    * (id, pos+i): hash-partitioned, so even one enormous doc spreads
    * across the cluster; a missing join row past the doc end is a
    * null and concat_ws skips it exactly like a null lead — the two
    * forms build byte-identical keys (spec-pinned). */
  private def seedWindows(tok: DataFrame, s: Int, viaJoin: Boolean): DataFrame =
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
    // checkpointed because directRank's range sort walks it twice
    // (the range sampler, then the shuffle write) — one pass, not two
    val paired = if (viaJoin) {
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
    }
    directRank(paired, Seq("a", "b")) // directRank caches input + output
  }

  private def tokenize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "t")))
      .localCheckpoint(false)

  /** Fully-doubled rank tables, one per level: `levels(k)` is (id,
    * pos, rank) where rank equality certifies equal
    * seedWidth·2^k-token (sentinel-padded) windows. Runs to the
    * refinement fixpoint (or until the window covers the longest
    * document). Seeding at `seedWidth` > 1 (the [[seedWindows]] key,
    * same dense ranks the doubling would reach) skips log2(seedWidth)
    * full doubling rounds — the trade is one seed sort carrying
    * ≤ seedWidth× token text instead of 24-byte rank triples (guide
    * §2.3: fewer passes beats narrower rows here, measured). Levels
    * are cheap maps over each round's internally cached sort, so
    * keeping all of them costs no extra materialization — the price
    * of exact LCP descent later, not of the ranking itself. */
  private def allLevels(spark: SparkSession, tok: DataFrame, total: Long,
      seedWidth: Int = 4): Seq[DataFrame] = {
    val maxLen = tok.agg(max(col("pos"))).head.getInt(0) + 1L
    val viaJoin = maxLen > LongDocThreshold
    var (cur0, nRanks) = directRank(seedWindows(tok, seedWidth, viaJoin), Seq("t"))
    val levels = scala.collection.mutable.ArrayBuffer(cur0)
    var off = seedWidth.toLong // certified window length of the current ranks
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
    * O(log maxDocLen) regardless of how long the repeat is. With the
    * seed at width s > 1 the levels certify s·2^k windows, so the
    * descent resolves the LCP to a multiple of s and a final
    * token-array probe over the (candidate-pruned) token table adds
    * the ≤ s−1 remainder — two small joins replacing the log2(s)
    * full doubling rounds the seed skipped. All shuffles carry (id,
    * pos, rank/acc) rows; text never moves after tokenization.
    * Output: (idCol, pos, match_doc, match_pos, lcp). */
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
    // Seed width: the largest power of two ≤ min(minTokens, 4) — so a
    // level whose certified window is ≤ minTokens always exists for
    // the gate below, and the seed shuffle carries at most 4 tokens
    // of text per row (the documented exactness-ladder cap).
    val s = math.min(
      java.lang.Long.highestOneBit(minTokens.toLong), 4L).toInt
    val levels = allLevels(spark, tok, total, seedWidth = s)

    // global suffix order (rank, id, pos) → adjacent pairs, by one
    // range-partitioned sort; pairs come from consecutive rows of the
    // cached sorted runs (plus one cross-boundary pair per partition,
    // stitched with a driver hop of #partitions first-rows) — no
    // self-join, no second full-width exchange (guide §2.4).
    val ordered = levels.last.orderBy("rank", "id", "pos")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val orderedRdd = ordered.rdd
    val nPart = orderedRdd.getNumPartitions
    val firsts = orderedRdd.mapPartitionsWithIndex { (p, it) =>
      if (it.hasNext) { val r = it.next(); Iterator((p, (r.getLong(0), r.getInt(1)))) }
      else Iterator.empty
    }.collect().toMap
    val firstsB = spark.sparkContext.broadcast(firsts)
    val pairsRdd = orderedRdd.mapPartitionsWithIndex { (p, it) =>
      val nextFirst = ((p + 1) until nPart).iterator
        .flatMap(q => firstsB.value.get(q)).take(1).toSeq.headOption
      new Iterator[Row] {
        private var cur: Row = if (it.hasNext) it.next() else null
        private var tail = nextFirst // emitted after the in-partition pairs
        def hasNext: Boolean = cur != null && (it.hasNext || tail.nonEmpty)
        def next(): Row = {
          if (it.hasNext) {
            val nxt = it.next()
            val out = Row(cur.getLong(0), cur.getInt(1), nxt.getLong(0), nxt.getInt(1))
            cur = nxt
            out
          } else {
            val (nid, npos) = tail.get
            tail = None
            val out = Row(cur.getLong(0), cur.getInt(1), nid, npos)
            cur = null
            out
          }
        }
      }
    }
    var pairs = spark.createDataFrame(pairsRdd, StructType(Seq(
        StructField("ida", LongType), StructField("posa", IntegerType),
        StructField("idb", LongType), StructField("posb", IntegerType))))
      .filter(col("ida") =!= col("idb"))
      .withColumn("acc", lit(0))

    // Gate BEFORE the descent: lcp >= minTokens requires EQUAL ranks at
    // offset 0 on level g, the highest level whose certified window
    // s·2^g <= minTokens. Sound at every stop condition of the doubling
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
      63 - java.lang.Long.numberOfLeadingZeros(minTokens.toLong / s), topK.toLong).toInt
    pairs = pairs
      .join(levels(g).select(col("id").as("ida"), col("pos").as("posa"),
        col("rank").as("ra")), Seq("ida", "posa"))
      .join(levels(g).select(col("id").as("idb"), col("pos").as("posb"),
        col("rank").as("rb")), Seq("idb", "posb"))
      .filter(col("ra") === col("rb")).drop("ra", "rb")
      .localCheckpoint()
    // the eager checkpoint above materialized the surviving pairs —
    // the sorted suffix order is no longer needed; drop it now rather
    // than holding corpus-sized blocks until GC
    ordered.unpersist(false)
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

    // binary LCP descent, highest level first: if the s·2^k-window
    // ranks at the current match offset agree, the match extends by
    // s·2^k. The TOP level is special: doubling stopped at the
    // refinement fixpoint (or with the window covering the longest
    // doc), where equal ranks provably mean suffixes identical all the
    // way to their ends — so a top-level match saturates `acc` past
    // any doc length and the final least(len−pos) cap yields the true
    // LCP. Without the saturation, acc could never exceed s·(2^(K+1)−1)
    // and identical docs longer than that would underreport.
    // Checkpoint every third level, not every level — enough to keep
    // the plan from re-deriving the whole descent chain, without
    // paying a materialization job per level.
    var sinceCheckpoint = 0
    for (k <- levels.indices.reverse) {
      val la = pruned(k).select(col("id").as("ida"), col("pos").as("qa"),
        col("rank").as("ra"))
      val lb = pruned(k).select(col("id").as("idb"), col("pos").as("qb"),
        col("rank").as("rb"))
      val gain = if (k == topK) lit(1 << 30) else lit(s << k)
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

    // Same candidate-doc pruning as the descent: the remainder, cap
    // and left-maximality probes only ever look up surviving pairs'
    // docs.
    val candTok = tok.join(candDocs, Seq("id"), "left_semi").localCheckpoint(false)

    // Seed-width remainder: the descent resolved the LCP to a multiple
    // of s (level-0 certifies s-token windows), so up to s−1 more
    // tokens can still match. One per-doc window builds the next-(s−1)
    // token array per candidate position; two keyed left joins fetch
    // the arrays at the current match offsets; a nested-when counts
    // the leading equal tokens (a null — past the doc end — stops the
    // count, which the length cap below would enforce anyway).
    if (s > 1) {
      val wN = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy("pos")
      val nxt = candTok.select(col("id"), col("pos"),
        array((0 until s - 1).map(i => lead(col("t"), i).over(wN)): _*).as("nx"))
      def eqAt(i: Int): Column =
        col("nxa").getItem(i).isNotNull && col("nxb").getItem(i).isNotNull &&
          col("nxa").getItem(i) === col("nxb").getItem(i)
      val rext = ((s - 2) to 0 by -1).foldLeft(lit(0)) { (inner, i) =>
        when(eqAt(i), lit(1) + inner).otherwise(lit(0))
      }
      pairs = pairs
        .withColumn("qa", col("posa") + col("acc"))
        .withColumn("qb", col("posb") + col("acc"))
        .join(nxt.select(col("id").as("ida"), col("pos").as("qa"),
          col("nx").as("nxa")), Seq("ida", "qa"), "left")
        .join(nxt.select(col("id").as("idb"), col("pos").as("qb"),
          col("nx").as("nxb")), Seq("idb", "qb"), "left")
        .withColumn("acc", col("acc") + rext)
        .drop("qa", "qb", "nxa", "nxb")
    }

    // sentinel-padded level equality can certify identical TAILS past
    // the doc end — cap at both remaining lengths (where it bites, the
    // suffixes are identical to their ends, so the cap IS the LCP).
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
    // Seed at width min(w, 4) instead of 1 ([[seedWindows]]): same
    // dense ranks the doubling would reach, minus log2(s) rounds; the
    // trade is a seed sort carrying s× token text (capped at 4×)
    // instead of 24-byte rank triples — the documented
    // exactness-ladder trade. (ASCII corpora escape to themselves —
    // the q50 oracle's DENSE_RANK mirror is untouched.)
    val s = math.min(windowTokens, 4)
    var cur = directRank(seedWindows(tok, s, viaJoin), Seq("t"))._1
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
