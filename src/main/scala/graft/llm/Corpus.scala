package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-corpus cleaning pipeline — what the
  * individual operators exist FOR:
  *
  *   exact dedup (content-hash keepers)
  *     → near-dup drop (MinHash-LSH candidates, Jaccard-verified,
  *       min-id survivor)
  *     → quality filter (Gopher-style windows)
  *
  * Each stage is the already-tested operator; this just wires them:
  * two hash joins (semi on exact keepers, anti on near-dup drops) and
  * a map-side filter. At 100 TB the stage order matters: exact dedup
  * first shrinks the LSH input and removes the identical-doc clusters
  * that the bucket-width cap would otherwise have to drop (see
  * docs/SCALE.md §5).
  */
object Corpus {

  /** `minScore`: when set, a FOURTH stage — the model-based quality
    * filter ([[CorpusStats.scoreFilter]], fixed-weight linear score
    * over the doc-signals matrix) applied to the survivors. Runs
    * AFTER dedup (the CCNet order: signals like shared_frac are only
    * meaningful once identical copies are gone) and in addition to
    * the rule-based Gopher windows, which stay unconditional. */
  def clean(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      threshold: Double = 0.5,
      numHashes: Int = 32,
      bands: Int = 8,
      minScore: Option[Double] = None,
  ): DataFrame = {
    val keepers = Dedup.exactKeepers(docs, idCol, textCol)
      .select(col(idCol))
    // Exact-dedup FIRST, then run LSH on the survivors only. Modulo
    // the bucket-width cap this is output-equivalent (an exact dup has
    // the keeper's text, hence the same shingles/signature/Jaccard,
    // and the keeper has the smaller id — so any drop edge through a
    // non-keeper is also a drop edge through its keeper). WITH the cap
    // the orders can legitimately differ — and this order strictly
    // improves recall: identical-doc clusters that previously
    // overflowed maxBucketWidth (silently dropping their near-dup
    // edges) now collapse to one keeper before LSH ever sees them.
    // The q24 oracle mirrors this order in lockstep.
    // `kept` feeds the LSH chain, the final anti-join, and the quality
    // filter; repartitioning on id makes the scan+semi-join subtree a
    // reusable Exchange (computed once, replayed from shuffle files)
    // instead of three full recomputations — see the same pattern on
    // the shingle table in Dedup.nearDupPairs.
    val kept = docs.join(keepers, Seq(idCol), "left_semi").repartition(col(idCol))
    val nearDrops = Dedup.nearDupDrops(
      Dedup.nearDupPairs(kept, idCol, textCol, n = n, numHashes = numHashes,
        bands = bands, threshold = threshold))
      .withColumnRenamed("drop_id", idCol)
    val ruled = kept
      .join(nearDrops, Seq(idCol), "left_anti")
      .filter(TextOps.qualityKeep(col(textCol)))
    minScore.fold(ruled)(t =>
      CorpusStats.scoreFilter(ruled, idCol, textCol, minScore = t))
  }

  /** [[clean]] with TRANSITIVE near-dup semantics: instead of the
    * greedy drop-every-id_b rule, verified pairs become edges of a
    * similarity graph, [[Dedup.connectedComponents]] groups them
    * (fixed `ccIters` rounds), and every doc that is not its
    * component's min id drops. Differs from [[clean]] exactly on
    * chains: A~B~C with no A~C edge keeps {A, C} under greedy (C is
    * never an id_b of A) but only {A} here — the right call when
    * near-dup means "same underlying content drifting", the wrong one
    * when similarity is genuinely non-transitive; both semantics stay
    * available. Costs the CC rounds on the PAIR GRAPH only (pairs are
    * candidate-verified survivors — vastly smaller than the corpus). */
  def cleanCC(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      ccIters: Int = 3,
  ): DataFrame = {
    val keepers = Dedup.exactKeepers(docs, idCol, textCol)
      .select(col(idCol))
    val kept = docs.join(keepers, Seq(idCol), "left_semi").repartition(col(idCol))
    val pairs = Dedup.nearDupPairs(
      kept, idCol, textCol, n = n, numHashes = numHashes, bands = bands,
      threshold = threshold)
    val drops = Dedup.connectedComponents(pairs, ccIters)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    kept
      .join(drops, Seq(idCol), "left_anti")
      .filter(TextOps.qualityKeep(col(textCol)))
  }

  /** The cleaning FUNNEL's per-document verdict — the ops report
    * behind [[clean]]: every input document classified by the FIRST
    * stage that removes it (`exact_dup` → `near_dup` → `quality` →
    * `low_score` when `minScore` enables the model gate) or `kept`.
    * Aggregate for the funnel ("this load lost 4% to
    * near-dups, double last week's"), anti-join a fate against the
    * corpus for stage-level drill-down — the questions a pipeline
    * operator actually asks, answered without re-running [[clean]]
    * once per stage. Stage semantics and order mirror [[clean]]
    * EXACTLY (same keepers, same LSH-over-survivors, same quality
    * rule — the q105 oracle replays them in lockstep); one pass, the
    * fates assemble as id-keyed left joins of the stages' id sets.
    * Output: (idCol, fate). */
  def cleanFates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      threshold: Double = 0.5,
      numHashes: Int = 32,
      bands: Int = 8,
      minScore: Option[Double] = None,
  ): DataFrame = {
    val keepers = Dedup.exactKeepers(docs, idCol, textCol)
      .select(col(idCol))
    val kept = docs.join(keepers, Seq(idCol), "left_semi").repartition(col(idCol))
    val nearDrops = Dedup.nearDupDrops(
      Dedup.nearDupPairs(kept, idCol, textCol, n = n, numHashes = numHashes,
        bands = bands, threshold = threshold))
      .withColumnRenamed("drop_id", idCol)
    val base = docs
      .select(col(idCol), TextOps.qualityKeep(col(textCol)).as("graft_q_"))
      .join(keepers.withColumn("graft_k_", lit(1)), Seq(idCol), "left")
      .join(nearDrops.withColumn("graft_nd_", lit(1)), Seq(idCol), "left")
    // the optional model gate mirrors clean(minScore=…): scored over
    // the SURVIVORS of the rule stages — same population the
    // pipeline's scoreFilter sees, so fates keep matching it
    // doc-for-doc (a whole-corpus scoring would shift the boilerplate
    // and rarity signals and misreport low_score fates)
    val scoreDrop = minScore.map { t =>
      val survivors = kept
        .join(nearDrops, Seq(idCol), "left_anti")
        .filter(TextOps.qualityKeep(col(textCol)))
      CorpusStats.qualityScore(
          CorpusStats.docSignals(survivors, idCol, textCol))
        .filter(col("score") < t)
        .select(col(idCol))
    }
    val withScore = scoreDrop.fold(base.withColumn("graft_s_", lit(null: Integer)))(
      sd => base.join(sd.withColumn("graft_s_", lit(1)), Seq(idCol), "left"))
    withScore.select(col(idCol),
      when(col("graft_k_").isNull, lit("exact_dup"))
        .when(col("graft_nd_").isNotNull, lit("near_dup"))
        .when(!col("graft_q_"), lit("quality"))
        .when(col("graft_s_").isNotNull, lit("low_score"))
        .otherwise(lit("kept")).as("fate"))
  }

  /** Span-level corpus REWRITE — the operation the suffix machinery
    * exists for. Whole-doc dedup ([[clean]]/[[cleanCC]]) drops
    * documents; boilerplate shared across otherwise-distinct documents
    * (license headers, navigation chrome, templated footers) survives
    * it in every copy. This operator excises the repeated SPANS and
    * keeps the documents:
    *
    *   [[SuffixRank.maximalCrossDocRepeats]] finds every left-maximal
    *   cross-doc exact repeat of >= minTokens tokens; for each repeat
    *   pair the occurrence in the LARGER doc id is marked for removal.
    *   Marked spans interval-merge per doc, expand to covered token
    *   positions, and each document's surviving tokens rebuild in
    *   position order.
    *
    * The per-pair rule gives a HARD invariant — the smallest doc id
    * carrying a span is never excised (a pair only ever removes its
    * larger side) — but one round is a greedy approximation, not full
    * keep-first: the repeat pairs are ADJACENT in suffix order, and
    * with k >= 3 occurrences two pairs can mark the same middle
    * occurrence, leaving a duplicate between the outer two (e.g.
    * continuations ordering three occurrences (2, 3, 1): both pairs
    * mark doc 3, docs 1 AND 2 keep their copies). `rounds` re-mines
    * the rewritten corpus and repeats; every extra round strictly
    * shrinks the residue and the fixpoint is exact keep-first — only
    * min-doc-id copies remain. Rounds beyond the first early-exit as
    * soon as a re-mine comes back empty. Same-doc repeats are out of
    * scope by construction (pairs are cross-doc).
    *
    * Docs that lose every token rewrite to the empty string rather
    * than vanishing — dropping documents is [[clean]]'s job, not this
    * one's.
    *
    * Scale: the repeat table is the expensive part and is already
    * gated + candidate-doc-pruned (SCALE.md §5); everything here is
    * proportional to covered positions (bounded by corpus tokens) —
    * interval merge over span rows, one explode of disjoint
    * intervals, anti-join, per-doc rebuild. The rebuild's
    * collect_list groups one DOC's tokens — the operator's intrinsic
    * unit, same per-doc locality every windowed text op in the repo
    * has. Output: (idCol, textCol) — one row per input document. */
  def dedupSpans(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minTokens: Int = 8,
      rounds: Int = 1,
  ): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var cur = docs.select(col(idCol), col(textCol))
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val repeats =
        SuffixRank.maximalCrossDocRepeats(cur, idCol, textCol, minTokens)
      if (r + 1 < rounds) {
        // multi-round: probe emptiness to stop early, and checkpoint
        // the round's output so plans don't nest round over round
        val rep = repeats.localCheckpoint()
        if (rep.isEmpty) converged = true
        else cur = removeSpans(cur, rep, idCol, textCol).localCheckpoint()
      } else {
        cur = removeSpans(cur, repeats, idCol, textCol)
      }
      r += 1
    }
    cur
  }

  /** LINE-level boilerplate removal (the CCNet/C4 move): a line whose
    * exact content appears in >= `minDocs` DISTINCT documents is
    * navigation chrome / templated footer / cookie banner, and every
    * occurrence is removed — unlike [[dedupSpans]]' keep-first policy,
    * boilerplate is wanted in NO copy. Lines shorter than
    * `minLineChars` are never candidates (empty lines and one-word
    * bullets are legitimately common; dropping them would collapse
    * paragraph structure corpus-wide).
    *
    * Scale shape — document text never shuffles:
    *   1. count: lines explode ONCE, each reduced map-side to its
    *      60-bit content hash; the distinct-doc count groups 8-byte
    *      keys only.
    *   2. mark: the (tiny) boilerplate hash set semi-joins the same
    *      hashed line table; drop POSITIONS (ints) aggregate per doc.
    *   3. rewrite: one hash join of the drop-position sets back onto
    *      the documents table, then a pure map-side filter of the
    *      split array by index — no token or line text ever enters an
    *      exchange, and untouched docs pass their text through
    *      unsplit.
    *
    * Output: (idCol, textCol rewritten, n_dropped). One row per input
    * document; a doc whose every line was boilerplate reads as "". */
  def dedupLines(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      sep: String = "\n",
      minDocs: Int = 2,
      minLineChars: Int = 10,
      norm: TextOps.NormMode = TextOps.NormNone,
  ): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    require(sep.nonEmpty, "sep must be non-empty")
    val sepRe = java.util.regex.Pattern.quote(sep)
    // (id, pos, hash) — line text reduced to its hash before any
    // shuffle; sub-minimum lines leave the pipeline here. `norm`
    // hashes the NORMALIZED line (a width/case variant of a
    // boilerplate line still matches) while the rewrite below keeps
    // every surviving line byte-identical to the input; the
    // minLineChars gate stays on the raw line so the length contract
    // is independent of the norm mode.
    val cand = docs
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), sepRe)).as(Seq("pos", "line")))
      .filter(length(col("line")) >= minLineChars)
      .select(col("id"), col("pos"),
        TextOps.hash60(TextOps.normalize(col("line"), norm)).as("h"))
    val boiler = cand
      .groupBy(col("h"))
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("h"))
    val dropPos = cand
      .join(boiler, Seq("h"), "left_semi")
      .groupBy(col("id"))
      .agg(collect_set(col("pos")).as("graft_drop_"))
    val joined = docs.join(
      dropPos.withColumnRenamed("id", idCol), Seq(idCol), "left")
    val lns = split(col(textCol), sepRe)
    joined.select(
      col(idCol),
      when(col("graft_drop_").isNull, coalesce(col(textCol), lit("")))
        .otherwise(array_join(
          filter(lns, (_, i) => !array_contains(col("graft_drop_"), i)),
          sep))
        .as(textCol),
      coalesce(size(col("graft_drop_")), lit(0)).as("n_dropped"))
  }

  /** The rewrite half of [[dedupSpans]], decoupled so a user who
    * already materialized the repeat table (or filtered it — e.g. only
    * repeats seen in >= k docs) rewrites without recomputing it.
    * `repeats` must have the [[SuffixRank.maximalCrossDocRepeats]]
    * schema: (idCol, pos, match_doc, match_pos, lcp). */
  def removeSpans(
      docs: DataFrame,
      repeats: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame = {
    // guard user-supplied tables: a lcp <= 0 row would make
    // sequence(start, start + lcp - 1) count DOWN and delete tokens
    // BEFORE the span start (sequence(5, 4) emits 5 AND 4)
    val positive = repeats.filter(col("lcp") > 0)
    // the larger doc id of each pair loses its occurrence
    val spans = positive.select(
      when(col(idCol) > col("match_doc"), col(idCol))
        .otherwise(col("match_doc")).as("id"),
      when(col(idCol) > col("match_doc"), col("pos"))
        .otherwise(col("match_pos")).as("start"),
      col("lcp"))
    // Merge overlapping spans per doc BEFORE exploding: a span shared
    // by k docs arrives as k−1 chained pairs, so the naive
    // explode+distinct pays sum(pair lcps) — k× the covered positions
    // — plus a corpus-sized distinct shuffle. The merge is the classic
    // running-max interval union over SPAN rows (a handful per doc,
    // nothing like token counts), after which intervals are disjoint:
    // the explode emits each covered position exactly once and no
    // distinct is needed at all.
    val w = Window.partitionBy("id").orderBy("start")
    val merged = spans
      .select(col("id"), col("start"), (col("start") + col("lcp")).as("end"))
      .withColumn("gap",
        when(col("start") > coalesce(
          max(col("end")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(Int.MinValue)), 1).otherwise(0))
      .withColumn("grp", sum(col("gap")).over(w))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("start")).as("start"), max(col("end")).as("end"))
    val covered = merged
      .select(col("id"),
        explode(sequence(col("start"), col("end") - 1)).as("pos"))
    val tok = docs.select(col(idCol).as("id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "t")))
    val rebuilt = tok
      .join(covered, Seq("id", "pos"), "left_anti")
      .groupBy(col("id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("t")))),
          x => x.getField("t")), " ").as("rewritten"))
    // every input doc survives — a fully-excised doc reads as ""
    docs.select(col(idCol))
      .join(rebuilt.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("rewritten"), lit("")).as(textCol))
  }
}
