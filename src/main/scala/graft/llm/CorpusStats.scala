package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistical operators for training-data curation:
  * per-document repetition profiles (the Gopher-style "is this doc
  * degenerate" signals), salient-term extraction (corpus-relative
  * keyword scoring), and tokenizer-induction pair statistics.
  *
  * Everything here shuffles HASHES or short terms, never document
  * text, and every aggregation is map-side combinable — the shapes
  * that survive a 100 TB corpus. Output doubles are single IEEE
  * divisions of exact integers (bit-stable across engines), so every
  * query over these operators hash-matches its DuckDB oracle.
  */
object CorpusStats {

  /** Per-document repetition profile — the within-doc degeneracy
    * signals quality filtering keys on (a looping generation or a
    * keyword-stuffed page has low distinct fractions and a dominant
    * top n-gram; see the Gopher/MassiveText repetition rules):
    *
    *   n_tokens, n_distinct, top_token_cnt — token multiset stats
    *   n_bigrams, n_distinct_bigrams, top_bigram_cnt — 2-gram stats
    *   dup_token_frac  = (n_tokens − n_distinct) / n_tokens
    *   top_token_frac  = top_token_cnt / n_tokens
    *   dup_bigram_frac = (n_bigrams − n_distinct_bigrams) / max(n_bigrams, 1)
    *   top_bigram_frac = top_bigram_cnt / max(n_bigrams, 1)
    *
    * Shape: tokens and bigrams each explode once and are reduced
    * map-side to 60-bit / affine hashes BEFORE their groupBy — the
    * two count shuffles carry (id, 8-byte hash) rows only, both with
    * partial aggregation, then collapse to one row per doc and join
    * on id. Unlike a per-row `array_distinct` HOF profile this never
    * does O(len²) work on a long document, and unlike grouping on
    * n-gram STRINGS the exchange payload is fixed-width. Docs with
    * < 2 tokens have zero bigrams (left join + zero-coalesce).
    *
    * `mode` = [[TextOps.Codepoint]] profiles character/char-bigram
    * repetition instead — the non-degenerate form for CJK/Thai text,
    * where whitespace tokens collapse to one per line (q80; the
    * [[TextOps.segment]] preprocessor pattern). */
  def repetitionProfile(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      mode: TextOps.TokenMode = TextOps.Whitespace,
  ): DataFrame = {
    val src = mode match {
      case TextOps.Whitespace => docs
      case m => docs.withColumn(textCol, TextOps.segment(col(textCol), m))
    }
    val tok = src
      .select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("t"))
      .select(col("id"), TextOps.hash60(col("t")).as("h"))
      .groupBy(col("id"), col("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(
        sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).cast("long").as("top_token_cnt"))
    val big = src
      .select(col(idCol).as("id"),
        explode(TextOps.windowHashesPositional(col(textCol), 2)).as("h"))
      .groupBy(col("id"), col("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(
        sum(col("c")).cast("long").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max(col("c")).cast("long").as("top_bigram_cnt"))
    tok
      .join(big, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        col("n_tokens"),
        col("n_distinct"),
        col("top_token_cnt"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct_bigrams"), lit(0L)).as("n_distinct_bigrams"),
        coalesce(col("top_bigram_cnt"), lit(0L)).as("top_bigram_cnt"))
      .withColumn("dup_token_frac",
        (col("n_tokens") - col("n_distinct")).cast("double") / col("n_tokens"))
      .withColumn("top_token_frac",
        col("top_token_cnt").cast("double") / col("n_tokens"))
      .withColumn("dup_bigram_frac",
        (col("n_bigrams") - col("n_distinct_bigrams")).cast("double") /
          greatest(col("n_bigrams"), lit(1L)))
      .withColumn("top_bigram_frac",
        col("top_bigram_cnt").cast("double") /
          greatest(col("n_bigrams"), lit(1L)))
  }

  /** Top-k SALIENT terms per document, scored tf/df — term frequency
    * in the doc over the term's corpus document frequency. The
    * corpus-relative keyword op (search indexing, topic labeling):
    * "the" has huge tf but corpus-wide df, a doc's distinctive terms
    * have df near 1. The score is the classic tf·idf ranking with the
    * monotone df-transform chosen so the VALUE is one exact integer
    * division (idf's log makes ranks depend on libm rounding; tf/df
    * orders every pair the same way ln(N/df)-weighting does whenever
    * df differs and is bit-identical across engines).
    *
    * Shape: three map-side-combinable shuffles, none carrying more
    * than (id, one short term) — tf groups (id, term), df reduces the
    * tf table by term, and the top-k is [[graft.expr.TopKAgg]]: a
    * bounded-heap aggregate whose partial mode reduces each map
    * task's slice of a doc to <= k entries BEFORE the shuffle, where
    * the window formulation ([[salientTermsViaWindow]]) sorts whole
    * groups and ships every row. Ties break on term asc → fully
    * deterministic top-k, pointwise equal to the window form (spec). */
  def salientTerms(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 3,
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val scored = scoredTerms(docs, idCol, textCol)
    // payload field order (term first) IS the tie-break: the heap
    // compares payload structs ascending on score ties
    val payload = struct(col("term"), col("tf"), col("df"), col("score"))
    scored
      .groupBy(col(idCol))
      .agg(graft.expr.TopKAgg.topK(col("score"), payload, k).as("graft_top_"))
      .select(col(idCol), posexplode(col("graft_top_")).as(Seq("graft_r_", "e")))
      .select(col(idCol), col("e.term").as("term"), col("e.tf").as("tf"),
        col("e.df").as("df"), col("e.score").as("score"),
        (col("graft_r_") + 1).cast("int").as("rank"))
  }

  /** The idiomatic-Spark reference formulation of [[salientTerms]]
    * (row_number window over the scored table) — semantically
    * identical, kept as the equivalence-spec oracle for the heap
    * aggregate and as documentation of what TopKAgg replaces. */
  def salientTermsViaWindow(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 3,
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    scoredTerms(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Shared tf/df scoring table: (idCol, term, tf, df, score). */
  private def scoredTerms(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf rows are distinct (id, term) pairs, so a plain count per
    // term IS the distinct-doc count — no countDistinct shuffle
    val df = tf
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    tf
      .join(df, Seq("term"))
      .select(col("id").as(idCol), col("term"), col("tf"), col("df"),
        (col("tf").cast("double") / col("df")).as("score"))
  }

  /** Per-document BOILERPLATE DENSITY: the fraction of a doc's
    * w-token windows whose exact content also appears in >= minDocs
    * OTHER distinct documents — the cheap per-doc triage signal for
    * the heavyweight span machinery (a doc at 0.9 is templated
    * chrome; run [[Corpus.dedupSpans]] where it pays, skip the clean
    * tail). Complements [[repetitionProfile]]: that scores WITHIN-doc
    * degeneracy, this scores CROSS-doc sharing.
    *
    * Shape: window hashes explode once, hash-partitioned and REUSED
    * by both consumers (the distinct-doc frequency count and the
    * shared-occurrence count — one exchange, two aggregations);
    * n_windows comes from `size()` map-side, never a third pass. The
    * exchange carries (id, 8-byte hash); text never shuffles. */
  def boilerplateDensity(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      w: Int = 8,
      minDocs: Int = 2,
  ): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val occ = docs
      .select(col(idCol).as("id"),
        explode(TextOps.windowHashesPositional(col(textCol), w)).as("h"))
      .repartition(col("h"))
    val shared = occ
      .groupBy(col("h"))
      .agg(countDistinct(col("id")).as("wdf"))
      .filter(col("wdf") >= minDocs)
      .select(col("h"))
    val sharedCounts = occ
      .join(shared, Seq("h"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
    docs
      .select(col(idCol),
        size(TextOps.windowHashesPositional(col(textCol), w)).as("n_windows"))
      .join(sharedCounts.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_windows"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") /
          greatest(col("n_windows"), lit(1))).as("shared_frac"))
  }

  /** Per-document token SURPRISAL profile — the rare-token quality
    * signal (CCNet-style: a doc dominated by tokens the corpus has
    * barely seen is noise or gold, either way triage-worthy; a doc of
    * only ubiquitous tokens is boilerplate-ish). The per-token
    * "frequency bits" statistic is `length(bin(count))` =
    * floor(log2(count)) + 1 — a PURE INTEGER stand-in for -log p
    * (monotone in count, exact in both engines) chosen deliberately
    * over libm log: a float log sum is reduction-order dependent and
    * hash-splits engines; an integer bit-length sum cannot.
    *
    *   n_tokens, sum_freq_bits, mean_freq_bits (low = rare-heavy),
    *   n_rare (corpus count <= rareMax), rare_frac
    *
    * Shape: one token-hash explode hash-partitioned and REUSED (the
    * corpus count aggregate and the count join — same exchange), then
    * one groupBy id; shuffles carry (id, 8-byte hash) only. */
  def surprisalProfile(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      rareMax: Long = 2L,
  ): DataFrame = {
    require(rareMax >= 1, s"rareMax must be >= 1, got $rareMax")
    val tok = docs
      .select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("t"))
      .select(col("id"), TextOps.hash60(col("t")).as("h"))
      .repartition(col("h"))
    val counts = tok.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
    tok
      .join(counts, Seq("h"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(length(bin(col("cnt")))).cast("long").as("sum_freq_bits"),
        sum(when(col("cnt") <= rareMax, 1).otherwise(0)).cast("long").as("n_rare"))
      .select(
        col("id").as(idCol),
        col("n_tokens"),
        col("sum_freq_bits"),
        (col("sum_freq_bits").cast("double") / col("n_tokens")).as("mean_freq_bits"),
        col("n_rare"),
        (col("n_rare").cast("double") / col("n_tokens")).as("rare_frac"))
  }

  /** The assembled per-document QUALITY-SIGNAL TABLE — the feature
    * matrix a filter model (or a hand-tuned keep rule) trains on:
    * every signal the stats family computes, one row per document.
    * Columns: the [[repetitionProfile]] token+bigram stats and
    * fractions, the [[surprisalProfile]] frequency-bits signals, the
    * [[boilerplateDensity]] shared-window signals, and the map-side
    * quality flags (alpha ratio, mean token length, Gopher keep).
    *
    * Why an operator and not four separate runs: the token-grain
    * signals (repetition AND surprisal) ride ONE shared
    * (id, hash, count) table — one explode+md5 pass where the
    * standalone operators pay two. The table is lazily
    * localCheckpoint'ed: its three consumers form self-joins, whose
    * relation deduplication re-aliases the subtree so ReuseExchange
    * no longer sees identical plans — without the lineage cut the
    * "shared" table silently re-explodes the corpus per consumer
    * (plan-audited: the final plan scans the checkpointed rows, and
    * only the bigram grain plans its own token-table exchange).
    * Surprisal's per-occurrence sums become count-weighted sums over
    * the shared table (identical values, spec-pinned against the
    * standalone ops). Bigram and shared-window signals are separate
    * compiled window explodes by necessity (different grains), each
    * in its own already-audited shape; the final assembly is id-keyed
    * joins of id-partitioned aggregates. Text never shuffles.
    *
    * Compression signals (CCNet/RefinedWeb heuristic, VERDICT r12 ask
    * #8): `n_bytes` (UTF-8 length), `deflate_len` (fixed-level-6 raw
    * DEFLATE output length, [[TextOps.deflateLen]]), and
    * `compression_ratio` = deflate_len / max(n_bytes, 1) — degenerate
    * repeated text compresses ≪ 1, prose sits near 1. Map-side in the
    * same flags projection. deflate_len/compression_ratio are the
    * matrix's only non-DuckDB-replayable columns (no SQL DEFLATE), so
    * they follow the multimodal discipline: q84 oracles every other
    * column and CompressionSignalSpec pins these. */
  def docSignals(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      w: Int = 8,
      minDocs: Int = 2,
      rareMax: Long = 2L,
  ): DataFrame = {
    // the shared token-grain table: (id, 60-bit hash, in-doc count),
    // materialized ONCE behind a lazy lineage cut (see scaladoc)
    val tokc = docs
      .select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("t"))
      .select(col("id"), TextOps.hash60(col("t")).as("h"))
      .repartition(col("id"))
      .groupBy(col("id"), col("h"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val rep = tokc.groupBy(col("id")).agg(
      sum(col("c")).cast("long").as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).cast("long").as("top_token_cnt"))
    val corpus = tokc.groupBy(col("h")).agg(sum(col("c")).cast("long").as("cnt"))
    // per-occurrence sums as count-weighted sums over the shared table
    val sur = tokc
      .join(corpus, Seq("h"))
      .groupBy(col("id"))
      .agg(
        sum(col("c") * length(bin(col("cnt")))).cast("long").as("sum_freq_bits"),
        sum(when(col("cnt") <= rareMax, col("c")).otherwise(0L))
          .cast("long").as("n_rare"))
    val big = docs
      .select(col(idCol).as("id"),
        explode(TextOps.windowHashesPositional(col(textCol), 2)).as("h"))
      .repartition(col("id"))
      .groupBy(col("id"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(
        sum(col("c")).cast("long").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max(col("c")).cast("long").as("top_bigram_cnt"))
    val boiler = boilerplateDensity(docs, idCol, textCol, w, minDocs)
      .withColumnRenamed(idCol, "id")
    val flags = docs.select(
      col(idCol).as("id"),
      TextOps.alphaRatio(col(textCol)).as("alpha_ratio"),
      TextOps.meanTokenLen(col(textCol)).as("mean_tok_len"),
      TextOps.qualityKeep(col(textCol)).as("keep"),
      octet_length(col(textCol)).cast("long").as("n_bytes"),
      TextOps.deflateLen(col(textCol)).as("deflate_len"))
    rep
      .join(sur, Seq("id"))
      .join(big, Seq("id"), "left")
      .join(boiler, Seq("id"))
      .join(flags, Seq("id"))
      .select(
        col("id").as(idCol),
        col("n_tokens"),
        col("n_distinct"),
        col("top_token_cnt"),
        ((col("n_tokens") - col("n_distinct")).cast("double") /
          col("n_tokens")).as("dup_token_frac"),
        (col("top_token_cnt").cast("double") / col("n_tokens"))
          .as("top_token_frac"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct_bigrams"), lit(0L)).as("n_distinct_bigrams"),
        coalesce(col("top_bigram_cnt"), lit(0L)).as("top_bigram_cnt"),
        ((coalesce(col("n_bigrams"), lit(0L)) -
          coalesce(col("n_distinct_bigrams"), lit(0L))).cast("double") /
          greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)))
          .as("dup_bigram_frac"),
        (coalesce(col("top_bigram_cnt"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)))
          .as("top_bigram_frac"),
        col("sum_freq_bits"),
        (col("sum_freq_bits").cast("double") / col("n_tokens"))
          .as("mean_freq_bits"),
        col("n_rare"),
        (col("n_rare").cast("double") / col("n_tokens")).as("rare_frac"),
        col("n_windows"),
        col("n_shared"),
        col("shared_frac"),
        col("alpha_ratio"),
        col("mean_tok_len"),
        col("keep"),
        col("n_bytes"),
        col("deflate_len"),
        (col("deflate_len").cast("double") /
          greatest(col("n_bytes"), lit(1L)).cast("double"))
          .as("compression_ratio"))
  }

  /** FIT the corpus-level statistics [[docSignals]] derives
    * internally, as two frozen artifact frames — the train step of
    * the train/serve split ([[docSignalsFrozen]] is the serve step):
    *
    *   token frequencies (h, cnt) — total occurrences per 60-bit
    *     token hash, the [[surprisalProfile]] reference measure;
    *   shared windows (h) — the w-token window hashes appearing in
    *     ≥ `minDocs` reference documents, the [[boilerplateDensity]]
    *     reference set.
    *
    * Persist both through a [[graft.io.TableStore]] like any model
    * artifact (the X49 IVF recipe): fit once on the governed
    * reference corpus, then score arriving data against it — scoring
    * a batch against its OWN statistics would let one junk-heavy
    * drop redefine "rare" and "boilerplate" for itself. */
  def fitCorpusStats(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      w: Int = 8,
      minDocs: Int = 2,
  ): (DataFrame, DataFrame) = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val freq = docs
      .select(explode(split(col(textCol), " ")).as("t"))
      .select(TextOps.hash60(col("t")).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val shared = docs
      .select(col(idCol).as("id"),
        explode(TextOps.windowHashesPositional(col(textCol), w)).as("h"))
      .groupBy(col("h"))
      .agg(countDistinct(col("id")).as("wdf"))
      .filter(col("wdf") >= minDocs)
      .select(col("h"))
    (freq, shared)
  }

  /** [[docSignals]] scored against FROZEN reference statistics — the
    * serve step: per-document signals (repetition, bigrams, flags)
    * come from the document alone exactly as in [[docSignals]];
    * the corpus-relative signals read the [[fitCorpusStats]]
    * artifacts instead of the scored batch itself. A token the
    * reference never saw reads cnt = 0: rare by definition
    * (0 ≤ rareMax) and freq_bits = length(bin(0)) = 1, the same bits
    * as a count-1 token — unseen ≈ rarest-possible, the conservative
    * rule. A window outside the frozen shared set is not shared.
    *
    * Two invariants the specs pin: (1) fed statistics fit on the
    * very corpus being scored, this reproduces [[docSignals]]
    * COLUMN-FOR-COLUMN exactly; (2) each document's row depends only
    * on that document + the artifacts, so scoring in micro-batches
    * ([[graft.streaming.CorpusIntake]]'s scored drain) equals the
    * one-shot batch run bit-for-bit — the agreement that makes the
    * streaming quality gate sound.
    *
    * Scale shape: same as [[docSignals]] (the shared token table,
    * one explode+md5 pass, id-keyed assembly; text never shuffles)
    * plus two hash joins against the artifacts — freq on the 8-byte
    * token hash, shared membership as a left-semi; both
    * broadcastable when the reference vocabulary is (the usual
    * case), shuffle joins otherwise. */
  def docSignalsFrozen(
      docs: DataFrame,
      refFreq: DataFrame,
      refShared: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      w: Int = 8,
      rareMax: Long = 2L,
  ): DataFrame = {
    val tokc = docs
      .select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("t"))
      .select(col("id"), TextOps.hash60(col("t")).as("h"))
      .repartition(col("id"))
      .groupBy(col("id"), col("h"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val rep = tokc.groupBy(col("id")).agg(
      sum(col("c")).cast("long").as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).cast("long").as("top_token_cnt"))
    val ref = refFreq.select(col("h"), col("cnt").cast("long").as("cnt"))
    val sur = tokc
      .join(ref, Seq("h"), "left")
      .select(col("id"), col("c"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .groupBy(col("id"))
      .agg(
        sum(col("c") * length(bin(col("cnt")))).cast("long").as("sum_freq_bits"),
        sum(when(col("cnt") <= rareMax, col("c")).otherwise(0L))
          .cast("long").as("n_rare"))
    val big = docs
      .select(col(idCol).as("id"),
        explode(TextOps.windowHashesPositional(col(textCol), 2)).as("h"))
      .repartition(col("id"))
      .groupBy(col("id"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(
        sum(col("c")).cast("long").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max(col("c")).cast("long").as("top_bigram_cnt"))
    val sharedCounts = docs
      .select(col(idCol).as("id"),
        explode(TextOps.windowHashesPositional(col(textCol), w)).as("h"))
      .join(refShared.select(col("h")), Seq("h"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
    val boiler = docs
      .select(col(idCol).as("id"),
        size(TextOps.windowHashesPositional(col(textCol), w)).as("n_windows"))
      .join(sharedCounts, Seq("id"), "left")
      .select(col("id"), col("n_windows"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") /
          greatest(col("n_windows"), lit(1))).as("shared_frac"))
    val flags = docs.select(
      col(idCol).as("id"),
      TextOps.alphaRatio(col(textCol)).as("alpha_ratio"),
      TextOps.meanTokenLen(col(textCol)).as("mean_tok_len"),
      TextOps.qualityKeep(col(textCol)).as("keep"),
      octet_length(col(textCol)).cast("long").as("n_bytes"),
      TextOps.deflateLen(col(textCol)).as("deflate_len"))
    rep
      .join(sur, Seq("id"))
      .join(big, Seq("id"), "left")
      .join(boiler, Seq("id"))
      .join(flags, Seq("id"))
      .select(
        col("id").as(idCol),
        col("n_tokens"),
        col("n_distinct"),
        col("top_token_cnt"),
        ((col("n_tokens") - col("n_distinct")).cast("double") /
          col("n_tokens")).as("dup_token_frac"),
        (col("top_token_cnt").cast("double") / col("n_tokens"))
          .as("top_token_frac"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct_bigrams"), lit(0L)).as("n_distinct_bigrams"),
        coalesce(col("top_bigram_cnt"), lit(0L)).as("top_bigram_cnt"),
        ((coalesce(col("n_bigrams"), lit(0L)) -
          coalesce(col("n_distinct_bigrams"), lit(0L))).cast("double") /
          greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)))
          .as("dup_bigram_frac"),
        (coalesce(col("top_bigram_cnt"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)))
          .as("top_bigram_frac"),
        col("sum_freq_bits"),
        (col("sum_freq_bits").cast("double") / col("n_tokens"))
          .as("mean_freq_bits"),
        col("n_rare"),
        (col("n_rare").cast("double") / col("n_tokens")).as("rare_frac"),
        col("n_windows"),
        col("n_shared"),
        col("shared_frac"),
        col("alpha_ratio"),
        col("mean_tok_len"),
        col("keep"),
        col("n_bytes"),
        col("deflate_len"),
        (col("deflate_len").cast("double") /
          greatest(col("n_bytes"), lit(1L)).cast("double"))
          .as("compression_ratio"))
  }

  /** Fixed weights for [[qualityScore]] over the [[docSignals]]
    * matrix — the public Gopher/CCNet filtering move: a hand-set
    * linear model on the BOUNDED ratio signals (each in [0, 1], so
    * weights are directly interpretable as "full-scale impact on the
    * score"). Repetition and boilerplate push down, letter-ness
    * pushes up; the unbounded count columns are deliberately absent
    * (a weight on n_tokens would make the score scale-dependent).
    * Frozen: the q94 oracle replays this exact IEEE chain. */
  val DefaultQualityWeights: Seq[(String, Double)] = Seq(
    "dup_token_frac" -> -3.0,
    "top_token_frac" -> -2.0,
    "dup_bigram_frac" -> -2.0,
    "top_bigram_frac" -> -1.0,
    "shared_frac" -> -2.0,
    "rare_frac" -> -1.0,
    "alpha_ratio" -> 1.5,
  )
  val DefaultQualityBias: Double = 1.0

  /** Score threshold for [[scoreFilter]]/[[Corpus.clean]]'s hook:
    * 0.0 sits just under the observed p10 of the default-weight score
    * on the test corpus (median 0.53) — a ~10% drop rate, the usual
    * quality-filter posture of keeping most of the corpus and cutting
    * the repetitive/boilerplate tail. */
  val DefaultQualityThreshold: Double = 0.0

  /** LINEAR quality score over a [[docSignals]] frame: one map-side
    * projection appending `score` = bias + Σ wᵢ·xᵢ, folded in the
    * DECLARED weight order so the double chain is a fixed IEEE
    * expression both engines evaluate identically (left-associated
    * adds of products — oracle-checkable, q94). The sigmoid is NOT
    * applied here: exp() is libm (not bit-portable), and sigmoid is
    * monotone, so every keep/rank decision on sigmoid(score) is the
    * same decision on `score` — [[sigmoid]] exists for the cases
    * that genuinely want a probability shape. Broadcast-free: the
    * weight vector is compiled into the projection (a dozen
    * constants ride the plan, not a join). */
  def qualityScore(
      signals: DataFrame,
      weights: Seq[(String, Double)] = DefaultQualityWeights,
      bias: Double = DefaultQualityBias,
      scoreCol: String = "score",
  ): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(!signals.columns.contains(scoreCol),
      s"input already has a '$scoreCol' column")
    val z = weights.foldLeft(lit(bias)) { case (acc, (c, w)) =>
      acc + col(c) * lit(w)
    }
    signals.withColumn(scoreCol, z)
  }

  /** Logistic squash of a linear score — monotone, so thresholding
    * sigmoid(z) ≡ thresholding z (which is why the oracled surface
    * stays linear; see [[qualityScore]]). */
  def sigmoid(z: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lit(1.0) / (lit(1.0) + exp(-z))

  /** Model-based quality FILTER: keep the docs whose [[qualityScore]]
    * over [[docSignals]] reaches `minScore` — the step that makes the
    * q84 feature matrix actionable. Shape: the signal pipeline's own
    * aggregates (id-partitioned, §docSignals), then ONE left-semi
    * join of the corpus against the (id)-only keeper projection —
    * document text crosses no new shuffle. */
  def scoreFilter(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      weights: Seq[(String, Double)] = DefaultQualityWeights,
      bias: Double = DefaultQualityBias,
      minScore: Double = DefaultQualityThreshold,
  ): DataFrame = {
    val keepers = qualityScore(docSignals(docs, idCol, textCol), weights, bias)
      .filter(col("score") >= minScore)
      .select(col(idCol))
    docs.join(keepers, Seq(idCol), "left_semi")
  }

  /** Cross-SOURCE duplication matrix — the corpus-governance view of
    * exact dedup: for every unordered source pair (a <= b), how many
    * duplicate document PAIRS span them (a == b counts within-source
    * pairs). "Source X is 40% mirrored in source Y" decides which
    * feed to cut, dedup's per-doc output doesn't.
    *
    * Shape: pair counts come from per-fingerprint SOURCE COUNT
    * vectors, never from materialized pairs — groupBy (60-bit fp,
    * source) with map-side partial, then a self-join on fp whose fan
    * per key is the number of sources sharing that content (bounded
    * by the source catalog, not by dup-cluster size: a 1M-copy
    * cluster is one row per source here, where a pair-explode would
    * be 10^12 rows). n_a·n_b / n·(n−1)/2 arithmetic on the counts. */
  def sourceOverlapMatrix(
      docs: DataFrame,
      textCol: String = "text",
      srcCol: String = "source",
  ): DataFrame = {
    val fpc = docs
      .select(TextOps.hash60(col(textCol)).as("fp"), col(srcCol).as("src"))
      .groupBy(col("fp"), col("src"))
      .agg(count(lit(1)).as("n"))
    val a = fpc.select(col("fp"), col("src").as("src_a"), col("n").as("n_a"))
    val b = fpc.select(col("fp"), col("src").as("src_b"), col("n").as("n_b"))
    a.join(b, Seq("fp"))
      .filter(col("src_a") <= col("src_b"))
      .select(col("src_a"), col("src_b"),
        // integral throughout: n(n−1) is always even, so `div 2` is
        // exact and both branches stay LongType — Column `/` would
        // route through double and lose exactness past 2^53
        when(col("src_a") === col("src_b"),
          expr("n_a * (n_a - 1) div 2"))
          .otherwise(col("n_a") * col("n_b")).as("pairs"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(col("pairs")).cast("long").as("dup_pairs"))
      .filter(col("dup_pairs") > 0)
  }

  /** [[sourceOverlapMatrix]] over an ALREADY-MINED duplicate-pair
    * table (near-dup pairs from the LSH miner, embedding dups, span
    * repeats — anything shaped (aCol, bCol)): each pair attributes to
    * its unordered source pair. The exact-dup matrix sees only
    * identical content; feeding this the verified near-dup pairs
    * answers the real governance question — which feeds PARAPHRASE
    * each other. Two hash joins projecting (id, source) off the
    * corpus, then a count over the tiny source×source key space. */
  def sourceOverlapFromPairs(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String = "doc_id",
      srcCol: String = "source",
      aCol: String = "id_a",
      bCol: String = "id_b",
  ): DataFrame = {
    val src = docs.select(col(idCol).as("graft_id_"), col(srcCol).as("graft_src_"))
    pairs
      .join(src.withColumnRenamed("graft_id_", aCol)
        .withColumnRenamed("graft_src_", "graft_sa_"), Seq(aCol))
      .join(src.withColumnRenamed("graft_id_", bCol)
        .withColumnRenamed("graft_src_", "graft_sb_"), Seq(bCol))
      .select(
        least(col("graft_sa_"), col("graft_sb_")).as("src_a"),
        greatest(col("graft_sa_"), col("graft_sb_")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("dup_pairs"))
  }

  /** Top-k salient terms per SOURCE (tf over source-document-frequency
    * — how many sources carry the term): "what characterizes this
    * feed" for mix design. The shape where [[graft.expr.TopKAgg]]
    * matters most: group count is the SOURCE CATALOG (tiny) while the
    * scored table is the full vocabulary per source — the window form
    * would shuffle and sort every (source, term) row into a handful
    * of partitions; the heap reduces each map task to k rows per
    * source before the exchange. */
  def sourceSalientTerms(
      docs: DataFrame,
      textCol: String = "text",
      srcCol: String = "source",
      k: Int = 5,
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = docs
      .select(col(srcCol).as("src"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("src"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val sf = tf.groupBy(col("term")).agg(count(lit(1)).as("sf"))
    val payload = struct(col("term"), col("tf"), col("sf"), col("score"))
    tf.join(sf, Seq("term"))
      .select(col("src"), col("term"), col("tf"), col("sf"),
        (col("tf").cast("double") / col("sf")).as("score"))
      .groupBy(col("src"))
      .agg(graft.expr.TopKAgg.topK(col("score"), payload, k).as("graft_top_"))
      .select(col("src").as(srcCol),
        posexplode(col("graft_top_")).as(Seq("graft_r_", "e")))
      .select(col(srcCol), col("e.term").as("term"), col("e.tf").as("tf"),
        col("e.sf").as("sf"), col("e.score").as("score"),
        (col("graft_r_") + 1).cast("int").as("rank"))
  }

  /** COLLOCATION mining — adjacent word pairs that co-occur far more
    * than their parts predict (multi-word expressions: "San
    * Francisco", "machine learning") ranked by LIFT, the exact-ratio
    * form of PMI: lift = p(ab) / (p(a)·p(b)) =
    * (c_ab·N_uni·N_uni) / (N_big·c_a·c_b). PMI itself is
    * log(lift) — monotone in it — and the log is EXACTLY what makes
    * PMI un-oracleable (libm rounding); ranking by the raw ratio
    * keeps the whole statistic a fixed chain of double products and
    * one division over exact integer counts, bit-identical across
    * engines. `minCount` floors rare pairs (a 1-occurrence pair has
    * huge lift and zero evidence — the standard PMI pathology).
    *
    * Shape: one token explode reduced to unigram counts, one pair
    * explode reduced to bigram counts (both partial-aggregated;
    * term/pair strings bound the key space at vocabulary scale, the
    * [[salientTerms]] discipline), corpus totals as two 1-row
    * aggregates crossed in (broadcast), top-k by TakeOrdered — no
    * global sort. Output: (term_a, term_b, pair_cnt, cnt_a, cnt_b,
    * lift), ties (lift desc, pair asc). */
  def collocations(
      docs: DataFrame,
      textCol: String = "text",
      minCount: Long = 5L,
      k: Int = 20,
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = split(col(textCol), " ")
    val pairsArr = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("a"), element_at(toks, i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))
    val uni = docs
      .select(explode(toks).as("t"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("c"))
    val big = docs
      .select(explode(pairsArr).as("p"))
      .select(col("p.a").as("term_a"), col("p.b").as("term_b"))
      .groupBy(col("term_a"), col("term_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minCount)
    val totals = uni.agg(sum(col("c")).cast("long").as("n_uni"))
      .crossJoin(docs.select(
        (greatest(size(toks) - 1, lit(0))).as("nb"))
        .agg(sum(col("nb")).cast("long").as("n_big")))
    big
      .join(uni.select(col("t").as("term_a"), col("c").as("cnt_a")), Seq("term_a"))
      .join(uni.select(col("t").as("term_b"), col("c").as("cnt_b")), Seq("term_b"))
      .crossJoin(broadcast(totals))
      .select(col("term_a"), col("term_b"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"),
        // fixed left-to-right chain: both engines parse a*b*c/(d*e*f)
        // into the identical tree over exact-integer-valued doubles
        ((col("pair_cnt").cast("double") * col("n_uni") * col("n_uni")) /
          (col("n_big").cast("double") * col("cnt_a") * col("cnt_b")))
          .as("lift"))
      .orderBy(col("lift").desc, col("term_a"), col("term_b"))
      .limit(k)
  }

  /** Token FREQUENCY SPECTRUM — how many distinct token types occur
    * exactly c times (the Zipf/Heaps audit: a healthy natural corpus
    * has a long 1-occurrence tail; a templated or looping one piles
    * types at high counts). Two partial-aggregated reductions — token
    * hash → count, count → type tally — both over 8-byte keys; the
    * output is at most |distinct counts| rows. */
  def frequencySpectrum(
      docs: DataFrame,
      textCol: String = "text",
  ): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("t"))
      .select(TextOps.hash60(col("t")).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("c").as("occurrences"))
      .agg(count(lit(1)).as("n_types"))

  /** Adjacent character-pair frequencies over whitespace tokens — the
    * statistic one round of BPE tokenizer induction maximizes (the
    * first merge is the top pair; re-running after merging yields the
    * next). Returns the top-k pairs by (count desc, pair asc).
    *
    * Shape: each doc flattens to its pair list in ONE map-side
    * projection (nested transform over the token array — tokens never
    * become rows), then a single explode feeds a groupBy on the
    * 2-char pair with partial aggregation; the exchange carries
    * 2-character keys with pre-combined counts, and the top-k is a
    * TakeOrdered, not a global sort. Pairs never cross token
    * boundaries (BPE merges within words). */
  def bpePairCounts(
      docs: DataFrame,
      textCol: String = "text",
      k: Int = 20,
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = split(col(textCol), " ")
    // guard: Spark's sequence(1, 0) counts DOWN — a 1-char token must
    // map to an explicitly empty pair list, not sequence(1, 0)
    val pairs = flatten(transform(toks, t =>
      when(length(t) >= 2,
        transform(sequence(lit(1), length(t) - 1), i => t.substr(i, lit(2))))
        .otherwise(array().cast("array<string>"))))
    docs
      .select(explode(pairs).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
  }
}
