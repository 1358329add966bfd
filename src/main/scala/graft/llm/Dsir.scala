package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling — the published recipe
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023) for picking, out of a huge raw crawl,
  * the slice that *looks like* a small curated target corpus: fit
  * cheap hashed n-gram feature distributions on both corpora, weight
  * every raw document by how much more likely its features are under
  * the target distribution than the raw one, and resample by that
  * weight.
  *
  * This implementation keeps the published pipeline shape — hashed
  * bigram features, per-bucket probability ratios with add-one
  * smoothing, per-document accumulation, weighted resampling — and
  * swaps the one piece that cannot be made bit-stable across engines:
  * the log. The paper scores log p_tgt(f)/p_raw(f) summed over
  * feature occurrences; libm log differs in the last ulp between
  * JVMs and DuckDB, so instead each bucket's weight is the SCALED
  * INTEGER probability ratio
  *
  *   w(b) = ((tgt_b+1) · (rawTot+B) · Scale) div ((raw_b+1) · (tgtTot+B))
  *
  * (add-one smoothing over B buckets on both sides, one integer
  * division — the q84/q94/salientTerms exact-surrogate rule). The
  * per-doc score is the exact long SUM of its occurrences' weights:
  * the same "target-like features, counted with multiplicity" signal,
  * order-free and hash-matchable. Resampling composes with
  * [[Splits.systematicWeightedSample]] (X137): score IS the
  * systematic-PPS mass column, so the full DSIR loop — fit, score,
  * resample — is deterministic end to end.
  *
  * Feature hashing rides the minhash chain's md5 machinery
  * ([[TextOps.hash28]] per token, [[TextOps.windowHashesPositional]]
  * bigram combination, duplicates KEPT — occurrences, not the shingle
  * set) so the DuckDB oracle replays every hash bit-for-bit.
  *
  * Scale shape: fitting is two map-side-combinable groupBy-counts
  * whose keys are ints in [0, B) — the shuffle carries at most B
  * rows per map task regardless of corpus size. The weight table is
  * ≤ B rows → broadcast to the scoring join; scoring is one
  * explode + broadcast-hash-join + map-side-combined sum, never an
  * all-pairs or driver-side pass.
  *
  * Overflow headroom (exact bounds): the weight numerator
  * (tgt_b+1)·(rawTot+B)·Scale is computed in DECIMAL(38,0), so the
  * multiply is safe while (tgt_b+1)·(rawTot+B) < 10³² — unreachable
  * for any real corpus (the long-arithmetic form it replaces wrapped
  * silently past (tgt_b+1)·(rawTot+B) ≈ 9.2e12, i.e. a few e6
  * occurrences per side at concentrated buckets). The DIVIDED weight
  * must still fit a signed long: w ≤ (rawTot+B)·Scale, so fitting
  * requires rawTot < 2⁶³/Scale ≈ 9.2e12 bigram occurrences (~35 TB
  * of text at default Scale) — [[fitWeights]] enforces this with a
  * loud `require`; beyond it, lower Scale (the ratio, not the
  * magnitude, carries the signal). Per-doc scores sum L_doc weights,
  * each ≲ Scale·rawTot/tgtTot in the worst case — document that
  * bound rather than guard it: it only binds when a single doc holds
  * billions of target-exclusive bigrams.
  *
  * Reference anchor: the reference engine has no selection machinery
  * at all (lambda.py filters on fixed predicates only); this is part
  * of the mandated LLM-pipeline surface (brief §"training-data
  * pipeline").
  */
object Dsir {

  /** Weight scale: ratios land in [Scale/..., ...·Scale] as integers.
    * 1e6 keeps four digits of ratio resolution past the smoothing
    * floor while leaving ~1e12 of long headroom at sf-test sizes. */
  val Scale = 1000000L

  /** Default hashed-feature domain. Prime (not a power of two) so the
    * mod spreads the 31-bit bigram hashes evenly; ~10k buckets is the
    * published fasttext-hashing regime for bigram features. */
  val DefaultBuckets = 10007

  /** Per-occurrence hashed bigram features of one corpus slice:
    * (id, bucket), one row per adjacent token pair, duplicates kept.
    * Map-side only — explode of a compiled per-row hash loop. */
  def featureOccurrences(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = DefaultBuckets,
  ): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    docs
      .select(col(idCol).as("id"),
        explode(TextOps.windowHashesPositional(col(textCol), 2)).as("h"))
      .select(col("id"), (col("h") % buckets).cast("int").as("bucket"))
  }

  /** Bucket histogram of one corpus slice: (bucket, cnt), non-zero
    * buckets only (absent buckets take the smoothing floor at weight
    * time). One map-side-combined groupBy on an int key. */
  def bucketCounts(
      docs: DataFrame,
      textCol: String = "text",
      buckets: Int = DefaultBuckets,
  ): DataFrame =
    docs
      .select(explode(TextOps.windowHashesPositional(col(textCol), 2)).as("h"))
      .select((col("h") % buckets).cast("int").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** One-pass fit: the importance-weight table PLUS the smoothed
    * default weight for buckets absent from both corpora, computed
    * from a single scan of each corpus. The two bucket histograms
    * (≤ B rows each) are localCheckpointed, so the totals action and
    * the weight-table job both read the tiny cached frames instead of
    * re-hashing the text — one text scan per corpus, total, however
    * many downstream actions run. This is the form [[select]] and the
    * catalog use; [[importanceWeights]] / [[defaultWeightOf]] remain
    * as thin views over it.
    *
    * w = ((tgt+1)·(rawTot+B)·Scale) div ((raw+1)·(tgtTot+B)) — the
    * products are computed in DECIMAL(38,0) (overflow-proof; see the
    * object doc for the exact bounds), the `div` is floor division
    * on non-negatives in both engines and lands back in a long. */
  def fitWeights(
      raw: DataFrame,
      target: DataFrame,
      textCol: String = "text",
      buckets: Int = DefaultBuckets,
  ): (DataFrame, Long) = {
    val rawC = bucketCounts(raw, textCol, buckets).localCheckpoint()
    val tgtC = bucketCounts(target, textCol, buckets).localCheckpoint()
    val rawTot = rawC.agg(coalesce(sum("cnt"), lit(0L))).head.getLong(0)
    val tgtTot = tgtC.agg(coalesce(sum("cnt"), lit(0L))).head.getLong(0)
    require(rawTot <= Long.MaxValue / Scale - buckets,
      s"raw corpus has $rawTot bigram occurrences; weights would " +
        s"overflow a long at Scale=$Scale — lower Dsir.Scale " +
        "(the ratio carries the signal, not the magnitude)")
    val w = rawC.withColumnRenamed("cnt", "raw_cnt")
      .join(tgtC.withColumnRenamed("cnt", "tgt_cnt"), Seq("bucket"), "full_outer")
      .withColumn("graft_num_",
        (coalesce(col("tgt_cnt"), lit(0L)) + 1L).cast("decimal(38,0)") *
          lit(rawTot + buckets.toLong) * lit(Scale))
      .withColumn("graft_den_",
        (coalesce(col("raw_cnt"), lit(0L)) + 1L).cast("decimal(38,0)") *
          lit(tgtTot + buckets.toLong))
      .select(col("bucket"),
        expr("graft_num_ div graft_den_").as("weight"))
    (w, ((rawTot + buckets.toLong) * Scale) / (tgtTot + buckets.toLong))
  }

  /** The fitted importance-weight table alone: (bucket, weight) for
    * every bucket present in either corpus. Callers needing the
    * smoothed default too should use [[fitWeights]] — it computes
    * both from one scan of each corpus. */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      textCol: String = "text",
      buckets: Int = DefaultBuckets,
  ): DataFrame = fitWeights(raw, target, textCol, buckets)._1

  /** Score every raw document against a fitted weight table:
    * (idCol, n_feats, score). score = exact long sum of the doc's
    * occurrences' weights (multiplicity kept — a doc saturated with
    * target-like bigrams outscores one that mentions them once);
    * buckets unseen at fit time take the smoothed default weight
    * computed from the totals the weight table was fitted on.
    * Feature-less docs (< 2 tokens) score 0 — they carry no evidence
    * either way and must not vanish from the frame (the funnel
    * accounts for every input row). */
  def scoreDocs(
      docs: DataFrame,
      weights: DataFrame,
      defaultWeight: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = DefaultBuckets,
  ): DataFrame = {
    val occ = featureOccurrences(docs, idCol, textCol, buckets)
    val scored = occ
      .join(broadcast(weights), Seq("bucket"), "left_outer")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("weight"), lit(defaultWeight))).as("score"))
    val ids = docs.select(col(idCol))
    ids.join(scored, ids(idCol) === scored("id"), "left_outer")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** The composed selection: fit weights raw-vs-target, score the raw
    * corpus, and systematic-PPS resample by score (X137 — exact,
    * zero randomness; `step` = total score mass between picks). The
    * one-stop form a pipeline calls; each stage is independently
    * available above and independently oracled. */
  def select(
      raw: DataFrame,
      target: DataFrame,
      step: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = DefaultBuckets,
  ): DataFrame = {
    val (w, dflt) = fitWeights(raw, target, textCol, buckets)
    val scored = scoreDocs(raw, w, dflt, idCol, textCol, buckets)
    Splits.systematicWeightedSample(scored, "score", Seq(idCol), step)
  }

  /** The smoothed default weight for buckets absent from BOTH fitted
    * corpora: the weight formula at raw_cnt = tgt_cnt = 0. Callers
    * also needing the weight table should use [[fitWeights]], which
    * returns both from one scan of each corpus (the X134 fit/serve
    * rule: freeze table + default together as one artifact). */
  def defaultWeightOf(
      raw: DataFrame,
      target: DataFrame,
      textCol: String = "text",
      buckets: Int = DefaultBuckets,
  ): Long = fitWeights(raw, target, textCol, buckets)._2
}
