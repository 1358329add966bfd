package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed PRE-TRAINING DATA pipeline — the end-to-end flow the
  * individual operators exist for, wired in the canonical order:
  *
  *   [[Corpus.clean]]           exact dedup → MinHash-LSH near-dup →
  *                              Gopher-style quality filter
  *   [[Corpus.dedupSpans]]      cross-doc repeated-SPAN excision
  *                              (boilerplate removal that keeps docs)
  *   [[Splits.tokenBudgetSample]] optional absolute per-group token
  *                              budgets (the training-mix recipe)
  *   [[Splits.systematicWeightedSample]] optional exact
  *                              proportional downsample by token
  *                              mass (one doc per `step` tokens,
  *                              offset-seeded)
  *   [[Splits.repeatFactorSample]] optional epochs-per-group
  *                              upsampling (replicas carry a
  *                              deterministic epoch id and shuffle
  *                              independently via a composite
  *                              replica key)
  *   [[Splits.deterministicShuffle]] seed-keyed global decorrelation
  *   [[graft.ops.Rank.globalRank]] dense packing ids in shuffled
  *                              order — no single-partition window
  *   [[Splits.packedSequenceText]] fixed-length training rows
  *
  * Every stage is the already-oracled operator; this object owns only
  * the wiring and the two seams between them: docs that span-removal
  * empties are dropped before packing (an empty text would inject an
  * empty token into the stream), and the pack order is the SHUFFLED
  * order made total by ranking on (shuffle_key, id) — hash ties
  * cannot reorder the stream between runs or engines.
  *
  * Output: (seq_id, text, n_tokens) — the training rows. Fully
  * deterministic: same corpus + same config → byte-identical
  * sequences on any cluster (spec-pinned, including a partitioning-
  * invariance run and an exact stream round-trip). */
object TrainingData {

  final case class Config(
      // X171 WET extraction as stage 0 (off by default: pre-extracted
      // corpora keep their bytes; crawls turn it on so every later
      // stage — dedup fingerprints included — sees prose, not chrome)
      stripMarkup: Boolean = false,
      n: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      spanMinTokens: Int = 8,
      spanRounds: Int = 1,
      budgets: Option[(String, Map[String, Long], Long)] = None, // (groupCol, budgets, default)
      sampleEvery: Option[(Long, Long)] = None, // (step, offset): X137 systematic token-mass downsample after the mix
      repeats: Option[(String, Map[String, Double], Double)] = None, // (groupCol, factors, default)
      shuffleSeed: String = "train",
      seqLen: Int = 256,
  )

  def prepare(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      cfg: Config = Config(),
  ): DataFrame = {
    val src =
      if (cfg.stripMarkup)
        docs.withColumn(textCol, TextOps.stripMarkup(col(textCol)))
          .filter(length(col(textCol)) > 0) // chrome-only pages vanish
      else docs
    val cleaned = Corpus.clean(src, idCol, textCol,
      n = cfg.n, threshold = cfg.threshold, numHashes = cfg.numHashes,
      bands = cfg.bands)
    val spanned = Corpus.dedupSpans(
      cleaned.select(col(idCol), col(textCol)), idCol, textCol,
      minTokens = cfg.spanMinTokens, rounds = cfg.spanRounds)
      // span removal can empty a doc; an empty text would inject an
      // empty token into the packed stream
      .filter(length(col(textCol)) > 0)
    val mixed = cfg.budgets match {
      case Some((groupCol, budgets, default)) =>
        // budgets group on a doc attribute — join it back from the
        // input (dedupSpans outputs only (id, text))
        Splits.tokenBudgetSample(
          spanned.join(docs.select(col(idCol), col(groupCol)), Seq(idCol)),
          idCol, textCol, groupCol, budgets, default)
          .select(col(idCol), col(textCol))
      case None => spanned
    }
    // optional systematic downsample by token mass (X137): the
    // relative-fraction companion of the absolute `budgets` — "keep
    // one doc per `step` tokens", exact and seedable via the offset.
    // Selection semantics: a doc straddling several grid points still
    // keeps ONE copy (upsampling is `repeats`' job, with its own
    // replica-shuffle discipline).
    val sampled = cfg.sampleEvery match {
      case Some((step, off)) =>
        Splits.systematicWeightedSample(
          mixed.withColumn("graft_tok_",
            TextOps.tokenCount(col(textCol)).cast("long")),
          "graft_tok_", Seq(idCol), step, off)
          .select(col(idCol), col(textCol))
      case None => mixed
    }
    cfg.repeats match {
      case None =>
        val ordered = Splits.deterministicShuffle(sampled, idCol, cfg.shuffleSeed)
        // dense pack ids in shuffled order; rank ties on (key, id) make
        // the order total even under 60-bit hash collisions
        val ranked = graft.ops.Rank.globalRank(ordered, Seq("shuffle_key", idCol))
          .select(col("rank").as("graft_pack_id_"), col(textCol))
        Splits.packedSequenceText(ranked, "graft_pack_id_", textCol, cfg.seqLen)
      case Some((groupCol, factors, default)) =>
        // epochs-per-group upsampling: replicas get a composite
        // REPLICA id (id "#" epoch) so each copy shuffles to its own
        // independent position — keying the shuffle on the bare id
        // would leave a doc's epochs adjacent in the stream, exactly
        // the correlation the shuffle exists to destroy
        val repeated = Splits.repeatFactorSample(
          sampled.join(docs.select(col(idCol), col(groupCol)), Seq(idCol)),
          idCol, groupCol, factors, default)
          .select(col(idCol), col(textCol), col("epoch"))
          .withColumn("graft_rid_",
            concat(col(idCol).cast("string"), lit("#"),
              col("epoch").cast("string")))
        val ordered =
          Splits.deterministicShuffle(repeated, "graft_rid_", cfg.shuffleSeed)
        val ranked = graft.ops.Rank
          .globalRank(ordered, Seq("shuffle_key", "graft_rid_"))
          .select(col("rank").as("graft_pack_id_"), col(textCol))
        Splits.packedSequenceText(ranked, "graft_pack_id_", textCol, cfg.seqLen)
    }
  }
}
