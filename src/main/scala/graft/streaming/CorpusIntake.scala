package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.llm.TextOps

/** Streaming training-corpus intake — the LLM-side twin of
  * [[StreamingSalesPipeline]]: documents arrive continuously and each
  * micro-batch flows through
  *
  *   content-fingerprint dedup (watermark-bounded, first arrival
  *   wins — the at-least-once transport guard at the 60-bit content
  *   grain, so a re-sent or re-crawled identical document is dropped
  *   on intake)
  *     → PII scrub ([[TextOps.redactPii]])
  *     → quality gate ([[TextOps.qualityKeep]])
  *     → atomic append to a [[graft.io.TableStore]]
  *
  * Everything before the sink is map-side except the dedup's id-state
  * shuffle; with a [[graft.io.SnapshotBucketedStore]] sink each batch
  * commit is a single manifest rename, so a crash mid-drain leaves the
  * previous complete corpus snapshot. Intake dedup is TRANSPORT-level
  * (exact content, bounded state); the full-history batch operators
  * ([[graft.llm.Dedup]], [[graft.llm.Corpus]]) remain the periodic
  * compaction pass that catches near-dups and cross-watermark dups.
  */
object CorpusIntake {

  /** The pure streaming transform (source- and sink-agnostic; also
    * runs on batch frames via Spark's unified API — minus the
    * within-watermark dedup, which is streaming-only). */
  def transform(
      docs: DataFrame,
      tsCol: String = "ts",
      textCol: String = "text",
      watermarkDelay: String = "1 hour",
  ): DataFrame =
    docs
      .withColumn("_fp", TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_fp")
      .withColumn(textCol, TextOps.redactPii(col(textCol)))
      .filter(TextOps.qualityKeep(col(textCol)))
      .drop("_fp")

  /** Drain everything currently available into `store` table `table`
    * (AvailableNow — the batch-drain run mode), committing per
    * micro-batch. Returns when the drain finishes. */
  def drainTo(
      docs: DataFrame,
      store: graft.io.TableStore,
      table: String,
      checkpoint: String,
      tsCol: String = "ts",
      textCol: String = "text",
      watermarkDelay: String = "1 hour",
  ): Unit = {
    val q = transform(docs, tsCol, textCol, watermarkDelay).writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      // appendIfNew: a crash after the store's manifest commit but
      // before the streaming checkpoint commit replays this epoch —
      // the store recognizes the batch id and skips, keeping the
      // intake exactly-once (for SnapshotBucketedStore sinks; plain
      // stores degrade to at-least-once, caught by compaction dedup)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.appendIfNew(table, batch, batchId): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** [[drainTo]] with HISTORIC dedup: the watermark-bounded intake
    * dedup catches transport replays inside the delay window — a
    * re-crawl of the same document arriving DAYS later sails past it
    * and re-enters the corpus (state for its fingerprint was evicted
    * with the watermark). This drain additionally anti-joins each
    * micro-batch's content fingerprints against the fingerprints of
    * everything ALREADY IN the table — the corpus itself is the dedup
    * state, so there is no side fingerprint table to drift and the
    * exactly-once append stays a single atomic commit. Fingerprints
    * compare post-scrub on both sides (the stored text is the
    * scrubbed text; scrubbing is deterministic, so identical raw
    * inputs still collide).
    *
    * Scale: the history side projects ONLY the fingerprint — a
    * columnar scan of one derived 8-byte column per batch, not the
    * corpus (and on a bucketed store, only live generations). For
    * hot paths put a [[graft.ops.Bloom]] of stored fingerprints in
    * front as a map-side prefilter; the exact anti-join stays for
    * correctness. */
  def drainDedupedTo(
      docs: DataFrame,
      store: graft.io.TableStore,
      table: String,
      checkpoint: String,
      tsCol: String = "ts",
      textCol: String = "text",
      watermarkDelay: String = "1 hour",
  ): Unit = {
    val q = transform(docs, tsCol, textCol, watermarkDelay).writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val fresh = store.read(table) match {
          case Some(existing) =>
            val seen = existing
              .select(TextOps.fingerprint(col(textCol)).as("_fp"))
              .distinct()
            batch
              .withColumn("_fp", TextOps.fingerprint(col(textCol)))
              .join(seen, Seq("_fp"), "left_anti")
              .drop("_fp")
          case None => batch
        }
        store.appendIfNew(table, fresh, batchId): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** [[drainTo]] with the MODEL-BASED quality gate in place of the
    * heuristic one: each micro-batch is scored against FROZEN
    * reference-corpus statistics ([[graft.llm.CorpusStats
    * .fitCorpusStats]] artifacts — fit once on the governed corpus,
    * served here) and only documents with
    * score ≥ `minScore` land. Scoring a batch against its own
    * statistics would let a junk-heavy drop redefine "rare" for
    * itself — the frozen split is what makes a PER-BATCH gate mean
    * the same thing as the batch-mode [[graft.llm.CorpusStats
    * .scoreFilter]]: every signal depends only on the document and
    * the artifacts, so the streamed corpus equals the one-shot
    * filtered corpus EXACTLY (spec-pinned), batch boundaries
    * invisible. Same exactly-once sink discipline as [[drainTo]].
    *
    * The artifacts are plain DataFrames (typically
    * `store.read("corpus_stats_*")`) — read once, reused across
    * batches; broadcastable when the reference vocabulary is. */
  def drainScoredTo(
      docs: DataFrame,
      store: graft.io.TableStore,
      table: String,
      refFreq: DataFrame,
      refShared: DataFrame,
      checkpoint: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      minScore: Double = graft.llm.CorpusStats.DefaultQualityThreshold,
      weights: Seq[(String, Double)] = graft.llm.CorpusStats.DefaultQualityWeights,
      bias: Double = graft.llm.CorpusStats.DefaultQualityBias,
  ): Unit = {
    import graft.llm.CorpusStats
    val q = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val keepers = CorpusStats.qualityScore(
            CorpusStats.docSignalsFrozen(batch, refFreq, refShared,
              idCol, textCol),
            weights, bias)
          .filter(col("score") >= minScore)
          .select(col(idCol))
        store.appendIfNew(table,
          batch.join(keepers, Seq(idCol), "left_semi"), batchId): Unit
      }
      .start()
    q.awaitTermination()
  }
}
