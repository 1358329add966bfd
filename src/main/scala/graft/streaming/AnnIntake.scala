package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.llm.{Dedup, TextOps}

/** Streaming maintenance of near-duplicate CANDIDATE state — the ANN
  * twin of [[SketchIntake]]'s sketch+candidates pattern: documents
  * stream in, but what the store accumulates is only their MinHash
  * signatures and LSH band-bucket memberships (a few hundred bytes per
  * doc); the text itself never becomes state. Near-dup pairs —
  * including pairs whose members arrived in different drains, which a
  * per-batch dedup can never see — are then a merge-on-read question:
  * self-join the accumulated buckets, verify by signature agreement.
  *
  * Per micro-batch, two exactly-once generations land (same
  * [[graft.io.TableStore.appendIfNew]] discipline as the sketch
  * intake): `<table>` holds (id, m0..m{n−1}) signatures, and
  * `<table>_buckets` holds (id, band, band_key) memberships. Both are
  * map-side + one partial-agg shuffle per batch; both compact with
  * [[graft.io.SnapshotBucketedStore.compactLogs]].
  *
  * The streaming trade, stated honestly: by default verification is
  * the MinHash ESTIMATE of Jaccard (share of agreeing signature
  * slots), not the exact n-gram Jaccard the batch miner re-computes
  * from text ([[Dedup.nearDupPairs]]) — the stream retains no text
  * to verify against, and the batch miner remains the periodic exact
  * pass. `exactWindow > 0` narrows that trade (SCALE.md §8 item 12):
  * each doc's DISTINCT SHINGLE-HASH SET — all exact n-gram Jaccard
  * needs, no raw text — is retained for the last `exactWindow`
  * drains in `<table>_grams`, candidates incident to each batch
  * verify EXACTLY in-stream against the window (bit-equal to the
  * batch miner's verdict, AnnIntakeSpec), verified pairs accumulate
  * monotonically in `<table>_pairs`, and expired gram generations
  * drop at the window edge ([[graft.io.SnapshotBucketedStore
  * .deleteRange]] on the batch stamp — metadata-only when `stamp` is
  * a stats column), so state stays BOUNDED by the window. Pairs
  * whose counterpart expired before meeting fall to the periodic
  * batch pass — the residual (and now much narrower) trade. */
object AnnIntake {

  /** Signature + bucket rows for one batch of documents (also the
    * batch-mode form, for backfills). */
  private[streaming] def signatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      numHashes: Int,
  ): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), TextOps.shingleHashes(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    Dedup.minhashSigAgg(sh, numHashes)
  }

  private def bandKeyCols(numHashes: Int, bands: Int) = {
    val rowsPerBand = numHashes / bands
    (0 until bands).map { b =>
      concat_ws("_",
        (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}")): _*)
    }
  }

  /** Drain everything currently available (AvailableNow), appending
    * one signature generation and one bucket generation per
    * micro-batch, exactly-once. With `maintainLabels = true` (which
    * requires a [[graft.io.SnapshotBucketedStore]] — the batch-marked
    * replace is the exactly-once hinge) each micro-batch ALSO runs
    * [[updateLabels]], keeping `<table>_labels` live. */
  def drainTo(
      docs: DataFrame,
      store: graft.io.TableStore,
      table: String,
      checkpoint: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      maintainLabels: Boolean = false,
      threshold: Double = 0.5,
      maxBucketWidth: Int = 100,
      exactWindow: Int = 0,
  ): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(!maintainLabels || store.isInstanceOf[graft.io.SnapshotBucketedStore],
      "label maintenance needs SnapshotBucketedStore's batch-marked replace")
    require(exactWindow == 0 || store.isInstanceOf[graft.io.SnapshotBucketedStore],
      "the exact-verify window needs SnapshotBucketedStore's stamp-ranged deleteRange")
    val q = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the raw batch has a second consumer (the exact-verify gram
        // pass) only when the window is on — checkpoint it then;
        // the plain path hands the batch straight to the one
        // signature pass, no eager materialization
        val b = if (exactWindow > 0) batch.localCheckpoint() else batch
        val sig = signatures(b, idCol, textCol, n, numHashes)
          .localCheckpoint() // two consumers, one signature pass
        store.appendIfNew(table, sig, batchId): Unit
        val buckets = sig
          .select(col("id"), posexplode(array(bandKeyCols(numHashes, bands): _*)))
          .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_key"))
          .localCheckpoint()
        store.appendIfNew(s"${table}_buckets", buckets, batchId): Unit
        if (maintainLabels)
          updateLabels(store.asInstanceOf[graft.io.SnapshotBucketedStore],
            table, buckets, batchId, numHashes, threshold, maxBucketWidth): Unit
        if (exactWindow > 0)
          verifyExactWindow(store.asInstanceOf[graft.io.SnapshotBucketedStore],
            table, b, buckets, batchId, idCol, textCol, n, threshold,
            maxBucketWidth, exactWindow)
      }
      .start()
    q.awaitTermination()
  }

  /** INCREMENTAL near-dup component-label maintenance — what a
    * continuously-crawling corpus actually runs, instead of
    * recomputing CC from scratch per batch: `<table>_labels` holds
    * (id, component) for every verified-edge-incident doc, and each
    * micro-batch merges only what the batch's NEW edges touch.
    *
    * The union-find-by-contraction step:
    *   1. new edges = THIS batch's bucket memberships probing the
    *      accumulated bucket table (keyed equi-join — new docs visit
    *      only their own buckets, never the corpus), verified by the
    *      intake's signature-agreement estimate (the [[
    *      nearDupPairsEstimated]] tier);
    *   2. endpoints LIFT to their frozen labels (absent → own id);
    *      lifted pairs with equal labels are already-merged — dropped;
    *   3. the surviving CONTRACTED label graph (≤ |new edges| nodes —
    *      the affected components only, not the corpus) re-converges
    *      through the exact batch CC ([[Dedup.
    *      connectedComponentsConverged]] — min-label, so roots stay
    *      the min id over every constituent doc);
    *   4. old labels remap through the (old label → new root) table,
    *      new edge-incident docs insert with their root.
    *
    * Labels are MONOTONE (merges never un-merge), so the result after
    * any drain sequence equals batch CC over the union of all verified
    * edges — the spec proves ≡ across ≥3 drains including clusters
    * that merge ACROSS drains (a new doc bridging two old components
    * contracts both their labels into one root). Exactly-once: the
    * label table commits via [[graft.io.SnapshotBucketedStore.
    * upsertWithBatch]] — changed/new rows + batch mark in ONE
    * manifest rename — and a replayed epoch (mark ≥ batchId) returns
    * false untouched. The bucket-width cap applies at probe time: a
    * bucket growing past the cap stops yielding NEW edges (old merges
    * persist); the periodic batch miner remains the exact recompute.
    *
    * Cost: O(affected) per batch, corpus-size-independent — the
    * keyed upsert writes ONLY remapped old rows plus the batch's new
    * edge-incident docs (untouched label buckets re-reference their
    * existing generation dirs byte-for-byte), and the width cap is
    * counted only over the buckets this batch actually probes. */
  def updateLabels(
      store: graft.io.SnapshotBucketedStore,
      table: String,
      batchBuckets: DataFrame,
      batchId: Long,
      numHashes: Int = 32,
      threshold: Double = 0.5,
      maxBucketWidth: Int = 100,
  ): Boolean = {
    val labelsTable = s"${table}_labels"
    if (store.lastAppliedBatch(labelsTable).exists(batchId <= _)) return false
    val rawPairs = batchCandidates(store, table, batchBuckets, maxBucketWidth)
    val sig = store.read(table).get.dropDuplicates("id")
    val agree = (0 until numHashes).map(i =>
      when(col(s"a.m$i") === col(s"b.m$i"), 1).otherwise(0))
      .reduce(_ + _)
    val edges = rawPairs
      .join(sig.as("a"), col("id_a") === col("a.id"))
      .join(sig.as("b"), col("id_b") === col("b.id"))
      .filter(agree.cast("double") / numHashes >= threshold)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint()
    // the shared union-find-by-contraction core (factored to
    // [[IncrementalCc.mergeEdges]], semantics unchanged)
    IncrementalCc.mergeEdges(store, labelsTable, edges, batchId)
  }

  /** Candidate pairs INCIDENT TO ONE BATCH: the batch's bucket
    * memberships probe the accumulated bucket table (keyed equi-join
    * — new docs visit only their own buckets, never the corpus),
    * normalized to id_a < id_b. Width-cap applies ONLY over the
    * buckets this batch probes: semi-joining the accumulated table to
    * the batch's (band, band_key) keys first keeps the per-batch cost
    * O(probed buckets), not an O(corpus) window shuffle per
    * micro-batch — the per-key count inside the semi-joined set is
    * identical to the global count for those keys. Shared by
    * [[updateLabels]] and [[verifyExactWindow]]. */
  private def batchCandidates(
      store: graft.io.TableStore,
      table: String,
      batchBuckets: DataFrame,
      maxBucketWidth: Int): DataFrame = {
    val probe = batchBuckets.select("id", "band", "band_key").distinct()
    val probedKeys = probe.select("band", "band_key").distinct()
    val probedBuckets = store.read(s"${table}_buckets").get
      .select("id", "band", "band_key").distinct()
      .join(broadcast(probedKeys), Seq("band", "band_key"), "left_semi")
    val wCount = Window.partitionBy(col("band"), col("band_key"))
    val capped = probedBuckets
      .withColumn("graft_bw_", count(lit(1)).over(wCount))
      .filter(col("graft_bw_") <= maxBucketWidth)
      .drop("graft_bw_")
    probe.as("a")
      .join(capped.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
  }

  /** EXACT in-stream verification over a bounded retention window
    * (SCALE.md §8 item 12, closed): retain each doc's distinct
    * shingle-hash set — all exact n-gram Jaccard needs, no raw text —
    * for `window` drains in `<table>_grams` (one exactly-once
    * generation per batch, stamped with the epoch), verify THIS
    * batch's candidate edges exactly against the retained sets, and
    * append survivors to `<table>_pairs`. The verdict is bit-equal to
    * [[Dedup.nearDupPairs]] on the same docs (same shingling, same
    * set-Jaccard expression, same width cap — AnnIntakeSpec pins the
    * equality); a candidate whose counterpart expired before meeting
    * simply doesn't verify here and falls to the periodic batch pass.
    * State stays bounded: after each batch, gram generations with
    * stamp ≤ batchId − window drop via [[graft.io
    * .SnapshotBucketedStore.deleteRange]] — METADATA-ONLY when
    * `stamp` is one of the store's statsColumns (each generation is
    * one batch, so its stamp range is a point). All three commits are
    * epoch-marked, so crash-replays skip whatever already landed. */
  def verifyExactWindow(
      store: graft.io.SnapshotBucketedStore,
      table: String,
      batch: DataFrame,
      batchBuckets: DataFrame,
      batchId: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      threshold: Double = 0.5,
      maxBucketWidth: Int = 100,
      window: Int = 3,
  ): Unit = {
    require(window >= 1, s"window must be >= 1, got $window")
    val gramsTable = s"${table}_grams"
    val pairsTable = s"${table}_pairs"
    val grams = batch
      .select(col(idCol).as("id"),
        array_distinct(TextOps.shingleHashes(col(textCol), n)).as("sh"),
        lit(batchId).as("stamp"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()
    // verification set = retained window ∪ this batch (its own
    // generation may not have landed yet on a crash-replay)
    val sets = store.read(gramsTable)
      .map(_.unionByName(grams)).getOrElse(grams)
      .select("id", "sh").dropDuplicates("id")
    val verified = batchCandidates(store, table, batchBuckets, maxBucketWidth)
      .join(sets.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), "id_a")
      .join(sets.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        Dedup.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .localCheckpoint()
    store.appendIfNew(pairsTable, verified, batchId): Unit
    store.appendIfNew(gramsTable, grams.dropDuplicates("id"), batchId): Unit
    if (batchId - window >= 0)
      store.deleteRange(gramsTable, "stamp", 0L, batchId - window): Unit
  }

  /** Exactly-verified pairs accumulated by [[verifyExactWindow]] —
    * deduped on read (an at-least-once re-send can rediscover a pair
    * in a later epoch with the identical jaccard). */
  def verifiedPairs(
      store: graft.io.TableStore,
      table: String): Option[DataFrame] =
    store.read(s"${table}_pairs").map(_.dropDuplicates("id_a", "id_b"))

  /** Candidate pairs over EVERYTHING streamed so far: self-join the
    * accumulated band buckets (width-capped, same quadratic-cliff
    * guard as the batch miner), id_a < id_b, distinct. At-least-once
    * transports can re-send a document; memberships dedupe on read
    * before the join so a replayed doc cannot pair with itself. */
  def candidatePairs(
      store: graft.io.TableStore,
      table: String,
      maxBucketWidth: Int = 100,
  ): Option[DataFrame] =
    store.read(s"${table}_buckets").map { raw =>
      val buckets = raw.select("id", "band", "band_key").distinct()
      val wCount = Window.partitionBy(col("band"), col("band_key"))
      val capped = buckets
        .withColumn("_bw", count(lit(1)).over(wCount))
        .filter(col("_bw") <= maxBucketWidth)
        .drop("_bw")
      capped.as("a")
        .join(capped.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
    }

  /** Near-dup pairs with MinHash-estimated Jaccard ≥ `threshold`:
    * candidates verified by the share of agreeing signature slots.
    * Both joins are keyed hash joins against the (merge-on-read
    * deduped) signature table. */
  def nearDupPairsEstimated(
      store: graft.io.TableStore,
      table: String,
      numHashes: Int = 32,
      threshold: Double = 0.5,
      maxBucketWidth: Int = 100,
  ): Option[DataFrame] =
    for {
      pairs <- candidatePairs(store, table, maxBucketWidth)
      sigRaw <- store.read(table)
    } yield {
      val sig = sigRaw.dropDuplicates("id")
      val agree = (0 until numHashes).map(i =>
        when(col(s"a.m$i") === col(s"b.m$i"), 1).otherwise(0))
        .reduce(_ + _)
      pairs
        .join(sig.as("a"), col("id_a") === col("a.id"))
        .join(sig.as("b"), col("id_b") === col("b.id"))
        .select(col("id_a"), col("id_b"),
          (agree.cast("double") / numHashes).as("est_jaccard"))
        .filter(col("est_jaccard") >= threshold)
    }
}
