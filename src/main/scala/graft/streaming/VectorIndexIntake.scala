package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.llm.Ivf

/** Streaming maintenance of the PERSISTED IVF-PQ vector index — the
  * piece that turns [[graft.llm.Ivf.searchPq]]'s per-call corpus
  * re-encode into a stored table a 100 TB search tier can actually
  * serve from: vectors stream in, each micro-batch is assigned its
  * coarse cell and PQ-encoded (one map-side projection against the
  * broadcast frozen centroids/codebooks), and the resulting
  * (id, cell, code) rows land in the index table via the keyed
  * exactly-once upsert — changed ids replace their old row, untouched
  * buckets carry forward by reference, and the batch mark commits in
  * the SAME manifest rename as the data ([[graft.io.
  * SnapshotBucketedStore.upsertWithBatch]]), so a replayed epoch is
  * a no-op rather than a duplicate encode.
  *
  * State discipline mirrors [[AnnIntake]]: the float vectors are
  * NEVER index state — 12 bytes/vector (cell + packed codes) is what
  * accumulates; re-sent vectors (at-least-once transports) converge
  * by key. The spec pins stream ≡ batch bit-equality: an index
  * maintained across N drains equals [[Ivf.indexRows]] over the
  * union of all drained vectors, and [[Ivf.searchPqFrom]] over it
  * hash-matches [[Ivf.searchPq]]'s inline recompute. */
object VectorIndexIntake {

  /** Drain everything currently available (AvailableNow), upserting
    * one index generation per micro-batch, exactly-once. The store
    * should declare `keyColumns = Seq("id")` and
    * `statsColumns = Seq("cell")` so the index read path gets point
    * Blooms and cell-range pruning. */
  def drainTo(
      vectors: DataFrame,
      store: graft.io.SnapshotBucketedStore,
      table: String,
      checkpoint: String,
      centroids: DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      passthrough: Seq[String] = Nil,
      maintainDupLabels: Boolean = false,
      dupThreshold: Double = 0.5,
      dupNprobe: Int = 1,
  ): Unit = {
    val q = vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // order matters: the index absorbs the batch FIRST, so the
        // label pass sees batch-internal pairs too (a crash between
        // the two commits replays into applyBatch's refusal and the
        // label pass catches up — each table carries its own mark)
        applyBatch(store, table, batch, batchId, centroids, idCol, embCol,
          passthrough): Unit
        if (maintainDupLabels)
          updateDupLabels(store, table, batch, batchId, centroids,
            idCol, embCol, dupThreshold, dupNprobe): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** INCREMENTAL embedding near-dup component labels through the
    * vector index — the embedding-side twin of [[AnnIntake.
    * updateLabels]]'s MinHash tier: per micro-batch, the batch's
    * exact vectors probe their `dupNprobe` nearest cells against the
    * stored codes ([[graft.llm.Ivf.adcPairsAbove]] — new vectors
    * visit their own cells, never the corpus; 8-byte codes travel),
    * candidates clearing the ADC threshold become edges, and the
    * persisted `<table>_dup_labels` component table absorbs them via
    * the shared contraction core ([[IncrementalCc.mergeEdges]] —
    * O(affected) per batch, monotone labels, exactly-once by the
    * batch-marked keyed upsert). After any drain sequence the label
    * table ≡ batch CC over the union of all threshold edges — the
    * spec's equivalence. ADC scores are the quantized ESTIMATE tier
    * (reconstruction error shifts absolute cosines — calibrate the
    * threshold on the ADC scale); the periodic exact batch dedup
    * over float vectors remains the exact recompute. */
  def updateDupLabels(
      store: graft.io.SnapshotBucketedStore,
      table: String,
      batch: DataFrame,
      batchId: Long,
      centroids: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      nprobe: Int = 1,
  ): Boolean = {
    val labelsTable = s"${table}_dup_labels"
    if (store.lastAppliedBatch(labelsTable).exists(batchId <= _)) return false
    val index = store.read(table) match {
      case Some(i) => i
      case None => return false // no index yet: applyBatch runs first
    }
    val edges = Ivf.adcPairsAbove(index, batch, idCol, embCol, centroids,
      nprobe, threshold).localCheckpoint()
    IncrementalCc.mergeEdges(store, labelsTable, edges, batchId)
  }

  /** One micro-batch of index maintenance: assign + encode the batch
    * and keyed-upsert it with the epoch mark. Returns false untouched
    * for a replayed epoch (mark already ≥ batchId) — the exactly-once
    * hinge a crash-recovered foreachBatch leans on. */
  def applyBatch(
      store: graft.io.SnapshotBucketedStore,
      table: String,
      batch: DataFrame,
      batchId: Long,
      centroids: DataFrame,
      idCol: String,
      embCol: String,
      passthrough: Seq[String] = Nil,
  ): Boolean = {
    if (store.lastAppliedBatch(table).exists(batchId <= _)) return false
    store.upsertWithBatch(table,
      Ivf.indexRows(batch, idCol, embCol, centroids, passthrough), "id", batchId)
    true
  }
}
