package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.llm.TextIndex

/** Streaming maintenance of the persisted inverted index
  * ([[graft.llm.TextIndex]]) — the text-side twin of
  * [[VectorIndexIntake]]: documents stream in, each micro-batch is
  * tokenized ONCE into its (pk, term, id, tf) postings and (id, dl)
  * lengths, and both land via keyed exactly-once upserts. The
  * append-mode contract is [[TextIndex.writeIndex]]'s: NEW docs and
  * at-least-once re-sends of UNCHANGED docs converge by key; a
  * CHANGED doc must delete its old text first (the lake holds it).
  *
  * Two tables, two marks: each table's epoch mark rides its OWN
  * manifest rename, and [[applyBatch]] advances whichever table is
  * behind — a crash between the two commits replays into the lagging
  * table only (the [[VectorIndexIntake.drainTo]] two-commit
  * discipline), so the pair converges to the same state as one
  * atomic apply without needing a cross-table transaction. */
object TextIndexIntake {

  /** Drain all currently-available docs (AvailableNow), one index
    * generation pair per micro-batch, exactly-once per table. */
  def drainTo(
      docs: DataFrame,
      store: graft.io.SnapshotBucketedStore,
      table: String,
      checkpoint: String,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): Unit = {
    val q = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(store, table, batch, batchId, idCol, textCol): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** One micro-batch of index maintenance: upsert lengths and
    * postings, each gated by its own epoch mark. Returns false only
    * when BOTH tables had already applied this epoch (full replay). */
  def applyBatch(
      store: graft.io.SnapshotBucketedStore,
      table: String,
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
  ): Boolean = {
    var applied = false
    if (!store.lastAppliedBatch(s"${table}_doclen").exists(batchId <= _)) {
      store.upsertWithBatch(s"${table}_doclen",
        TextIndex.docLengthsOf(batch, idCol, textCol), "id", batchId)
      applied = true
    }
    if (!store.lastAppliedBatch(s"${table}_postings").exists(batchId <= _)) {
      store.upsertWithBatch(s"${table}_postings",
        TextIndex.postingsOf(batch, idCol, textCol), "pk", batchId)
      applied = true
    }
    applied
  }
}
