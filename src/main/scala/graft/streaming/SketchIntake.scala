package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Approx

/** Streaming maintenance of a count-min sketch table — the continuous
  * form of the [[graft.ops.Approx.cmsCells]] preagg/reagg discipline:
  * heavy-hitter tracking over an unbounded stream (hot domains in a
  * crawl, hot keys in an event feed) without ever holding per-key
  * state.
  *
  * Each micro-batch reduces to its own cell-delta table (≤ depth ×
  * width rows no matter the batch size — map-side partial aggregation
  * does the collapsing) and APPENDS it as one committed generation;
  * the live sketch is the cell-wise sum of all generations
  * ([[readSketch]] = `cmsMerge` over the log). Because the delta
  * append uses [[graft.io.TableStore.appendIfNew]] with the batch id,
  * a crash-replayed epoch is skipped — counts are exactly-once with a
  * [[graft.io.SnapshotBucketedStore]] sink, which a read-merge-replace
  * design could not promise (a replayed merge double-counts).
  *
  * The generation log grows by one tiny file per batch; compact it
  * whenever convenient with [[compact]] (one atomic replace of the
  * summed cells — idempotent, so it needs no batch-id fencing). */
object SketchIntake {

  /** Drain everything currently available (AvailableNow), appending
    * one exactly-once cell-delta generation per micro-batch. */
  def drainTo(
      events: DataFrame,
      store: graft.io.TableStore,
      table: String,
      keyCol: String,
      checkpoint: String,
      depth: Int = 4,
      width: Int = 512,
  ): Unit = {
    val q = events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.appendIfNew(table,
          Approx.cmsCells(batch, keyCol, Nil, depth, width), batchId): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** The live sketch: cell-wise sum over every appended generation.
    * Feed the result to [[Approx.cmsEstimate]] / top-k extraction. */
  def readSketch(store: graft.io.TableStore, table: String): Option[DataFrame] =
    store.read(table).map(Approx.cmsMerge(_))

  /** Fold the generation log back to one generation (bounded read
    * fan-in). Safe any time: summing is what reads do anyway, and
    * replace commits atomically. */
  def compact(store: graft.io.TableStore, table: String): Unit =
    readSketch(store, table).foreach(store.replace(table, _))
}
