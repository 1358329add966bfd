package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Streaming ingestion through write-time expectations — the
  * row-grain, rule-labeled evolution of the reference's streaming
  * quarantine (/root/reference/lambda.py:204-213 reacts per FILE;
  * [[StreamingSalesPipeline]] reproduces that; this gates per ROW):
  * each micro-batch splits through [[graft.io.Expectations
  * .upsertChecked]] under its epoch id — clean rows keyed-upsert into
  * the governed table, rejects append into the labeled quarantine
  * log — so the stream inherits the batch form's whole contract:
  * identical rule evaluation (one codegen'd pass, null-fails-closed),
  * per-table exactly-once marks, and the two-commit crash convergence
  * (a replay re-offers the epoch; whichever table already holds it
  * refuses, the other catches up). Batch ≡ stream is structural — the
  * intake IS the batch operator called once per epoch. */
object ExpectationsIntake {

  /** Drain all currently-available rows (AvailableNow) through the
    * expectations split. Re-delivered epochs are refused per table by
    * the batch marks. */
  def drainTo(
      rows: DataFrame,
      store: graft.io.SnapshotBucketedStore,
      table: String,
      key: String,
      rules: Seq[(String, Column)],
      checkpoint: String,
  ): Unit = {
    val q = rows.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.io.Expectations.upsertChecked(store, table, key, batch,
          rules, Some(batchId))
      }
      .start()
    q.awaitTermination()
  }
}
