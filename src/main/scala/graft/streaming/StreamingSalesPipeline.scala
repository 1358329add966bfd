package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.{Notifier, PipelineResult, SalesPipeline}
import graft.schema.SalesSchema

/** Outcome of one drain: which files were processed / quarantined /
  * failed, in discovery order, plus the number of files each
  * micro-batch carried (`batchFileCounts`, batch order) — the
  * observable that pins the driver-hop bound: every entry is ≤ the
  * pipeline's `maxFilesPerTrigger`. */
final case class StreamRunSummary(
    processed: Seq[String],
    quarantined: Seq[String],
    failed: Seq[String],
    batchFileCounts: Seq[Int] = Nil,
) {
  def total: Int = processed.size + quarantined.size + failed.size
}

/** Structured-Streaming variant of the reference's event-per-file model
  * (SURVEY.md §2.11; /root/reference/lambda.py:204-213, README.md:79-89):
  * the file source discovers new files in `rawDir` exactly as S3
  * ObjectCreated events trigger the Lambda, `Trigger.AvailableNow`
  * gives Lambda-like drain-and-stop runs, and `foreachBatch` runs the
  * SAME validate → quarantine | lake → log/upsert/summary fan-out as
  * the batch pipeline ([[SalesPipeline.process]] is shared code).
  *
  * Exactly-once file processing comes from the CHECKPOINT, not from
  * delete-after-read: the source's commit log records every consumed
  * file, so a second drain re-processes nothing even if a raw file
  * survives (e.g. a failed delete). That replaces the reference's
  * prevention-by-absence (lambda.py:248) with an engine guarantee —
  * its documented invariant (README.md:141-145, no duplicates on
  * re-upload) holds per-file here, and per-content via the uuid upsert
  * exactly as in batch mode. Sink side effects inside `foreachBatch`
  * are at-least-once on crash-retry (same as the reference's
  * non-transactional step sequence); the upsert makes the target table
  * idempotent to such replays.
  *
  * Scale notes: `maxFilesPerTrigger = 1` preserves the reference's
  * file-grain validation/quarantine semantics. At 100 TB-scale intake
  * you would raise it (not drop it) and validate at file grain via the
  * `_metadata.file_path` grouping this class already does per batch —
  * the micro-batch then fans out over the cluster like any batch job.
  *
  * DRIVER-HOP CONTRACT: the per-batch distinct file list collected in
  * `foreachBatch` is bounded by `maxFilesPerTrigger` — the option is
  * ALWAYS set (required >= 1, no unbounded mode), so a 10,000-file
  * backlog drains as ⌈10000/maxFilesPerTrigger⌉ micro-batches, each
  * collecting at most `maxFilesPerTrigger` path strings, never one
  * batch collecting the whole backlog. Pinned per run by
  * [[StreamRunSummary.batchFileCounts]] and the bounded-drain spec.
  */
final class StreamingSalesPipeline(
    store: graft.io.TableStore,
    lake: String,
    checkpoint: String,
    notifier: Notifier = Notifier.Logging,
    format: String = "csv", // csv | json (NDJSON)
    maxFilesPerTrigger: Int = 1,
    summaryFromTarget: Boolean = false,
) {
  require(maxFilesPerTrigger >= 1,
    s"maxFilesPerTrigger must be >= 1 (the per-batch driver hop bound), got $maxFilesPerTrigger")

  private def source(spark: SparkSession, rawDir: String): DataFrame = {
    val base = spark.readStream
      .schema(SalesSchema.rawStructType)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
    val stream = format match {
      case "csv"  => base.option("header", "true").csv(rawDir)
      case "json" => base.json(rawDir)
      case other  => throw new IllegalArgumentException(s"Unsupported stream format: $other")
    }
    stream.withColumn("_src", col("_metadata.file_path"))
  }

  /** Drain everything currently in `rawDir`, then stop (the Lambda-run
    * analogue). Safe to call repeatedly: the checkpoint guarantees each
    * file is processed at most once across drains. */
  def drainAvailableNow(spark: SparkSession, rawDir: String): StreamRunSummary = {
    val processed = mutable.ArrayBuffer.empty[String]
    val quarantined = mutable.ArrayBuffer.empty[String]
    val failed = mutable.ArrayBuffer.empty[String]
    val batchSizes = mutable.ArrayBuffer.empty[Int]

    val query = source(spark, rawDir).writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // MATERIALIZE the micro-batch before the per-file loop: the
        // pipeline deletes each raw file after a successful process
        // (K6), and a lazy `batch` would re-scan the source CSVs for
        // every later file in the same batch — hitting FILE_NOT_EXIST
        // for the ones already consumed (latent until
        // maxFilesPerTrigger > 1). The cache is bounded by the batch
        // itself (≤ maxFilesPerTrigger files).
        val pinned = batch.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // file grain restored from the micro-batch; the distinct
          // list is <= maxFilesPerTrigger paths BY SOURCE CONTRACT
          // (the option is always set — see class doc), so this
          // collect is O(maxFilesPerTrigger) strings per batch, not
          // O(backlog) — and it also populates the cache above
          // before any raw file can be deleted
          val files = pinned.select(col("_src")).distinct()
            .collect().map(_.getString(0)).sorted
          batchSizes += files.length
          val pipeline = new SalesPipeline(store, lake, notifier, summaryFromTarget)
          files.foreach { path =>
            val raw = pinned.filter(col("_src") === path).drop("_src")
            pipeline.process(spark, raw, path) match {
              case _: PipelineResult.Success     => processed += path
              case _: PipelineResult.Quarantined => quarantined += path
              case _: PipelineResult.Failed      => failed += path
            }
          }
        } finally pinned.unpersist()
      }
      .start()
    query.awaitTermination()
    StreamRunSummary(processed.toSeq, quarantined.toSeq, failed.toSeq,
      batchSizes.toSeq)
  }
}
