package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/** EXACTLY-ONCE streaming SQL sink (X246): `df.writeStream.toTable(
  * "cat.t")` lands on the store's batch-marked commit families —
  * the SQL spelling of what [[graft.streaming]] pipelines do through
  * `foreachBatch` + [[TableStore.appendIfNew]].
  *
  * Per micro-batch: executor writers stage the epoch's rows as real
  * parquet under the table's `stage-delta-*` scratch (the same
  * attempt-unique-file discipline as [[GraftDeltaWriter]] — only
  * files named in task COMMIT messages are read back, so speculative
  * duplicates can't double rows); the epoch commit then applies them
  * with the epoch id AS the batch mark, all in ONE manifest rename:
  *
  *   - append mode on a plain table → [[TableStore.appendIfNew]] —
  *     a replayed epoch (crash between the store commit and the
  *     checkpoint advance) finds its mark already applied and lands
  *     ZERO rows;
  *   - append mode on a KEYED table (`key` table property, or the
  *     single catalog-level key) → [[SnapshotBucketedStore
  *     .upsertWithBatch]] guarded by [[SnapshotBucketedStore
  *     .lastAppliedBatch]] — the keyed exactly-once sink, replays
  *     skipped the same way;
  *   - complete mode (Spark calls `truncate()` per epoch) →
  *     [[SnapshotBucketedStore.replaceWithBatch]] on plain tables —
  *     each epoch atomically installs the full recomputation plus
  *     the mark; keyed tables refuse (a replace would write a log
  *     generation and strip the keyed write paths).
  *
  * An empty epoch stages nothing and commits nothing — replaying it
  * re-lands nothing, so skipping the mark is exact. */
private[io] class GraftStreamingWrite(
    store: SnapshotBucketedStore,
    table: String,
    sqlKey: Option[String],
    insertUpsert: Boolean,
    schema: StructType,
    queryId: String,
    truncate: Boolean)
    extends StreamingWrite {

  private val scratch: String = store.deltaStagePath(table, s"stream-$queryId")

  require(!truncate || sqlKey.isEmpty,
    s"'$table' is a keyed graft table: complete-mode streaming would " +
      "replace it with a log generation and strip the keyed write " +
      "paths — use append mode (each epoch keyed-upserts exactly once)")
  sqlKey.foreach { k =>
    require(insertUpsert,
      s"'$table' is a keyed graft table (key=$k): a streaming append " +
        "would silently duplicate keys — create the table with " +
        "TBLPROPERTIES('insert'='upsert') to make each epoch a keyed " +
        "exactly-once upsert")
    require(schema.fieldNames.contains(k),
      s"streaming write to '$table' lacks the key column '$k'")
  }

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val box = org.apache.spark.sql.GraftBridge.confBox(SparkSession.active)
    new GraftStreamWriterFactory(scratch, schema, box,
      GraftDeltaWrite.parquetWriterConf())
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val files = messages.collect { case GraftDeltaFiles(fs) => fs }.flatten.toSeq
    try {
      if (files.nonEmpty) {
        val batch = spark.read.schema(schema).parquet(files: _*)
        (sqlKey, truncate) match {
          case (Some(k), _) =>
            // keyed exactly-once: skip an epoch the mark already covers
            if (!store.lastAppliedBatch(table).exists(_ >= epochId))
              store.upsertWithBatch(table, batch, k, epochId)
          case (None, true) => store.replaceWithBatch(table, batch, epochId)
          case (None, false) => store.appendIfNew(table, batch, epochId): Unit
        }
      }
    } finally cleanupEpoch(spark, files)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    cleanupEpoch(SparkSession.active,
      messages.collect { case GraftDeltaFiles(fs) => fs }.flatten.toSeq)

  private def cleanupEpoch(spark: SparkSession, files: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    files.foreach { f =>
      val p = new Path(f)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) { fs.delete(p, false); () }
    }
  }

  override def toString: String =
    s"GraftStreamingWrite(table=$table, key=$sqlKey, truncate=$truncate)"
}

private[io] class GraftStreamWriterFactory(
    scratch: String,
    schema: StructType,
    confBox: AnyRef with java.io.Serializable,
    writerConf: Map[String, String])
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftStreamWriter(
      s"$scratch/e$epochId-$partitionId-$taskId.parquet",
      schema, confBox, writerConf)
}

/** Executor-side epoch writer: rows stream straight into one parquet
  * file per task attempt (lazy open — empty tasks write nothing);
  * same write-support plumbing as [[GraftDeltaWriter]], minus the
  * delta op column. */
private[io] class GraftStreamWriter(
    file: String,
    schema: StructType,
    confBox: AnyRef,
    writerConf: Map[String, String])
    extends DataWriter[InternalRow] {

  private var writer: org.apache.hadoop.mapreduce.RecordWriter[Void, InternalRow] = _

  private def open(): Unit = {
    import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
    val conf = new Configuration(org.apache.spark.sql.GraftBridge.confOf(confBox))
    ParquetWriteSupport.setSchema(schema, conf)
    writerConf.foreach { case (k, v) => conf.set(k, v) }
    writer = new org.apache.parquet.hadoop.ParquetOutputFormat[InternalRow](
      new ParquetWriteSupport)
      .getRecordWriter(conf, new Path(file),
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
  }

  override def write(row: InternalRow): Unit = {
    if (writer == null) open()
    // the record writer serializes the row synchronously — safe to
    // hand it the reused buffer directly (the same contract Spark's
    // own parquet write path relies on)
    writer.write(null, row)
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close(null)
    GraftDeltaFiles(if (writer != null) Seq(file) else Nil)
  }

  override def abort(): Unit = {
    if (writer != null) {
      try writer.close(null) catch { case scala.util.control.NonFatal(_) => () }
      val p = new Path(file)
      val f = p.getFileSystem(org.apache.spark.sql.GraftBridge.confOf(confBox))
      if (f.exists(p)) { f.delete(p, false); () }
    }
  }

  override def close(): Unit = ()
}
