package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, SupportsDelta, WriterCommitMessage}
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL `MERGE INTO` / `UPDATE` / arbitrary-predicate `DELETE` on a
  * keyed graft table (X244) — the DSv2 row-level-operation path,
  * DELTA-based (`SupportsDelta`), because a keyed snapshot store IS a
  * delta store: the row id is the upsert key, so the natural write is
  * "these keys change, those keys die", not a group rewrite.
  *
  * Division of labor, all on proven machinery:
  *   - Spark's own rewrite rules (`RewriteMergeIntoTable` /
  *     `RewriteUpdateTable` / `RewriteDeleteFromTable`) plan the join
  *     of target and source, clause conditions, assignment alignment,
  *     and the at-most-one-match cardinality check — MERGE semantics
  *     come from the engine, not re-derived here;
  *   - the target scan is the catalog's ordinary pruned scan
  *     ([[GraftScanBuilder]] — manifest Blooms/min-max fire on
  *     pushable conditions);
  *   - updates arrive SPLIT as delete+reinsert
  *     (`representUpdateAsDeleteAndInsert` — so a key-changing UPDATE
  *     is correct by construction);
  *   - the delta writers persist ONLY the changed-row stream,
  *     executor-parallel, as parquet under a `stage-delta-*` scratch
  *     ([[GraftDeltaWriter]]);
  *   - the commit replays the staged delta through the store's
  *     one-commit keyed merge ([[SnapshotBucketedStore.applyDelta]]):
  *     touched buckets rewrite, untouched buckets carry by reference,
  *     one atomic manifest rename.
  *
  * Simple one-predicate DELETEs never reach this path — Spark's
  * `OptimizeMetadataOnlyDeleteFromTable` collapses them back to the
  * [[org.apache.spark.sql.connector.catalog.SupportsDelete]] tier
  * (merge-on-read tombstones / generation sweeps, O(metadata)); this
  * path picks up the shapes that tier refuses.
  */
private[io] class GraftRowLevelOperation(
    store: SnapshotBucketedStore,
    table: String,
    key: String,
    cmd: RowLevelOperation.Command,
    fullSchema: StructType)
    extends RowLevelOperation with SupportsDelta {

  override def command: RowLevelOperation.Command = cmd

  override def rowId(): Array[NamedReference] = Array(Expressions.column(key))

  /** Updates split into delete + reinsert: the store's merge then
    * needs exactly two verbs (doom key, upsert row), and an UPDATE
    * that reassigns the key column itself stays correct. */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(store, table, fullSchema, None)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new GraftDeltaWrite(store, table, key, info)
    }

  override def description(): String = s"GraftRowLevel($cmd, table=$table, key=$key)"
}

/** One task's staged delta files. */
private[io] case class GraftDeltaFiles(files: Seq[String]) extends WriterCommitMessage

/** The delta write: executors persist the changed-row stream to
  * scratch parquet (only files named in task COMMIT messages count —
  * a speculative duplicate's file is never read); the driver-side
  * job commit splits deletes from upserts and hands both to
  * [[SnapshotBucketedStore.applyDelta]] in one snapshot commit. */
private[io] class GraftDeltaWrite(
    store: SnapshotBucketedStore,
    table: String,
    key: String,
    info: LogicalWriteInfo)
    extends DeltaWrite {

  /** The staged row shape. A pure DELETE's write query carries NO row
    * projection (`info.schema()` is empty — only row ids flow), so the
    * row shape degrades to just the id column. */
  private val rowSchema: StructType =
    if (info.schema().fieldNames.contains(key)) info.schema()
    else info.rowIdSchema().orElseThrow(() => new IllegalStateException(
      s"delta write for '$table' carries neither a row schema with " +
        s"'$key' nor a row-id schema"))
  private val keyIdx: Int = rowSchema.fieldIndex(key)
  private val scratch: String = store.deltaStagePath(table, info.queryId())
  /** op (0 = delete-by-key, 1 = upsert row) + the full row. Non-key
    * fields are forced NULLABLE regardless of what the write query
    * derived: a delete record carries only its key — writing null
    * into a parquet REQUIRED field would silently corrupt the page. */
  private val outSchema: StructType =
    StructType(StructField(GraftDeltaWrite.OpCol, IntegerType, nullable = false) +:
      rowSchema.fields.zipWithIndex.map { case (f, i) =>
        if (i == keyIdx) f else f.copy(nullable = true)
      })

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    override def createBatchWriterFactory(pinfo: PhysicalWriteInfo): DeltaWriterFactory = {
      val box = org.apache.spark.sql.GraftBridge.confBox(SparkSession.active)
      new GraftDeltaWriterFactory(scratch, rowSchema, outSchema, keyIdx, box,
        GraftDeltaWrite.parquetWriterConf())
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val spark = SparkSession.active
      val files = messages.collect { case GraftDeltaFiles(fs) => fs }.flatten.toSeq
      try {
        if (files.nonEmpty) {
          import org.apache.spark.sql.functions.col
          val delta = spark.read.schema(outSchema).parquet(files: _*)
          val upserts = delta.filter(col(GraftDeltaWrite.OpCol) =!= 0)
            .drop(GraftDeltaWrite.OpCol)
          val deletes = delta.filter(col(GraftDeltaWrite.OpCol) === 0).select(key)
          store.applyDelta(table, upserts, deletes, key)
        }
      } finally cleanup(spark)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      cleanup(SparkSession.active)

    private def cleanup(spark: SparkSession): Unit = {
      val p = new Path(scratch)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (f.exists(p)) { f.delete(p, true); () }
    }
  }

  override def description(): String = s"GraftDeltaWrite(table=$table, key=$key)"
}

private[io] object GraftDeltaWrite {
  val OpCol = "graft_op_"

  /** The session's parquet write-support settings, captured on the
    * DRIVER — `ParquetWriteSupport.init` reads them from the task-side
    * Hadoop conf (Spark's own `prepareWrite` pins them the same way),
    * and the executors have no SQLConf to read defaults from. */
  def parquetWriterConf(): Map[String, String] = {
    import org.apache.spark.sql.internal.SQLConf
    val c = SQLConf.get
    Map(
      SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key ->
        c.getConf(SQLConf.PARQUET_WRITE_LEGACY_FORMAT).toString,
      SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key ->
        c.getConf(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE).toString,
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key ->
        c.getConf(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED).toString,
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key ->
        c.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString,
      SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key ->
        c.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString,
      SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key ->
        c.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
  }
}

private[io] class GraftDeltaWriterFactory(
    scratch: String,
    rowSchema: StructType,
    outSchema: StructType,
    keyIdx: Int,
    confBox: AnyRef with java.io.Serializable,
    writerConf: Map[String, String])
    extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(scratch, rowSchema, outSchema, keyIdx, confBox,
      writerConf, partitionId, taskId)
}

/** Executor-side delta writer: streams (op, row) records into ONE
  * parquet file per task attempt via Spark's own parquet write
  * support — real columnar output, no row round-trips through the
  * driver (the file is attempt-unique; only committed attempts'
  * files are read back). The file opens lazily on the first record,
  * so tasks that produce no delta write nothing. */
private[io] class GraftDeltaWriter(
    scratch: String,
    rowSchema: StructType,
    outSchema: StructType,
    keyIdx: Int,
    confBox: AnyRef,
    writerConf: Map[String, String],
    partitionId: Int,
    taskId: Long)
    extends DeltaWriter[InternalRow] {

  private val file = s"$scratch/delta-$partitionId-$taskId.parquet"
  private val rowTypes: Array[DataType] = rowSchema.fields.map(_.dataType)
  private val keyType: DataType = rowTypes(keyIdx)
  // reused output buffer: the record writer serializes synchronously,
  // so per-record allocation would be pure garbage pressure
  private val buf = new Array[Any](1 + rowTypes.length)
  private val outRow = new GenericInternalRow(buf)
  private var writer: org.apache.hadoop.mapreduce.RecordWriter[Void, InternalRow] = _

  private def open(): Unit = {
    import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
    val conf = new Configuration(org.apache.spark.sql.GraftBridge.confOf(confBox))
    ParquetWriteSupport.setSchema(outSchema, conf)
    // the write-support settings the session resolved on the driver
    // (ParquetFileFormat.prepareWrite pins the same set)
    writerConf.foreach { case (k, v) => conf.set(k, v) }
    writer = new org.apache.parquet.hadoop.ParquetOutputFormat[InternalRow](
      new ParquetWriteSupport)
      .getRecordWriter(conf, new Path(file),
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
  }

  private def emit(): Unit = {
    if (writer == null) open()
    writer.write(null, outRow)
  }

  override def insert(row: InternalRow): Unit = {
    buf(0) = 1
    var i = 0
    while (i < rowTypes.length) {
      // copyValue: the incoming row is a REUSED projection buffer —
      // a UTF8String/array view into it can be rewritten before the
      // parquet dictionary page serializes at close
      buf(1 + i) =
        if (row.isNullAt(i)) null
        else InternalRow.copyValue(row.get(i, rowTypes(i)))
      i += 1
    }
    emit()
  }

  override def reinsert(metadata: InternalRow, row: InternalRow): Unit = insert(row)

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    buf(0) = 0
    java.util.Arrays.fill(buf.asInstanceOf[Array[AnyRef]], 1, buf.length, null)
    buf(1 + keyIdx) =
      if (id.isNullAt(0)) null else InternalRow.copyValue(id.get(0, keyType))
    emit()
  }

  /** Unreachable under `representUpdateAsDeleteAndInsert = true`;
    * kept total (delete + insert) rather than throwing. */
  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(metadata, id)
    insert(row)
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
