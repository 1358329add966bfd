package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{DataType, StructType}

/** `spark.readStream.table("cat.t")` — the DSv2 streaming SOURCE over
  * an append-log snapshot table (X252, the read twin of the X246
  * `writeStream.toTable` sink): offsets are MANIFEST VERSIONS, a
  * batch is the log dirs committed in (start, end] (dir-level
  * capture — reads only the new generations, never a rescan, and
  * refuses loudly across compaction like [[SnapshotBucketedStore
  * .appendsSince]]), and the first batch is the whole table at the
  * then-latest version (initial load). Unlike the V1
  * `readStream.format("graft")` source (which plans driver-side
  * DataFrames), the DSv2 seam must produce executor-readable
  * partitions — so batches plan as ONE PARTITION PER DATA FILE and
  * the reader decodes parquet straight to [[InternalRow]] through
  * Spark's own `ParquetReadSupport` (the exact materializer the
  * non-vectorized parquet path uses — full type lattice, nothing
  * re-derived; requested-schema clipping gives column pruning for
  * free). Parquet stores only — other formats refuse loudly at
  * stream construction. At 100 TB: a trigger costs the files of the
  * generations it covers, file-parallel across the cluster, with
  * ZERO driver materialization. */
private[io] class GraftMicroBatchStream(
    store: SnapshotBucketedStore,
    table: String,
    required: StructType,
    readerConf: Map[String, String],
    maxVersionsPerTrigger: Option[Int] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  /** AvailableNow fencepost: commits racing the drain wait for the
    * next run (same contract as the V1 source). */
  @volatile private var fence: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    fence = store.snapshots(table).lastOption.map(_.toLong)

  override def initialOffset(): Offset = GraftVersionOffset(-1L)

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toLong)

  override def latestOffset(): Offset = {
    val latest = store.snapshots(table).lastOption.map(_.toLong)
    val capped = fence match {
      case Some(f) => latest.map(math.min(_, f))
      case None => latest
    }
    capped.map(GraftVersionOffset(_)).orNull
  }

  /** Admission control at VERSION granularity (the only consistent
    * unit — half a generation is not a snapshot): with
    * `maxVersionsPerTrigger` = N, a trigger advances at most N
    * manifest versions past the checkpoint, so a backfill over a
    * long-lived log drains in bounded batches instead of one giant
    * initial load. Spark's byte/row ReadLimits are deliberately NOT
    * mapped — they cut mid-version. The initial load counts as one
    * version step (it reads the whole table at `start + N`'s floor —
    * for a fresh checkpoint the cap bounds how far past the first
    * snapshot it reaches). */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val uncapped = latestOffset()
    (maxVersionsPerTrigger, Option(uncapped)) match {
      case (Some(n), Some(GraftVersionOffset(latest))) =>
        val s = start.asInstanceOf[GraftVersionOffset].version
        // never point below the oldest RETAINED version: a fresh
        // checkpoint on a vacuumed table must initial-load at the
        // earliest consistent snapshot, not at a version the cap
        // names but vacuum already reclaimed
        val floor = store.snapshots(table).headOption
          .map(_.toLong).getOrElse(latest)
        GraftVersionOffset(
          math.min(latest, math.max(math.max(s, 0L) + n, floor)))
      case _ => uncapped
    }
  }

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  /** The driver's hadoop conf, boxed serializable at stream build —
    * the same discipline as the streaming WRITE path, so executor
    * readers resolve the store's filesystem exactly as the driver
    * does (a bare `new Configuration()` would miss cluster fs
    * settings outside local mode). */
  private val confBox = org.apache.spark.sql.GraftBridge.confBox(
    org.apache.spark.sql.SparkSession.active)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVersionOffset].version
    val e = end.asInstanceOf[GraftVersionOffset].version
    if (s >= e) return Array.empty
    val dirs = store.appendDirsSince(table, s.toInt, e.toInt)
    store.dataFilePaths(table, dirs)
      .map(f => GraftFilePartition(f, required.json, readerConf)
        : InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftParquetReaderFactory(confBox)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftMicroBatchStream(table=$table)"
}

/** Offset = manifest version; serializes as the bare number so
  * checkpoints survive restarts (and stay interchangeable with the V1
  * source's LongOffset json). */
private[io] case class GraftVersionOffset(version: Long) extends Offset {
  override def json: String = version.toString
}

/** One data file of one log generation + everything an executor needs
  * to decode it: the requested catalyst schema (json) and the conf
  * subset the parquet→Catalyst conversion honors. */
private[io] case class GraftFilePartition(
    file: String,
    schemaJson: String,
    conf: Map[String, String]) extends InputPartition

/** Executor-side parquet→InternalRow reader built on Spark's own
  * [[org.apache.spark.sql.execution.datasources.parquet
  * .ParquetReadSupport]] — the same RecordMaterializer the
  * non-vectorized parquet scan uses, so every Catalyst type decodes
  * exactly as a batch read would. Rebase specs are CORRECTED: these
  * files are always written by this engine (Spark 3+ calendar), never
  * by legacy Hive writers. */
private[io] class GraftParquetReaderFactory(
    confBox: AnyRef with java.io.Serializable)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFilePartition]
    val schema = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
    val conf = new Configuration(
      org.apache.spark.sql.GraftBridge.confOf(confBox))
    p.conf.foreach { case (k, v) => conf.set(k, v) }
    import org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, schema.json)
    val corrected = org.apache.spark.sql.catalyst.util.RebaseDateTime.RebaseSpec(
      org.apache.spark.sql.internal.LegacyBehaviorPolicy.CORRECTED, None)
    val support = new ParquetReadSupport(
      None, /* enableVectorizedReader = */ false, corrected, corrected)
    @annotation.nowarn("cat=deprecation") // builder(ReadSupport, Path): the
    // supported replacement needs an InputFile per hadoop conf anyway
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder[InternalRow](support, new Path(p.file)).withConf(conf).build()
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = { current = reader.read(); current != null }
      override def get(): InternalRow = current
      override def close(): Unit = reader.close()
    }
  }
}

private[io] object GraftMicroBatchStream {
  /** The conf subset the executor-side parquet→Catalyst conversion
    * consults, captured from the DRIVER session at stream build so
    * every reader decodes under the session's semantics. */
  def readerConf(spark: org.apache.spark.sql.SparkSession): Map[String, String] =
    Seq("spark.sql.parquet.binaryAsString",
      "spark.sql.parquet.int96AsTimestamp",
      "spark.sql.caseSensitive",
      "spark.sql.parquet.inferTimestampNTZ.enabled",
      "spark.sql.legacy.parquet.nanosAsLong",
      "spark.sql.session.timeZone")
      .flatMap(k => spark.conf.getOption(k).map(k -> _)).toMap
}
