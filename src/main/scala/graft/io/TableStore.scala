package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Thrown when a commit finds its target manifest version already
  * committed by another writer — either a violation of the store's
  * single-writer-per-table contract, or (for maintenance commits like
  * [[SnapshotBucketedStore.compactLogs]]) a lost CAS race to be
  * retried against the new snapshot. Always loud, never silent data
  * loss: the competing commit's data is intact, only THIS commit is
  * rejected. */
final class ConcurrentCommitException(msg: String) extends java.io.IOException(msg)

/** Warehouse abstraction over the reference's three MySQL tables
  * (/root/reference/lambda.py:171-190). The reference talks JDBC; the
  * test environment has no database, so the store is a trait with a
  * Parquet-directory implementation (tests/local) and a JDBC
  * implementation (production shape). SURVEY.md §7.4 risk 7.
  */
trait TableStore {

  /** S6: full-table scan; None when the table doesn't exist yet —
    * the reference catches the missing-table error and proceeds with
    * an empty frame (lambda.py:175-178). */
  def read(name: String): Option[DataFrame]

  /** S6 with the reference's fallback made explicit. */
  def readOrEmpty(name: String, schema: StructType)(implicit spark: SparkSession): DataFrame =
    read(name).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))

  /** K2: append (the `sales` raw log). */
  def append(name: String, df: DataFrame): Unit

  /** Idempotent append for exactly-once streaming sinks: `batchId` is
    * the foreachBatch epoch; a replayed batch (crash after the store
    * commit but before the streaming checkpoint commit) must be
    * detected and skipped. Default = plain append (at-least-once);
    * [[SnapshotBucketedStore]] overrides with a real marker committed
    * ATOMICALLY with the data (same manifest rename). Returns true if
    * the batch was applied, false if recognized as a replay. */
  def appendIfNew(name: String, df: DataFrame, batchId: Long): Boolean = {
    append(name, df); true
  }

  /** K3/K4: full replace (`sales_tgt`, `sales_summary`). At 100 TB this
    * is the scalability cliff the reference has (O(table) rewrite per
    * batch); production should use a MERGE-capable table format or
    * partitioned `replaceWhere` — see docs/SCALE.md. */
  def replace(name: String, df: DataFrame): Unit

  /** Keyed upsert of a batch into `name`. Default = the reference's
    * literal semantics (read whole table, merge, rewrite whole table —
    * lambda.py:175-181). Stores with physical key-partitioning override
    * this to rewrite ONLY the partitions the batch touches
    * ([[BucketedParquetDirStore]]) — the O(batch) shape that survives
    * 100 TB, behind the same interface. */
  def upsert(name: String, incoming: DataFrame, key: String)(implicit spark: SparkSession): Unit = {
    val existing = readOrEmpty(name, incoming.schema)
    replace(name, graft.ops.Upsert.upsert(existing, incoming, key))
  }
}

/** Single-format file-directory store: each table is `<root>/<name>`,
  * written through any Spark batch file source ("parquet", "orc",
  * "json", ...). Stands in for MySQL in tests; also a perfectly good
  * lake layout on its own. Columnar formats (parquet/orc) keep
  * predicate pushdown + column pruning; row formats trade that for
  * interchange. */
class FileDirStore(root: String, fmt: String)(implicit spark: SparkSession)
    extends TableStore {

  private def path(name: String) = s"$root/$name"

  override def read(name: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.format(fmt).load(path(name))) else None
  }

  override def append(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).format(fmt).save(path(name))

  override def replace(name: String, df: DataFrame): Unit = {
    // The incoming plan may read the same table (upsert reads sales_tgt
    // then replaces it) — self-overwrite would clobber input files mid
    // read, so land in a staging dir and swap atomically-ish.
    val p = new org.apache.hadoop.fs.Path(path(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new org.apache.hadoop.fs.Path(path(name) + "_stage")
    df.write.mode(SaveMode.Overwrite).format(fmt).save(stage.toString)
    if (fs.exists(p)) fs.delete(p, true)
    fs.rename(stage, p)
  }
}

/** Parquet table store (the default lake format). */
final class ParquetDirStore(root: String)(implicit spark: SparkSession)
    extends FileDirStore(root, "parquet")

/** ORC table store — same layout/semantics, ORC files (the other
  * bundled columnar format; useful when downstream consumers are
  * ORC-native, e.g. Hive-lineage warehouses). */
final class OrcDirStore(root: String)(implicit spark: SparkSession)
    extends FileDirStore(root, "orc")

/** Avro table store (X165) — the same directory-per-table seam over
  * [[AvroIo]]'s splittable containers (this container ships no
  * spark-avro DataSource, so the read/write path is AvroIo's, not
  * `format("avro")`). Append lands each batch under a fresh random
  * prefix (container names are store-internal — the same contract as
  * Spark's own part-file UUIDs); replace stages and swaps like
  * [[FileDirStore]]. Row-format trade-off as documented there: full
  * interchange, no columnar pushdown. */
final class AvroDirStore(root: String)(implicit spark: SparkSession)
    extends TableStore {

  private def path(name: String) = s"$root/$name"
  private def fsOf(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def read(name: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path(name))
    val fs = fsOf(p)
    // a table exists when it holds at least one container — an empty
    // directory (append of an empty frame emits no files) reads as
    // missing, matching the reference's missing-table → empty rule
    val has = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.endsWith(".avro"))
    if (has) Some(AvroIo.read(spark, path(name))) else None
  }

  override def append(name: String, df: DataFrame): Unit = {
    val stage = new org.apache.hadoop.fs.Path(
      path(name) + "_append_" + java.util.UUID.randomUUID().toString)
    val fs = fsOf(stage)
    AvroIo.write(df, stage.toString)
    val dest = new org.apache.hadoop.fs.Path(path(name))
    fs.mkdirs(dest)
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    fs.listStatus(stage).filter(_.getPath.getName.endsWith(".avro"))
      .foreach { s =>
        fs.rename(s.getPath,
          new org.apache.hadoop.fs.Path(dest, s"$stamp-${s.getPath.getName}"))
      }
    fs.delete(stage, true)
  }

  override def replace(name: String, df: DataFrame): Unit = {
    val p = new org.apache.hadoop.fs.Path(path(name))
    val fs = fsOf(p)
    val stage = new org.apache.hadoop.fs.Path(path(name) + "_stage")
    if (fs.exists(stage)) fs.delete(stage, true)
    AvroIo.write(df, stage.toString)
    if (fs.exists(p)) fs.delete(p, true)
    fs.rename(stage, p): Unit
  }
}

/** Key-bucketed parquet store: each table is laid out as
  * `<root>/<name>/graft_bucket=<b>/` with b = pmod(xxhash64(key), n).
  * [[upsert]] rewrites ONLY the buckets the incoming batch touches —
  * an O(batch)-cost upsert against an O(table)-size target, which is
  * the difference between "works" and "melts" at 100 TB (docs/SCALE.md
  * §2). Everything else behaves like [[ParquetDirStore]]; the bucket
  * column is internal and never surfaces to readers.
  *
  * NOTE: the touched-bucket swap loop commits one rename per bucket —
  * a crash mid-loop leaves a mixed old/new state (the reference has
  * the same window, lambda.py:172-181). [[SnapshotBucketedStore]] is
  * the manifest-committed successor whose commit is ONE rename; prefer
  * it for anything a crash may interrupt. This class remains for
  * plain Hive-partition-dir layout compatibility. */
final class BucketedParquetDirStore(root: String, numBuckets: Int = 64)(implicit spark: SparkSession)
    extends TableStore {

  private val BucketCol = "graft_bucket"
  private def path(name: String) = s"$root/$name"
  private def fs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def exists(name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(name))
    fs(p).exists(p)
  }
  private def withBucket(df: DataFrame, key: String): DataFrame =
    df.withColumn(BucketCol,
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(org.apache.spark.sql.functions.col(key)),
        org.apache.spark.sql.functions.lit(numBuckets.toLong)))

  override def read(name: String): Option[DataFrame] =
    if (exists(name)) Some(spark.read.parquet(path(name)).drop(BucketCol)) else None

  /** Append-only tables (the raw log) are scan-only — plain unbucketed
    * layout; only [[upsert]] targets need the key partitioning. */
  override def append(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path(name))

  override def replace(name: String, df: DataFrame): Unit = {
    val p = new org.apache.hadoop.fs.Path(path(name))
    val stage = new org.apache.hadoop.fs.Path(path(name) + "_stage")
    df.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    val f = fs(p)
    if (f.exists(p)) f.delete(p, true)
    f.rename(stage, p)
  }

  override def upsert(name: String, incoming: DataFrame, key: String)(implicit s: SparkSession): Unit = {
    import org.apache.spark.sql.functions.col
    val p = path(name)
    if (!exists(name)) {
      withBucket(incoming, key)
        .write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(p)
      return
    }
    // buckets the batch touches: ≤ numBuckets values, driver-safe
    val touched = withBucket(incoming, key)
      .select(BucketCol).distinct().collect().map(_.getLong(0)).sorted
    // partition-pruned read of ONLY those buckets (.explain shows
    // PartitionFilters on graft_bucket)
    val existing = spark.read.parquet(p)
      .filter(col(BucketCol).isin(touched.toIndexedSeq: _*))
      .drop(BucketCol)
    val merged = withBucket(
      graft.ops.Upsert.upsert(existing, incoming, key), key)
    // stage the merged touched buckets, then swap just those partition
    // dirs — untouched buckets are never read, never rewritten
    val stagePath = new org.apache.hadoop.fs.Path(p + "_upsert_stage")
    val f = fs(stagePath)
    merged.write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(stagePath.toString)
    touched.foreach { b =>
      val dest = new org.apache.hadoop.fs.Path(s"$p/$BucketCol=$b")
      val src = new org.apache.hadoop.fs.Path(s"$stagePath/$BucketCol=$b")
      if (f.exists(dest)) f.delete(dest, true)
      if (f.exists(src)) f.rename(src, dest)
    }
    f.delete(stagePath, true)
  }
}

/** Snapshot-isolated key-bucketed parquet store: the atomic-commit
  * successor to [[BucketedParquetDirStore]], whose touched-bucket swap
  * loop has a crash window (kill between two bucket renames → readers
  * see a MIX of old and new buckets; the reference shares the flaw —
  * lambda.py:172-181 rewrites the live table in place). A 100 TB
  * engine's flagship sink needs a commit point, so this store
  * hand-rolls the manifest pattern Delta/Iceberg use (no such lib in
  * this sandbox):
  *
  *   - Data lives in immutable generation dirs
  *     `<table>/data/b<bucket>-g<version>/` (bucketed upsert targets)
  *     and `<table>/data/log-<version>/` (append-only raw logs).
  *   - A manifest `manifest-<N>.txt` names the live dir per bucket
  *     plus the live log dirs. The CURRENT snapshot is the
  *     highest-numbered committed manifest.
  *   - Every write lands data dirs first, then commits by writing
  *     `manifest-<N>.tmp` and renaming it to `manifest-<N>.txt` —
  *     ONE rename is the entire commit. A crash anywhere before it
  *     leaves unreferenced dirs (garbage, collected by [[vacuum]]),
  *     never a mixed snapshot: readers keep resolving manifest N−1.
  *
  * Upsert stays O(batch): untouched buckets carry their old dirs
  * forward by reference in the new manifest — nothing is copied, read,
  * or listed for them (manifest-level pruning, strictly better than
  * directory-listing partition pruning at 100 TB). Single writer per
  * table assumed (the reference's Lambda has the same contract);
  * readers are wait-free and always see a complete committed snapshot.
  *
  * DATA SKIPPING (`statsColumns`): each commit records per-generation
  * column min/max IN THE MANIFEST (exact decimal strings, numeric
  * columns only), and [[readWhere]] prunes provably-disjoint dirs
  * before the scan — at 100 TB with time-ordered or Z-ordered
  * commits, a selective predicate opens a handful of files instead
  * of every one (the difference between touching 0.1% and 100% of a
  * partition's files). Stats ride the same manifest rename as the
  * dirs they describe (crash-atomic), carry forward by reference
  * with untouched buckets, and their ABSENCE is always safe: an
  * unstatted dir is scanned, never skipped.
  *
  * Tables are role-split exactly like the reference's warehouse: a
  * table is EITHER an append log (K2) or a keyed upsert target
  * (K3/K4/W1) — [[upsert]] on a table with log dirs refuses rather
  * than silently miss log rows during its bucket-pruned merge. */
object SnapshotBucketedStore {
  /** Manifest stats-line format version. v1 (any manifest without a
    * `statsver:` line) may carry float-shortest min/max strings that
    * misorder against double probes; v2 records float columns
    * double-promoted ([[SnapshotBucketedStore.statInput]]). Readers
    * widen v1 bounds by [[LegacyStatsEps]] before comparing. */
  val CurrentStatsVersion = 2

  /** Relative widening applied to v1 stat bounds: a float's
    * shortest-decimal string differs from its double promotion by at
    * most half a float ULP (~6e-8 relative); 1e-6 is safely past it
    * and costs almost nothing in pruning power. */
  val LegacyStatsEps: BigDecimal = BigDecimal("0.000001")

  /** lgK of the per-dir HLL NDV sketches (X216): 2^12 registers,
    * ~1.6% relative standard error, ~4 KB dense per (dir, column) —
    * the Iceberg-puffin operating point. Frozen: sketches with
    * different lgK do not union losslessly, so changing this would
    * orphan recorded sketches (hll_union_agg would refuse). */
  val NdvLgK: Int = 12
}

class SnapshotBucketedStore(
    root: String,
    numBuckets: Int = 64,
    fmt: String = "parquet",
    statsColumns: Seq[String] = Nil,
    val keyColumns: Seq[String] = Nil,
    keyExpectedItems: Long = 10000L,
    val clusterColumn: Option[String] = None,
    ndvColumns: Seq[String] = Nil,
    quantileColumns: Seq[String] = Nil,
    sortColumns: Seq[String] = Nil)(
    implicit val spark: SparkSession)
    extends TableStore {

  import org.apache.hadoop.fs.Path
  import SnapshotBucketedStore.NdvLgK
  require(statsColumns.forall(_.matches("[A-Za-z0-9_]+")),
    s"stats column names must be [A-Za-z0-9_]+ (manifest line syntax): " +
      statsColumns.mkString(", "))
  require(keyColumns.forall(_.matches("[A-Za-z0-9_]+")),
    s"key column names must be [A-Za-z0-9_]+ (manifest line syntax): " +
      keyColumns.mkString(", "))
  require(ndvColumns.forall(_.matches("[A-Za-z0-9_]+")),
    s"ndv column names must be [A-Za-z0-9_]+ (manifest line syntax): " +
      ndvColumns.mkString(", "))
  require(quantileColumns.forall(_.matches("[A-Za-z0-9_]+")),
    s"quantile column names must be [A-Za-z0-9_]+ (manifest line syntax): " +
      quantileColumns.mkString(", "))
  // FILESYSTEM-CONTRACT PROBE (docs/SCALE.md §8a): every guarantee
  // here reduces to a first-writer-wins atomic publish of the
  // versioned manifest name. Raw object stores (copy+delete rename,
  // no EEXIST) cannot provide it — warn LOUDLY at construction, once
  // per store, naming the mitigation section. Not a refusal: a
  // deployment may carry a rename-atomic layer invisible at the URI.
  locally {
    val scheme = Option(new Path(root).toUri.getScheme).getOrElse("file")
    if (Set("s3", "s3a", "s3n", "oss", "cos", "wasb")(scheme))
      System.err.println(s"graft WARNING: store root '$root' is on " +
        s"'$scheme' — raw object-store rename is not an atomic CAS, so " +
        "manifest commits need a rename-atomic layer, an external " +
        "commit lock, or conditional PUTs (docs/SCALE.md §8a); without " +
        "one, racing writers can silently drop a commit")
  }
  // every generation read goes through the same format seam as
  // FileDirStore, so the atomic-commit/GDPR-delete machinery is
  // format-agnostic (both bundled columnar formats honor mergeSchema)
  /** The store's physical bucket fan-out — public so bucket-grain
    * tooling ([[Repair]]) can mirror the layout it will rewrite. */
  def bucketCount: Int = numBuckets

  private def readDirs(dirs: Seq[String]): DataFrame =
    try spark.read.option("mergeSchema", "true").format(fmt).load(dirs: _*)
    catch {
      case scala.util.control.NonFatal(e) if dirs.length > 1 =>
        readDirsWidened(dirs, e)
    }

  /** NUMERIC TYPE-WIDENING schema evolution at read (X212 — the
    * Iceberg type-promotion matrix: byte→short→int→long,
    * float→double, decimal precision at fixed scale; metadata-only,
    * no rewrite): parquet's own mergeSchema refuses footers whose
    * column types conflict, so a widening upsert would strand every
    * pre-widening generation. This fallback (entered only when the
    * one-scan merge fails — zero cost on the common path) probes
    * each dir's schema, folds the per-field PROMOTION lattice
    * (recursing through arrays/structs; a non-promotable conflict —
    * int vs string — refuses loudly with the merge error attached),
    * and reads each dir cast to the widened shape, union'd by name
    * with missing columns null (mergeSchema's add-column semantics
    * preserved). Honest costs: one plan branch per dir (a heavily
    * widened table reads through an O(generations) union until the
    * next [[rebuild]] re-compacts it to one schema — the documented
    * remedy), and the cast on a filtered column sits between the
    * filter and the parquet scan, so pushdown on THAT column
    * degrades to a post-scan filter until rebuild. */
  private def readDirsWidened(dirs: Seq[String], cause: Throwable): DataFrame =
    widenedFrames(dirs, cause).map(_._3).reduce(_ unionByName _)

  /** The per-dir decomposition of [[readDirsWidened]]: each dir's
    * RAW footer schema plus its frame CAST to the folded promotion
    * target — exposed so the tombstone-aware read ([[readDataDirs]])
    * can widen and still anti-join each dir's own sidecars (the
    * tombstones × widening composition, docs/SCALE.md §8 item 14). */
  private def widenedFrames(
      dirs: Seq[String], cause: Throwable): Seq[(String, StructType, DataFrame)] = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types._
    val loaded = dirs.map(d => d -> spark.read.format(fmt).load(d))
    def promote(a: DataType, b: DataType): Option[DataType] = (a, b) match {
      case (x, y) if x == y => Some(x)
      case (x: DecimalType, y: DecimalType) if x.scale == y.scale =>
        Some(DecimalType(math.max(x.precision, y.precision), x.scale))
      case (ArrayType(x, n1), ArrayType(y, n2)) =>
        promote(x, y).map(ArrayType(_, n1 || n2))
      case (StructType(fa), StructType(fb))
          if fa.map(_.name).sameElements(fb.map(_.name)) =>
        val fs = fa.zip(fb).map { case (x, y) =>
          promote(x.dataType, y.dataType)
            .map(t => StructField(x.name, t, x.nullable || y.nullable))
        }
        if (fs.forall(_.isDefined)) Some(StructType(fs.map(_.get))) else None
      case _ =>
        val rank = Map[DataType, Int](ByteType -> 1, ShortType -> 2,
          IntegerType -> 3, LongType -> 4)
        val frac = Map[DataType, Int](FloatType -> 1, DoubleType -> 2)
        if (rank.contains(a) && rank.contains(b))
          Some(if (rank(a) >= rank(b)) a else b)
        else if (frac.contains(a) && frac.contains(b))
          Some(if (frac(a) >= frac(b)) a else b)
        else None
    }
    // union field names in first-seen order, fold each through the lattice
    val names = scala.collection.mutable.LinkedHashMap[String, StructField]()
    loaded.foreach { case (d, df) =>
      df.schema.fields.foreach { f =>
        names.get(f.name) match {
          case None => names(f.name) = f
          case Some(prev) =>
            val t = promote(prev.dataType, f.dataType).getOrElse(
              throw new IllegalArgumentException(
                s"cannot widen column '${f.name}': ${prev.dataType.simpleString} " +
                  s"vs ${f.dataType.simpleString} (dir $d) is outside the " +
                  "numeric promotion lattice", cause))
            names(f.name) = StructField(f.name, t, prev.nullable || f.nullable)
        }
      }
    }
    val target = names.values.toSeq
    loaded.map { case (d, df) =>
      val have = df.columns.toSet
      (d, df.schema, df.select(target.map { f =>
        if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*))
    }
  }

  /** WITHIN-FILE sort order ([[sortColumns]] — the Delta
    * OPTIMIZE-style layout knob at write time): rows sort WITHIN
    * tasks by (bucket, sortColumns∩schema) before every data write,
    * so each parquet file's row groups and pages carry TIGHT min/max
    * on those columns and the format's own predicate pushdown skips
    * inside files — the third pruning tier under the manifest's
    * dir-level stats (X165/X184) and Blooms (X185). Pure layout:
    * zero extra shuffle (sortWithinPartitions is narrow), no
    * manifest record, no read-path change, and absent columns are
    * ignored (a table whose schema predates the knob still writes). */
  private def sortedForWrite(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val cols = sortColumns.filter(df.columns.contains)
    if (cols.isEmpty) df
    else {
      val keys = (if (df.columns.contains(BucketCol)) Seq(BucketCol) else Nil) ++ cols
      df.sortWithinPartitions(keys.map(col): _*)
    }
  }

  private def writeDir(df: DataFrame, dest: String): Unit =
    sortedForWrite(df).write.mode(SaveMode.Overwrite).format(fmt).save(dest)
  private val BucketCol = "graft_bucket"
  private def tableDir(name: String) = new Path(s"$root/$name")
  private def fs(p: Path) = p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The physical bucket of a row: by default the hash of the upsert
    * KEY (even spread, O(touched-buckets) keyed writes). With
    * [[clusterColumn]] set, rows bucket by the hash of THAT column
    * instead — decoupling physical layout from the logical key, the
    * posting-list layout an IVF vector index needs: all rows of one
    * cell land in one bucket dir, so the per-dir min/max stats on the
    * cluster column become cell-narrow and a cell probe prunes to
    * ~1/numBuckets of the table. Constraint (documented, the standard
    * clustered-index trade): an upsert replaces a key's old row only
    * when the new row lands in the SAME cluster bucket — a key whose
    * cluster value CHANGES must be deleted first (for an ANN index:
    * vectors are append+delete, never mutated in place — re-embedding
    * a doc is a delete + insert). [[delete]] compensates by treating
    * every bucket as touched when clustering is on (the key Blooms
    * still narrow the rewrite set). */
  private def withBucket(df: DataFrame, key: String): DataFrame =
    withBucketN(df, key, numBuckets)

  private def withBucketN(df: DataFrame, key: String, fan: Int): DataFrame = {
    val bucketOf = clusterColumn match {
      case Some(cc) if df.columns.contains(cc) => org.apache.spark.sql.functions.col(cc)
      case _ => org.apache.spark.sql.functions.col(key)
    }
    df.withColumn(BucketCol,
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(bucketOf),
        org.apache.spark.sql.functions.lit(fan.toLong)))
  }

  /** The bucket fan-out keyed writes against this table MUST use: the
    * manifest's recorded modulus when present, else this store's
    * configured `numBuckets` (legacy tables predate the record —
    * their writers must keep the discipline of matching stores; every
    * new commit records the truth going forward). The configured
    * value applies to NEW tables, and to [[rebuild]] — the documented
    * fan-out migration point. */
  private def fanoutFor(prev: Option[Manifest]): Int =
    prev.flatMap(_.fanout).getOrElse(numBuckets)

  /** A committed snapshot: bucket → live data dir (table-relative),
    * plus append-log dirs, plus the highest streaming batch id applied
    * (rides in the same manifest so data + marker commit in ONE
    * rename — the exactly-once hinge for [[appendIfNew]]), plus
    * per-dir column min/max statistics (dir → (col, min, max) — the
    * data-skipping index; stats COMMIT IN THE SAME RENAME as the dirs
    * they describe, so a reader can never see a dir without its stats
    * or stats without their dir). */
  private final case class Manifest(
      version: Int,
      buckets: Map[Long, String],
      logs: Seq[String],
      lastBatch: Option[Long] = None,
      stats: Map[String, Seq[(String, String, String)]] = Map.empty,
      keys: Map[String, Seq[(String, String)]] = Map.empty,
      statsVersion: Int = SnapshotBucketedStore.CurrentStatsVersion,
      rows: Map[String, Long] = Map.empty,
      ndv: Map[String, Seq[(String, String)]] = Map.empty,
      qsk: Map[String, Seq[(String, String)]] = Map.empty,
      tombs: Map[String, Seq[(String, String)]] = Map.empty,
      commitMillis: Option[Long] = None,
      fanout: Option[Int] = None,
      bytes: Map[String, Long] = Map.empty,
      dropped: Option[Seq[String]] = None) {
    /** Columns DROPPED from this snapshot (X259, ALTER TABLE DROP
      * COLUMN): name-suppressed at read over every generation that
      * still physically carries them; rewrites shed them for real.
      * `None` means "not specified by this commit's builder" — the
      * commit point carries the previous manifest's marker forward,
      * so the 17 commit families stay oblivious; a parsed manifest
      * and the few semantics-bearing commits (drop itself, replace/
      * rebuild resetting to the new schema truth, restore) pass an
      * explicit `Some`. */
    def droppedNames: Seq[String] = dropped.getOrElse(Nil)
    /** Stats restricted to dirs this manifest still references — the
      * carry-forward rule every commit applies to its predecessor's
      * stats (superseded generations take their stats with them). */
    def liveStats: Map[String, Seq[(String, String, String)]] = {
      val live = buckets.values.toSet ++ logs
      stats.filter { case (d, _) => live(d) }
    }
    /** Same carry-forward rule for the per-dir key membership stats
      * (dir → (column, base64 Bloom of xxhash64(column))). */
    def liveKeys: Map[String, Seq[(String, String)]] = {
      val live = buckets.values.toSet ++ logs
      keys.filter { case (d, _) => live(d) }
    }
    /** Per-dir row counts, live-filtered like stats/keys (X214). */
    def liveRows: Map[String, Long] = {
      val live = buckets.values.toSet ++ logs
      rows.filter { case (d, _) => live(d) }
    }
    /** Per-dir data-file byte totals (X258), live-filtered alike —
      * recorded at commit so plan-time scan sizing is a manifest
      * fold, never a per-dir file listing (generation dirs are
      * immutable, so a recorded figure can never go stale). */
    def liveBytes: Map[String, Long] = {
      val live = buckets.values.toSet ++ logs
      bytes.filter { case (d, _) => live(d) }
    }
    /** Per-dir HLL sketches (X216), live-filtered like stats/keys. */
    def liveNdv: Map[String, Seq[(String, String)]] = {
      val live = buckets.values.toSet ++ logs
      ndv.filter { case (d, _) => live(d) }
    }
    /** Per-dir KLL quantile sketches (X218), live-filtered alike. */
    def liveQsk: Map[String, Seq[(String, String)]] = {
      val live = buckets.values.toSet ++ logs
      qsk.filter { case (d, _) => live(d) }
    }
    /** Outstanding MERGE-ON-READ key tombstones (X234): data dir →
      * (key column, tombstone-sidecar dir) pairs to anti-join at
      * read — pairs may mix key columns (SQL DELETEs target whatever
      * column the predicate names). Same carry-forward rule — a
      * rewritten/dropped data dir takes its tombstones with it (the
      * rewrite already applied them). */
    def liveTombs: Map[String, Seq[(String, String)]] = {
      val live = buckets.values.toSet
      tombs.filter { case (d, _) => live(d) }
    }
    /** Any tombstones outstanding? Gates the manifest-served
      * metadata aggregates: recorded per-dir counts/stats/sketches
      * describe PHYSICAL rows, which over-count a logically-deleted
      * snapshot — the shared honest degrade is a scan fallback,
      * never a wrong number. */
    def hasTombs: Boolean = liveTombs.nonEmpty
  }

  private val ManifestName = "manifest-(\\d+)\\.txt".r

  private def manifestAt(name: String, v: Int): Option[Manifest] = {
    val dir = tableDir(name)
    val f = fs(dir)
    val p = new Path(dir, s"manifest-$v.txt")
    if (!f.exists(p)) return None
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val entries = text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    val buckets = entries.collect { case s if s.startsWith("bucket:") =>
      val Array(b, d) = s.stripPrefix("bucket:").split("=", 2)
      b.toLong -> d
    }.toMap
    val logs = entries.collect { case s if s.startsWith("log:") => s.stripPrefix("log:") }
    val lastBatch = entries.collectFirst { case s if s.startsWith("batch:") =>
      s.stripPrefix("batch:").toLong }
    val stats = entries.collect { case s if s.startsWith("stats:") =>
      val Array(d, cs) = s.stripPrefix("stats:").split("=", 2)
      d -> cs.split(",").toSeq.map { t =>
        val Array(c, mn, mx) = t.split(":", 3); (c, mn, mx)
      }
    }.toMap
    // keys lines: `keys:<dir>=<col>:<base64>,...` — base64's standard
    // alphabet contains no ':' or ',', column names are [A-Za-z0-9_],
    // so the same delimiter discipline as stats lines holds
    val keyLines = entries.collect { case s if s.startsWith("keys:") =>
      val Array(d, cs) = s.stripPrefix("keys:").split("=", 2)
      d -> cs.split(",").toSeq.map { t =>
        val Array(c, b) = t.split(":", 2); (c, b)
      }
    }.toMap
    // stats format version: absent (pre-versioning manifest) → 1,
    // whose float-column stats may be float-shortest strings that
    // underestimate the double-promoted value — [[survives]] widens
    // v1 bounds by a relative epsilon so a double probe inside the
    // float-string gap can never wrongly skip a dir
    val statsVer = entries.collectFirst { case s if s.startsWith("statsver:") =>
      s.stripPrefix("statsver:").toInt }.getOrElse(1)
    val rowLines = entries.collect { case s if s.startsWith("rows:") =>
      val Array(d, n) = s.stripPrefix("rows:").split("=", 2)
      d -> n.toLong
    }.toMap
    // per-dir data-file byte totals (X258) — absent on legacy
    // manifests, whose scan sizing degrades to a per-dir listing
    // until any commit (or CALL system.analyze) backfills them
    val byteLines = entries.collect { case s if s.startsWith("bytes:") =>
      val Array(d, n) = s.stripPrefix("bytes:").split("=", 2)
      d -> n.toLong
    }.toMap
    val ndvLines = entries.collect { case s if s.startsWith("ndv:") =>
      val Array(d, cs) = s.stripPrefix("ndv:").split("=", 2)
      d -> cs.split(",").toSeq.map { t =>
        val Array(c, b) = t.split(":", 2); (c, b)
      }
    }.toMap
    val qskLines = entries.collect { case s if s.startsWith("qsk:") =>
      val Array(d, cs) = s.stripPrefix("qsk:").split("=", 2)
      d -> cs.split(",").toSeq.map { t =>
        val Array(c, b) = t.split(":", 2); (c, b)
      }
    }.toMap
    // tomb lines: `tomb:<dir>=<k1>:<t1>,<k2>:<t2>` — each sidecar
    // carries its own key column ([A-Za-z0-9_]+); dir rels carry no
    // ':' or ',', the same delimiter discipline as stats/keys lines
    val tombLines = entries.collect { case s if s.startsWith("tomb:") =>
      val Array(d, rest) = s.stripPrefix("tomb:").split("=", 2)
      d -> rest.split(",").toSeq.filter(_.nonEmpty).map { t =>
        val Array(k, rel) = t.split(":", 2); (k, rel)
      }
    }.toMap
    // commit wall-clock stamp (epoch millis) — absent on legacy
    // manifests, which time travel then cannot resolve BY TIME (only
    // by version); never guessed
    val tsLine = entries.collectFirst { case s if s.startsWith("ts:") =>
      s.stripPrefix("ts:").toLong }
    // recorded bucket FAN-OUT: the modulus rows were hashed into dirs
    // with — keyed writes adopt it over the store's configured
    // numBuckets, so a store opened with a different default can never
    // silently mis-target buckets (absent on legacy manifests)
    val fanLine = entries.collectFirst { case s if s.startsWith("fanout:") =>
      s.stripPrefix("fanout:").toInt }
    // dropped-column marker (X259) — ALWAYS explicit on a parsed
    // manifest (absent line ≡ nothing dropped), so a restore of a
    // pre-drop version resurrects the column rather than carrying a
    // later drop forward
    val dropLine = Some(entries.collectFirst {
      case s if s.startsWith("drop:") =>
        s.stripPrefix("drop:").split(",").toSeq.filter(_.nonEmpty)
    }.getOrElse(Nil))
    Some(Manifest(v, buckets, logs, lastBatch, stats, keyLines, statsVer,
      rowLines, ndvLines, qskLines, tombLines, tsLine, fanLine, byteLines,
      dropLine))
  }

  /** The stats version a NEW commit records: stats carried forward
    * from a previous manifest keep that manifest's (possibly older)
    * version — sticky min, because one v1-recorded float string in
    * the carried map would otherwise masquerade as current-format.
    * A table written entirely by this code is always current. */
  private def carriedStatsVersion(prev: Option[Manifest]): Int =
    prev.map(m => math.min(SnapshotBucketedStore.CurrentStatsVersion, m.statsVersion))
      .getOrElse(SnapshotBucketedStore.CurrentStatsVersion)

  private def latestManifest(name: String): Option[Manifest] = {
    val dir = tableDir(name)
    val f = fs(dir)
    if (!f.exists(dir)) return None
    val versions = f.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
      case ManifestName(n) => Some(n.toInt)
      case _ => None
    })
    if (versions.isEmpty) return None
    manifestAt(name, versions.max)
  }

  /** Test seam: crash-injection tests override this to die after data
    * dirs land but BEFORE the manifest rename — the largest window the
    * protocol must survive. */
  protected def beforeCommit(): Unit = ()

  /** Test seam: the hard-link publish call. Fallback tests override
    * this to refuse links the way some network mounts do, forcing the
    * degraded exists+rename path without faking a filesystem. */
  protected def createLink(dst: java.nio.file.Path, src: java.nio.file.Path): Unit = {
    java.nio.file.Files.createLink(dst, src)
    ()
  }

  /** The commit point: stage the manifest text fully, then publish it
    * with a true compare-and-set on the versioned name. A manifest for
    * this version already on disk means another writer won — refuse
    * loudly ([[ConcurrentCommitException]]), never replace.
    *
    * On HDFS-like filesystems rename refuses an existing target, so
    * stage-then-rename IS the CAS. On a posix local FS rename(2)
    * silently REPLACES the target — exists-then-rename has a window
    * where two writers racing to the same version (e.g. a streaming
    * drain vs [[SnapshotBucketedStore.compactLogs]]) would silently
    * drop the first commit. There the publish is a hard link instead:
    * link(2) fails EEXIST atomically, and the target appears fully
    * written because it aliases the completed staged file — both the
    * CAS and the all-or-nothing visibility survive. */
  /** Per-dir data-file byte totals for the manifest (X258): carry
    * every already-recorded figure forward (generation dirs are
    * immutable — a recorded size can never go stale), list ONLY the
    * dirs still missing one (the dirs this very commit just wrote,
    * plus a one-time backfill of legacy dirs). This is what keeps
    * plan-time scan sizing a pure manifest fold instead of O(live
    * dirs) namenode listings per query plan. A dir that fails to
    * list records nothing — its estimate degrades to the listing
    * fallback, never fails the commit. */
  private def bytesFilled(name: String, m: Manifest,
      prev: Option[Manifest]): Map[String, Long] = {
    val live = (m.buckets.values ++ m.logs).toSeq.distinct
    val known = prev.map(_.bytes).getOrElse(Map.empty) ++ m.bytes
    known ++ live.filterNot(known.contains).flatMap { d =>
      try {
        val p = new Path(resolveDir(name, d))
        Some(d -> fs(p).listStatus(p).filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith(".") && !n.startsWith("_")
        }.map(_.getLen).sum)
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  private def commit(name: String, m0: Manifest): Unit = {
    // one previous-manifest read serves both carry-forwards: per-dir
    // byte records (X258, dir-keyed and immutable) and the dropped-
    // column marker (X259, explicit `Some` wins — restore/replace
    // set it; every other commit family carries)
    val prev = latestManifest(name)
    val m = m0.copy(bytes = bytesFilled(name, m0, prev),
      dropped = m0.dropped.orElse(prev.flatMap(_.dropped)))
    val dir = tableDir(name)
    val f = fs(dir)
    // writer-unique staging name: two writers racing to the same
    // version must not clobber each other's staged text either
    val tmp = new Path(dir,
      s"manifest-${m.version}-${java.util.UUID.randomUUID}.tmp")
    val out = f.create(tmp, true)
    try {
      val lines =
        m.buckets.toSeq.sortBy(_._1).map { case (b, d) => s"bucket:$b=$d" } ++
          m.logs.map(l => s"log:$l") ++
          m.lastBatch.map(b => s"batch:$b").toSeq ++
          Seq(s"statsver:${m.statsVersion}") ++
          m.liveStats.toSeq.sortBy(_._1).collect {
            case (d, cs) if cs.nonEmpty =>
              s"stats:$d=" +
                cs.map { case (c, mn, mx) => s"$c:$mn:$mx" }.mkString(",")
          } ++
          m.liveKeys.toSeq.sortBy(_._1).collect {
            case (d, cs) if cs.nonEmpty =>
              s"keys:$d=" +
                cs.map { case (c, b) => s"$c:$b" }.mkString(",")
          } ++
          m.liveRows.toSeq.sortBy(_._1).map { case (d, n) => s"rows:$d=$n" } ++
          m.liveBytes.toSeq.sortBy(_._1).map { case (d, n) => s"bytes:$d=$n" } ++
          m.liveNdv.toSeq.sortBy(_._1).collect {
            case (d, cs) if cs.nonEmpty =>
              s"ndv:$d=" + cs.map { case (c, b) => s"$c:$b" }.mkString(",")
          } ++
          m.liveQsk.toSeq.sortBy(_._1).collect {
            case (d, cs) if cs.nonEmpty =>
              s"qsk:$d=" + cs.map { case (c, b) => s"$c:$b" }.mkString(",")
          } ++
          m.liveTombs.toSeq.sortBy(_._1).collect {
            case (d, ts) if ts.nonEmpty =>
              s"tomb:$d=" + ts.map { case (k, rel) => s"$k:$rel" }.mkString(",")
          } ++
          m.fanout.map(f => s"fanout:$f").toSeq ++
          m.dropped.map(_.distinct).filter(_.nonEmpty)
            .map(ds => s"drop:${ds.mkString(",")}").toSeq ++
          // the commit wall-clock stamp, taken HERE (never carried from
          // the Manifest the caller built) so every commit family gets
          // TIMESTAMP AS OF resolution for free; resolution applies a
          // monotone envelope, so a clock step backwards can never make
          // a later version resolve earlier than its predecessor
          Seq(s"ts:${System.currentTimeMillis()}")
      out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    } finally out.close()
    beforeCommit()
    val dst = new Path(dir, s"manifest-${m.version}.txt")
    // HDFS-style publish: rename refuses an existing target, so
    // exists-then-rename IS the CAS there. Also the degraded path for
    // file-scheme mounts that refuse hard links (some network FS) —
    // the EEXIST atomicity narrows to the exists/rename window, but
    // the commit still lands. A crash between create and publish
    // leaves the staged .tmp; [[vacuum]] sweeps it with the rest of
    // the crash debris (stage dirs, orphaned generations).
    def renameCas(): Unit = {
      if (f.exists(dst)) {
        f.delete(tmp, false)
        throw new ConcurrentCommitException(
          s"$name v${m.version} was committed by another writer")
      }
      if (!f.rename(tmp, dst))
        throw new java.io.IOException(s"manifest commit rename failed for $name v${m.version}")
    }
    if (f.getScheme == "file") {
      val tmpNio = java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath)
      val dstNio = java.nio.file.Paths.get(f.makeQualified(dst).toUri.getPath)
      // the catch scopes the LINK CALL ONLY: if the post-link tmp
      // cleanup threw inside it, the degraded renameCas would see dst
      // existing and raise a false ConcurrentCommitException for a
      // commit that actually landed
      val linked =
        try { createLink(dstNio, tmpNio); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            f.delete(tmp, false)
            throw new ConcurrentCommitException(
              s"$name v${m.version} was committed by another writer")
          // order matters: FileAlreadyExistsException IS a
          // FileSystemException — the true-CAS refusal above must match
          // first; anything else link-related degrades to rename
          case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
            false
        }
      if (linked) f.delete(tmp, false) // also removes the .crc sidecar
      else renameCas()
    } else renameCas()
  }

  /** Physical location of one manifest dir entry. Entries are
    * table-relative (`data/b3-g7`) except zero-copy CLONE references
    * (X221), which are store-root-relative with an `@` marker
    * (`@srcTable/data/b3-g7`) — a cloned table reads the original
    * owner's dirs until copy-on-write rewrites replace the refs. */
  private def resolveDir(name: String, d: String): String =
    if (d.startsWith("@")) new Path(new Path(root), d.drop(1)).toString
    else new Path(tableDir(name), d).toString

  private def dirsOf(name: String, m: Manifest, dirs: Iterable[String]): Seq[String] =
    dirs.map(resolveDir(name, _)).toSeq

  // ----------------------------------------------------------------
  // Data-skipping statistics (file-level min/max in the manifest)
  // ----------------------------------------------------------------

  /** Types whose `cast("string")` min/max round-trips EXACTLY and
    * compares correctly as BigDecimal — the soundness requirement
    * for skipping (a lossy bound could wrongly exclude a file).
    * Timestamps/dates are deliberately out: stat an epoch LONG
    * column instead (events.ts is already epoch-ns here). */
  private def statType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType => true
      case _: DecimalType => true
      case _ => false
    }
  }

  /** Floats are promoted to double BEFORE the string cast: a float's
    * shortest-decimal string can underestimate its double-promoted
    * value, and a caller passing a Double bound would then wrongly
    * skip a file. Shortest-repr strings of one IEEE width preserve
    * ordering as decimals, so double-everywhere is sound. */
  private def statInput(df: DataFrame, c: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.col
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.FloatType => col(c).cast("double")
      case _ => col(c)
    }
  }

  /** NaN / ±Infinity must never reach the manifest: Spark's max
    * treats NaN as largest and the string cast emits literals
    * BigDecimal can't parse. Dropping the stat (not clamping) is the
    * safe degrade — absence of stats always keeps the dir. */
  private def parsesAsDecimal(sv: String): Boolean =
    scala.util.Try(BigDecimal(sv)).isSuccess

  /** Everything the manifest records about ONE generation dir:
    * per-column min/max range stats plus per-column key membership
    * Blooms (base64 of the serialized filter over xxhash64(column)).
    * Both come out of the SAME aggregate job over the dir. */
  private final case class DirMeta(
      stats: Seq[(String, String, String)],
      keys: Seq[(String, String)],
      rows: Option[Long] = None,
      ndv: Seq[(String, String)] = Nil,
      qsk: Seq[(String, String)] = Nil) {
    def isEmpty: Boolean =
      stats.isEmpty && keys.isEmpty && rows.isEmpty && ndv.isEmpty && qsk.isEmpty
  }

  /** Key columns eligible for a membership Bloom: equality probing
    * compares xxhash64 of the column's NATIVE value against xxhash64
    * of the probe literal, so any hashable type works — but the probe
    * must be passed in the column's own type (documented contract,
    * same discipline as [[readWhere]] bounds). */
  private def keyColsOf(df: DataFrame): Seq[String] =
    keyColumns.filter(df.columns.contains)

  /** One Bloom-building aggregate column — the engine's own
    * codegen'd [[org.apache.spark.sql.catalyst.expressions.aggregate
    * .BloomFilterAggregate]] over xxhash64(col), the same machinery
    * behind [[graft.ops.Bloom]] and AQE runtime filters. Sized by
    * `keyExpectedItems` (fixed bits — an over-full dir degrades to
    * higher false-positive rate, i.e. fewer skips, never wrong). */
  private def bloomAgg(c: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftBridge.{toColumn, toExpr}
    import org.apache.spark.sql.functions.{col, xxhash64}
    toColumn(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(toExpr(xxhash64(col(c))), keyExpectedItems)
      .toAggregateExpression()).as(s"graft_kb_$c")
  }

  private def encodeBloom(bytes: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(bytes)

  /** Min/max of the declared stats columns plus key Blooms over one
    * frame, ONE agg job, map-side combinable, reading ONLY the
    * declared columns (columnar pruning makes this footer-cheap).
    * All-null stats columns record nothing (such a dir is
    * conservatively KEPT — absence of stats never lies). */
  private def metaOf(df: DataFrame): DirMeta = {
    import org.apache.spark.sql.functions.{count, lit, min, max}
    val cols = statsColumns.filter(c =>
      df.columns.contains(c) && statType(df.schema(c).dataType))
    val kCols = keyColsOf(df)
    val nCols = ndvColumns.filter(df.columns.contains)
    val qCols = quantileColsOf(df)
    // rows are ALWAYS counted (X214 metadata-only aggregates): for a
    // store with no stats/key columns this is one count-only job —
    // parquet answers it from footer metadata, no column scan
    val aggs = cols.flatMap(c => Seq(
      min(statInput(df, c)).cast("string").as(s"graft_mn_$c"),
      max(statInput(df, c)).cast("string").as(s"graft_mx_$c"))) ++
      kCols.map(bloomAgg) ++
      nCols.map(c => org.apache.spark.sql.functions
        .hll_sketch_agg(ndvInput(df, c), NdvLgK)
        .as(s"graft_nv_$c")) ++
      qCols.map(c => graft.expr.KllSketchAgg.kllSketch(
        org.apache.spark.sql.functions.col(c).cast("double"))
        .as(s"graft_qs_$c")) :+ count(lit(1)).as("graft_cnt_")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val stats = cols.zipWithIndex.flatMap { case (c, i) =>
      val mn = row.getString(2 * i); val mx = row.getString(2 * i + 1)
      if (mn == null || mx == null ||
        !parsesAsDecimal(mn) || !parsesAsDecimal(mx)) None
      else Some((c, mn, mx))
    }
    val base = 2 * cols.size
    // a ZERO-ROW generation (a streaming epoch whose batch deduped to
    // nothing still commits, to advance the batch mark) records an
    // EMPTY Bloom per key column — it provably contains no key, so
    // membership probes always skip it; leaving it unBloomed would
    // conservatively keep it forever
    val rowCount = row.getLong(base + kCols.size + nCols.size + qCols.size)
    val keys =
      if (rowCount == 0L && kCols.nonEmpty) kCols.map(_ -> encodeBloom(emptyBloomBytes))
      else kCols.zipWithIndex.flatMap { case (c, i) =>
        Option(row.getAs[Array[Byte]](base + i)).map(b => (c, encodeBloom(b)))
      }
    val ndv = nCols.zipWithIndex.flatMap { case (c, i) =>
      Option(row.getAs[Array[Byte]](base + kCols.size + i))
        .map(b => (c, encodeBloom(b)))
    }
    val qsk = qCols.zipWithIndex.flatMap { case (c, i) =>
      Option(row.getAs[Array[Byte]](base + kCols.size + nCols.size + i))
        .map(b => (c, encodeBloom(b)))
    }
    DirMeta(stats, keys, Some(rowCount), ndv, qsk)
  }

  /** The NDV sketch input for a column: `hll_sketch_agg` accepts
    * int/bigint/string/binary natively; decimal and floating columns
    * sketch their CANONICAL STRING form instead — distinct values map
    * 1:1 to distinct strings (fixed-scale decimals; shortest-repr
    * IEEE), so the estimate is unchanged and the type coverage
    * extends to the numeric columns CBO most wants NDV for. */
  private def ndvInput(df: DataFrame, c: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    val base = org.apache.spark.sql.functions.col(c)
    df.schema(c).dataType match {
      case _: DecimalType | FloatType | DoubleType => base.cast("string")
      case _ => base
    }
  }

  /** Serialized empty Bloom (contains nothing — every probe misses):
    * the membership stat of a zero-row generation dir. */
  private lazy val emptyBloomBytes: Array[Byte] = {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1L)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Meta for one freshly-written generation dir, computed by
    * reading it back (never by re-running the caller's plan). */
  private def metaForDir(name: String, rel: String): Map[String, DirMeta] = {
    val m = metaOf(readDirs(Seq(new Path(tableDir(name), rel).toString)))
    if (m.isEmpty) Map.empty else Map(rel -> m)
  }

  private def statsPart(m: Map[String, DirMeta]): Map[String, Seq[(String, String, String)]] =
    m.collect { case (d, dm) if dm.stats.nonEmpty => d -> dm.stats }
  private def rowsPart(m: Map[String, DirMeta]): Map[String, Long] =
    m.collect { case (d, dm) if dm.rows.isDefined => d -> dm.rows.get }
  private def ndvPart(m: Map[String, DirMeta]): Map[String, Seq[(String, String)]] =
    m.collect { case (d, dm) if dm.ndv.nonEmpty => d -> dm.ndv }
  private def qskPart(m: Map[String, DirMeta]): Map[String, Seq[(String, String)]] =
    m.collect { case (d, dm) if dm.qsk.nonEmpty => d -> dm.qsk }

  /** Quantile-sketch eligibility: declared, present, and NUMERIC —
    * the sketch is over the double promotion, a visible cast
    * (ints past 2^53 round; the stats min/max tier keeps exactness). */
  private def quantileColsOf(df: DataFrame): Seq[String] =
    quantileColumns.filter(c => df.columns.contains(c) &&
      df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
  private def keysPart(m: Map[String, DirMeta]): Map[String, Seq[(String, String)]] =
    m.collect { case (d, dm) if dm.keys.nonEmpty => d -> dm.keys }

  /** Per-bucket meta of a staged upsert/delete write, ONE job: the
    * staged dir is partitioned by the bucket column, so a grouped
    * min/max + Bloom aggregate yields every bucket's entry at once
    * (≤ numBuckets result rows — driver-safe). */
  private def metaForStage(stagePath: String): Map[Long, DirMeta] = {
    import org.apache.spark.sql.functions.{col, count, lit, min, max}
    // (no early-out on empty stats/key columns: per-bucket row counts
    // are recorded for every store — X214 metadata-only aggregates)
    // An empty staged write (empty-delta upsertWithBatch that only
    // advances the batch mark, or a delete that emptied every touched
    // bucket) has no data files — schema inference would throw and
    // fail the whole commit. Checked EXPLICITLY by listing the stage
    // for data files: a blanket AnalysisException catch here would
    // also swallow genuine read failures (corrupt footer, bad format
    // options) and silently commit a generation without stats or
    // Blooms. No files → no stats to record; any other failure
    // propagates and fails the commit loudly, as it should.
    val stageP = new Path(stagePath)
    val f = fs(stageP)
    val hasDataFiles = f.exists(stageP) && {
      val it = f.listFiles(stageP, true)
      var found = false
      while (!found && it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (st.isFile && !n.startsWith(".") && !n.startsWith("_")) found = true
      }
      found
    }
    if (!hasDataFiles) return Map.empty
    val df = spark.read.option("mergeSchema", "true").format(fmt).load(stagePath)
    val cols = statsColumns.filter(c =>
      df.columns.contains(c) && statType(df.schema(c).dataType))
    val kCols = keyColsOf(df)
    val nCols = ndvColumns.filter(df.columns.contains)
    val qCols = quantileColsOf(df)
    // rows counted per bucket unconditionally (X214) — a staged
    // bucket dir always holds >= 1 row, and the count rides the same
    // grouped job as the stats/Blooms (footer-cheap when it is alone)
    val aggs = cols.flatMap(c => Seq(
      min(statInput(df, c)).cast("string").as(s"graft_mn_$c"),
      max(statInput(df, c)).cast("string").as(s"graft_mx_$c"))) ++
      kCols.map(bloomAgg) ++
      nCols.map(c => org.apache.spark.sql.functions
        .hll_sketch_agg(ndvInput(df, c), NdvLgK).as(s"graft_nv_$c")) ++
      qCols.map(c => graft.expr.KllSketchAgg.kllSketch(
        col(c).cast("double")).as(s"graft_qs_$c")) :+
      count(lit(1)).as("graft_cnt_")
    // the partition-dir read infers graft_bucket as INT — normalize
    df.groupBy(col(BucketCol).cast("long").as(BucketCol))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { row =>
        val b = row.getLong(0)
        val stats = cols.zipWithIndex.flatMap { case (c, i) =>
          val mn = row.getString(2 * i + 1); val mx = row.getString(2 * i + 2)
          if (mn == null || mx == null ||
            !parsesAsDecimal(mn) || !parsesAsDecimal(mx)) None
          else Some((c, mn, mx))
        }
        val base = 1 + 2 * cols.size
        val keys = kCols.zipWithIndex.flatMap { case (c, i) =>
          Option(row.getAs[Array[Byte]](base + i)).map(x => (c, encodeBloom(x)))
        }
        val ndv = nCols.zipWithIndex.flatMap { case (c, i) =>
          Option(row.getAs[Array[Byte]](base + kCols.size + i))
            .map(x => (c, encodeBloom(x)))
        }
        val qsk = qCols.zipWithIndex.flatMap { case (c, i) =>
          Option(row.getAs[Array[Byte]](base + kCols.size + nCols.size + i))
            .map(x => (c, encodeBloom(x)))
        }
        b -> DirMeta(stats, keys,
          Some(row.getLong(base + kCols.size + nCols.size + qCols.size)), ndv, qsk)
      }
      .filter(!_._2.isEmpty)
      .toMap
  }

  /** Does a dir's recorded range intersect [lower, upper]? Missing
    * stats (no line, or the column not recorded) keep the dir —
    * skipping is an optimization, never a semantics change. Stats a
    * pre-fix manifest recorded as NaN/Infinity (or any future
    * unparseable form) also KEEP the dir: a stat we can't interpret
    * must never exclude data. */
  private def survives(
      stats: Option[Seq[(String, String, String)]],
      column: String,
      lower: BigDecimal,
      upper: BigDecimal,
      legacyStats: Boolean = false): Boolean =
    stats.flatMap(_.find(_._1 == column)) match {
      case None => true
      case Some((_, mn, mx)) =>
        (scala.util.Try(BigDecimal(mn)), scala.util.Try(BigDecimal(mx))) match {
          case (scala.util.Success(lo0), scala.util.Success(hi0)) =>
            // pre-versioning (v1) manifests may hold float-shortest
            // strings whose double promotion sits OUTSIDE the string
            // value — widen the recorded range so those dirs are
            // conservatively kept, never wrongly skipped
            val eps = SnapshotBucketedStore.LegacyStatsEps
            val lo = if (legacyStats) lo0 - lo0.abs * eps else lo0
            val hi = if (legacyStats) hi0 + hi0.abs * eps else hi0
            hi >= lower && lo <= upper
          case _ => true
        }
    }

  /** Range-predicate read with MANIFEST-LEVEL data skipping: returns
    * exactly `read(name).filter(column between lower and upper)`, but
    * scans ONLY the generation dirs whose recorded [min, max]
    * intersects the range — on a 100 TB table whose commits arrive
    * roughly sorted on the column (time-ordered ingest, Z-ordered
    * layout), a selective predicate touches a handful of files where
    * the plain read lists and opens every one. Bounds compare as
    * exact decimals against the recorded strings (no double
    * rounding), and the residual filter still applies to surviving
    * dirs — stats only ever EXCLUDE provably-disjoint dirs. Pass
    * bounds in the column's own type (a Long for a long column) so
    * the residual filter also pushes down into the parquet scan.
    * Float bounds are promoted to double for the skip comparison —
    * stats record float columns double-promoted (see [[statInput]]),
    * and a float's own shortest string can misorder against them. */
  def readWhere(name: String, column: String, lower: Any, upper: Any): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{col, lit}
    latestManifest(name).flatMap { m =>
      val all = (m.buckets.values ++ m.logs).toSeq
      if (all.isEmpty) return None
      val lo = boundDecimal(lower); val hi = boundDecimal(upper)
      val kept = all.filter(d => survives(m.stats.get(d), column, lo, hi,
        m.statsVersion < SnapshotBucketedStore.CurrentStatsVersion))
      val pred = col(column) >= lit(lower) && col(column) <= lit(upper)
      if (kept.isEmpty)
        // every dir provably disjoint: zero rows, schema preserved
        readManifest(name, m).map(_.limit(0).filter(pred))
      else Some(readDataDirs(name, m, kept).filter(pred))
    }
  }

  /** The skip metric behind [[readWhere]]: (dirs the predicate must
    * scan, total dirs in the snapshot) — the X75-style proof
    * surface: specs assert kept/total ≤ ¼ on a selective range. */
  def pruneStats(name: String, column: String, lower: Any, upper: Any): Option[(Int, Int)] =
    latestManifest(name).map { m =>
      val all = (m.buckets.values ++ m.logs).toSeq
      val lo = boundDecimal(lower); val hi = boundDecimal(upper)
      (all.count(d => survives(m.stats.get(d), column, lo, hi,
        m.statsVersion < SnapshotBucketedStore.CurrentStatsVersion)), all.size)
    }

  /** CONJUNCTIVE multi-column data skipping: returns exactly
    * `read(name).filter(AND_i  col_i between lo_i and hi_i)`, pruning
    * a dir when ANY conjunct's recorded [min, max] is disjoint from
    * its interval — the intersection of the per-column keep sets, so
    * a 100 TB table filtered on (date, source_id) skips dirs either
    * stat alone would have to scan. Same conservative degradation per
    * column: an unstatted column keeps the dir for ITS conjunct but
    * the other conjuncts still prune. Bound discipline as
    * [[readWhere]] (column's own type, Float promoted). */
  def readWhereAll(
      name: String,
      preds: Seq[(String, Any, Any)]): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{col, lit}
    require(preds.nonEmpty, "readWhereAll needs at least one conjunct")
    latestManifest(name).flatMap { m =>
      val all = (m.buckets.values ++ m.logs).toSeq
      if (all.isEmpty) return None
      val decs = preds.map { case (c, lo, hi) =>
        (c, boundDecimal(lo), boundDecimal(hi)) }
      val kept = all.filter(d =>
        decs.forall { case (c, lo, hi) => survives(m.stats.get(d), c, lo, hi,
          m.statsVersion < SnapshotBucketedStore.CurrentStatsVersion) })
      val pred = preds.map { case (c, lo, hi) =>
        col(c) >= lit(lo) && col(c) <= lit(hi) }.reduce(_ && _)
      if (kept.isEmpty)
        readManifest(name, m).map(_.limit(0).filter(pred))
      else Some(readDataDirs(name, m, kept).filter(pred))
    }
  }

  /** [[pruneStats]] for the conjunctive form — proves the 2-column
    * intersection strictly tighter than either single column. */
  def pruneStatsAll(
      name: String,
      preds: Seq[(String, Any, Any)]): Option[(Int, Int)] =
    latestManifest(name).map { m =>
      val all = (m.buckets.values ++ m.logs).toSeq
      val decs = preds.map { case (c, lo, hi) =>
        (c, boundDecimal(lo), boundDecimal(hi)) }
      (all.count(d =>
        decs.forall { case (c, lo, hi) => survives(m.stats.get(d), c, lo, hi,
          m.statsVersion < SnapshotBucketedStore.CurrentStatsVersion) }),
        all.size)
    }

  /** Exact decimal of a range bound, promoting Float → Double first
    * so the comparison space matches the recorded (double-promoted)
    * stats. */
  private def boundDecimal(v: Any): BigDecimal = v match {
    case f: Float => BigDecimal(f.toDouble.toString)
    case f: java.lang.Float => BigDecimal(f.doubleValue.toString)
    case other => BigDecimal(other.toString)
  }

  // ----------------------------------------------------------------
  // Point-lookup skipping (per-dir key membership Blooms)
  // ----------------------------------------------------------------

  /** xxhash64 of a probe value, evaluated DRIVER-SIDE through the
    * same engine expression the recorded Blooms were built over —
    * the two sides must hash identically, so the hash is computed by
    * the expression, never re-implemented. The value must be passed
    * in the column's own external type (a Long for a long column):
    * xxhash64 is type-tagged, so an Int probe of a Long column would
    * silently never match. */
  private def keyHash(value: Any): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    new XxHash64(Seq(Literal(value)))
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Long]
  }

  /** [[keyHash]] made SAFE against probe-type drift: xxhash64 is
    * type-tagged, so an Int probe of a Long column (or a
    * differently-scaled Decimal) hashes differently from the recorded
    * Bloom and would prune every dir — breaking the "no false
    * negatives" contract while `read().filter(col === value)` happily
    * coerces and returns rows. The probe is therefore CAST to the
    * column's read-schema type before hashing; a probe whose cast is
    * lossy for this value (round-trip back to the probe's own type
    * changes it) or impossible returns None, which callers treat as
    * "keep every dir" — the conservative degrade, exact residual
    * filters keep the semantics. */
  private def typedKeyHash(value: Any, dt: org.apache.spark.sql.types.DataType): Option[Long] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, XxHash64}
    val lit =
      try Literal(value)
      catch { case scala.util.control.NonFatal(_) => return None }
    val typed: Literal =
      if (lit.dataType == dt) lit
      else if (!Cast.canCast(lit.dataType, dt)) return None
      else {
        // ANSI sessions make Cast THROW on overflow (a sibling probe
        // downcasting 123456789L to TINYINT) — same meaning as the
        // null result: no value of dt equals the probe
        val v =
          try Cast(lit, dt, Some("UTC")).eval(InternalRow.empty)
          catch { case scala.util.control.NonFatal(_) => return None }
        if (v == null) return None // cast failed: no value of dt equals the probe... keep dirs anyway
        // lossless round-trip check: cast back to the probe's own
        // type and compare — an overflow-wrapped or truncated cast
        // must not hash (it would target the WRONG value's dirs)
        val back =
          try Cast(Literal(v, dt), lit.dataType, Some("UTC")).eval(InternalRow.empty)
          catch { case scala.util.control.NonFatal(_) => return None }
        if (back == null || back != lit.value) return None
        Literal(v, dt)
      }
    Some(new XxHash64(Seq(typed))
      .eval(InternalRow.empty).asInstanceOf[Long])
  }

  /** Every hash a probe value may carry across the type-widening
    * lattice (X212): a widened column's OLD generations recorded
    * Blooms at the NARROWER physical type (xxhash64 is type-tagged),
    * so probing only the merged read-schema type would falsely prune
    * dirs written before the widening — a false NEGATIVE, breaking
    * the membership contract. The probe therefore hashes at the
    * column's current type AND every narrower same-family sibling
    * the value round-trips through losslessly; a dir survives if ANY
    * hash might be contained. Extra hashes only ever KEEP more dirs
    * (false positives scan; never a miss). Decimals hash by unscaled
    * value — precision-invariant within the ≤18 / >18 encoding split,
    * so only that boundary needs a sibling. None = unhashable probe,
    * callers keep every dir. */
  private def typedKeyHashes(value: Any,
      dt: org.apache.spark.sql.types.DataType): Option[Seq[Long]] = {
    import org.apache.spark.sql.types._
    val siblings: Seq[DataType] = dt match {
      case LongType => Seq(ByteType, ShortType, IntegerType)
      case IntegerType => Seq(ByteType, ShortType)
      case ShortType => Seq(ByteType)
      case DoubleType => Seq(FloatType)
      case d: DecimalType if d.precision > 18 => Seq(DecimalType(18, d.scale))
      case _ => Nil
    }
    typedKeyHash(value, dt).map(h =>
      (h +: siblings.flatMap(typedKeyHash(value, _))).distinct)
  }

  /** The read-schema type of `column` for the snapshot `m` describes
    * (merged across generations — widening upserts make per-dir
    * schemas differ). None when the table/column is unreadable; the
    * caller degrades to no pruning and lets the residual filter
    * raise whatever the plain read would. */
  private def columnTypeOf(name: String, m: Manifest,
      column: String): Option[org.apache.spark.sql.types.DataType] =
    (try readManifest(name, m) catch { case scala.util.control.NonFatal(_) => None })
      .flatMap(df => df.schema.fields.find(_.name == column).map(_.dataType))

  /** The recorded key Bloom of one dir, deserialized ONCE — callers
    * probing many hashes against many dirs must not pay a multi-KB
    * base64 decode + deserialization per (hash, dir) pair. None
    * means no recorded (or undecodable) Bloom: keep the dir. */
  private def dirBloom(
      keys: Option[Seq[(String, String)]],
      column: String): Option[org.apache.spark.util.sketch.BloomFilter] =
    keys.flatMap(_.find(_._1 == column)).flatMap { case (_, b64) =>
      try Some(org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(
          java.util.Base64.getDecoder.decode(b64))))
      catch { case scala.util.control.NonFatal(_) => None }
    }

  /** POINT-LOOKUP read with membership skipping: returns exactly
    * `read(name).filter(column === value)`, scanning ONLY the
    * generation dirs whose recorded key Bloom might contain the
    * value. Range min/max helps time-ordered scans; this is its
    * complement for high-cardinality equality probes — an id lookup
    * on a 100 TB table touches ~the dirs that ever wrote that id
    * (Bloom fpp extra dirs at worst), not every file. The residual
    * equality filter still applies to surviving dirs and pushes into
    * the columnar scan. `value` must be the column's own type. */
  def readWhereEq(name: String, column: String, value: Any): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{col, lit}
    latestManifest(name).flatMap { m =>
      val all = (m.buckets.values ++ m.logs).toSeq
      if (all.isEmpty) return None
      // probe cast to the column's own type before hashing (xxhash64
      // is type-tagged), PLUS every narrower widening sibling — old
      // generations of a widened column recorded narrow-typed Blooms
      // ([[typedKeyHashes]]); an uncastable/lossy probe keeps every dir
      val hOpt = columnTypeOf(name, m, column).flatMap(typedKeyHashes(value, _))
      val kept = hOpt match {
        case Some(hs) => all.filter(d => dirBloom(m.keys.get(d), column)
          .forall(bf => hs.exists(bf.mightContainLong)))
        case None => all
      }
      val pred = col(column) === lit(value)
      if (kept.isEmpty)
        readManifest(name, m).map(_.limit(0).filter(pred))
      else Some(readDataDirs(name, m, kept).filter(pred))
    }
  }

  /** The skip metric behind [[readWhereEq]]: (dirs the probe must
    * scan, total dirs in the snapshot). */
  def pruneEqStats(name: String, column: String, value: Any): Option[(Int, Int)] =
    latestManifest(name).map { m =>
      val all = (m.buckets.values ++ m.logs).toSeq
      columnTypeOf(name, m, column).flatMap(typedKeyHashes(value, _)) match {
        case Some(hs) =>
          (all.count(d => dirBloom(m.keys.get(d), column)
            .forall(bf => hs.exists(bf.mightContainLong))), all.size)
        case None => (all.size, all.size)
      }
    }

  /** MULTI-PROBE membership pruning — the history side of a streaming
    * dedup's anti-join: return the snapshot's rows from ONLY the
    * generation dirs whose recorded key Bloom might contain AT LEAST
    * ONE of `values`. The result is a conservative SUPERSET of the
    * rows whose `column` is in `values`, with NO residual filter —
    * callers doing an exact anti-join (or isin) supply their own
    * exactness, which is what makes the conservative direction safe.
    * At 100 TB a micro-batch of new fingerprints touches ~the dirs
    * that ever saw a colliding key, not every generation ever
    * appended. Probes are type-cast like [[readWhereEq]]; a probe
    * that can't hash safely keeps every dir. */
  def readWhereEqAny(name: String, column: String,
      values: Seq[Any]): Option[DataFrame] =
    latestManifest(name).flatMap { m =>
      val all = (m.buckets.values ++ m.logs).toSeq
      if (all.isEmpty) return None
      val kept = keptForAny(name, m, all, column, values)
      if (kept.isEmpty) readManifest(name, m).map(_.limit(0))
      else Some(readDataDirs(name, m, kept))
    }

  /** The skip metric behind [[readWhereEqAny]]. */
  def pruneEqAnyStats(name: String, column: String,
      values: Seq[Any]): Option[(Int, Int)] =
    latestManifest(name).map { m =>
      val all = (m.buckets.values ++ m.logs).toSeq
      (keptForAny(name, m, all, column, values).size, all.size)
    }

  /** MANIFEST-SERVED PLANNING STATISTICS (X250): (row count if every
    * surviving dir records one, total file bytes if every surviving
    * dir lists) for the generation dirs a pushed filter set leaves
    * after pruning — the numbers a COST-BASED JOIN PLANNER needs to
    * auto-broadcast the small side of a SQL join over catalog tables.
    * Without them the V1-bridge scan reports "unknown" and Spark
    * assumes the worst (`defaultSizeInBytes` = never broadcast), so a
    * dim⋈fact SQL join over the store sort-merge-shuffles BOTH sides
    * at any scale. Estimate semantics, biased only in the SAFE
    * direction: rows/bytes describe whole surviving dirs before the
    * residual predicate (an OVERestimate keeps a big table from being
    * wrongly broadcast; it never causes one), tombstoned dirs count
    * physical rows (same upper bound), and any dir whose row count or
    * file listing is unavailable yields None for that figure — the
    * caller reports "unknown" and planning falls back to Spark's
    * defaults, never to an understated size. The family precedence
    * (eq, then IN, then closed ranges) mirrors the pruned read
    * exactly, so the estimate describes the dirs that scan would
    * open. O(surviving dirs) manifest lookups at plan time — pure
    * metadata, ZERO filesystem calls on a bytes-covered table
    * (X258); only legacy dirs degrade to a per-dir listing. */
  def scanEstimate(name: String,
      eq: Option[(String, Any)] = None,
      inSet: Option[(String, Seq[Any])] = None,
      ranges: Seq[(String, Any, Any)] = Nil,
      version: Option[Int] = None): Option[(Option[Long], Option[Long])] = {
    val mOpt = version match {
      case Some(v) => manifestAt(name, v)
      case None => latestManifest(name)
    }
    mOpt.map { m =>
      val all = (m.buckets.values ++ m.logs).toSeq
      val kept: Seq[String] =
        if (version.isDefined) all // pinned reads serve the full snapshot
        else eq match {
          case Some((c, v)) =>
            columnTypeOf(name, m, c).flatMap(typedKeyHashes(v, _)) match {
              case Some(hs) => all.filter(d => dirBloom(m.keys.get(d), c)
                .forall(bf => hs.exists(bf.mightContainLong)))
              case None => all
            }
          case None => inSet match {
            case Some((c, vs)) => keptForAny(name, m, all, c, vs)
            case None if ranges.nonEmpty =>
              val decs = ranges.map { case (c, lo, hi) =>
                (c, boundDecimal(lo), boundDecimal(hi)) }
              all.filter(d => decs.forall { case (c, lo, hi) =>
                survives(m.stats.get(d), c, lo, hi,
                  m.statsVersion < SnapshotBucketedStore.CurrentStatsVersion) })
            case None => all
          }
        }
      val rows =
        if (kept.forall(m.rows.contains)) Some(kept.flatMap(m.rows.get).sum)
        else None
      // byte sizing is a MANIFEST FOLD (X258): every commit records
      // its dirs' data-file bytes in the same rename, so plan-time
      // sizing costs zero filesystem calls on a covered table. Only
      // legacy dirs (written before bytes recording) fall back to a
      // listing — one ANALYZE (or any commit) backfills them for good.
      val bytes = kept.foldLeft(Option(0L)) { (acc, d) =>
        acc.flatMap { sum =>
          m.bytes.get(d).map(sum + _).orElse {
            val p = new Path(resolveDir(name, d))
            try Some(sum + fs(p).listStatus(p).filter { st =>
              val n = st.getPath.getName
              st.isFile && !n.startsWith(".") && !n.startsWith("_")
            }.map(_.getLen).sum)
            catch { case scala.util.control.NonFatal(_) => None }
          }
        }
      }
      (rows, bytes)
    }
  }

  /** METADATA-ONLY COUNT(*) (X214 — the Delta-style numRecords
    * trick): Σ per-dir recorded row counts, answered from the
    * manifest alone — no data file is opened, so the answer costs
    * milliseconds at ANY table size. Every commit since row counting
    * records its new dirs' counts in the same manifest rename as the
    * dirs (counts can never disagree with the data they describe);
    * None when any live dir lacks one (tables last written by older
    * code) — callers fall back to a scan, the conservative degrade
    * every metadata tier here shares. */
  def metadataCount(name: String): Option[Long] =
    latestManifest(name).flatMap { m =>
      if (m.hasTombs) return None // physical counts over-count → scan
      val live = (m.buckets.values ++ m.logs).toSeq
      val counts = live.map(m.rows.get)
      if (counts.exists(_.isEmpty)) None else Some(counts.flatten.sum)
    }

  /** METADATA-ONLY MIN/MAX of a stats column — EXACT, not a bound:
    * per-dir min/max are computed from the data at commit (and
    * rewritten dirs recompute), so the fold over live dirs is the
    * true global extremum over non-null values (SQL MIN/MAX
    * semantics — nulls never enter dir stats). Served only when the
    * manifest's stats format is current (v1 float-shortest strings
    * are approximations — [[SnapshotBucketedStore.LegacyStatsEps]])
    * and every live dir either records stats for the column or is
    * provably empty (recorded rows == 0); a dir with rows but no
    * recorded stats (all-null column, non-stat column, unparseable
    * NaN stat) makes the answer unknowable from metadata → None,
    * scan fallback. All-empty table → None (SQL's NULL MIN). */
  def metadataMinMax(name: String,
      column: String): Option[(BigDecimal, BigDecimal)] =
    latestManifest(name).flatMap { m =>
      if (m.statsVersion != SnapshotBucketedStore.CurrentStatsVersion) None
      else if (m.hasTombs) None // stats describe physical rows → scan
      else if (m.droppedNames.contains(column)) None // retired name (X259)
      else {
        val live = (m.buckets.values ++ m.logs).toSeq
        // per dir: Some(Some(bounds)) usable, Some(None) blocks
        // serving, None contributes nothing (provably empty dir)
        val per: Seq[Option[(BigDecimal, BigDecimal)]] = live.flatMap { d =>
          m.stats.get(d).flatMap(_.find(_._1 == column)) match {
            case Some((_, mn, mx)) =>
              (scala.util.Try(BigDecimal(mn)), scala.util.Try(BigDecimal(mx))) match {
                case (scala.util.Success(a), scala.util.Success(b)) =>
                  Seq(Some((a, b)))
                case _ => Seq(None)
              }
            case None =>
              if (m.rows.get(d).contains(0L)) Nil else Seq(None)
          }
        }
        if (per.exists(_.isEmpty) || per.isEmpty) None
        else {
          val vals = per.flatten
          Some((vals.map(_._1).min, vals.map(_._2).max))
        }
      }
    }

  /** METADATA-ONLY approximate distinct count of an [[ndvColumns]]
    * column (X216 — the Iceberg-puffin NDV trick): every commit
    * records a per-dir HLL sketch (Apache DataSketches, lgK =
    * [[SnapshotBucketedStore.NdvLgK]] — ~1.6% standard error, ~4 KB
    * per dir) in the same manifest rename as the dir; the answer is
    * one union-and-estimate over the live dirs' sketches — no data
    * file opened, and the union is EXACTLY the sketch of the
    * concatenated streams (HLL registers max-merge), so the estimate
    * equals sketching the whole table directly. Estimate tier,
    * stated honestly: this is the planner/monitoring answer (join
    * sizing, growth dashboards, cardinality regressions); an exact
    * distinct still scans. None when any live non-empty dir lacks a
    * recorded sketch (legacy tables, non-ndv column) — scan
    * fallback, the conservative degrade the metadata tier shares. */
  def metadataApproxDistinct(name: String, column: String): Option[Long] =
    latestManifest(name).flatMap { m =>
      if (m.hasTombs) return None // sketches describe physical rows → scan
      if (m.droppedNames.contains(column)) return None // retired name (X259)
      val live = (m.buckets.values ++ m.logs).toSeq
      val per: Seq[Option[String]] = live.flatMap { d =>
        m.ndv.get(d).flatMap(_.find(_._1 == column)) match {
          case Some((_, b64)) => Seq(Some(b64))
          case None =>
            if (m.rows.get(d).contains(0L)) Nil else Seq(None)
        }
      }
      if (per.exists(_.isEmpty)) None
      else if (per.isEmpty) Some(0L)
      else {
        import org.apache.spark.sql.functions.{col, hll_sketch_estimate, hll_union_agg}
        val sketches = per.flatten.map(b64 =>
          org.apache.spark.sql.Row(java.util.Base64.getDecoder.decode(b64)))
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(sketches, 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("s",
              org.apache.spark.sql.types.BinaryType))))
        Some(df.agg(hll_sketch_estimate(hll_union_agg(col("s"), false)))
          .head().getLong(0))
      }
    }

  /** PER-COLUMN PLANNING STATISTICS from ONE manifest read (X254 —
    * the CBO tier of X250): for every column the manifest can vouch
    * for, (min, max) folded from the per-dir stats exactly like
    * [[metadataMinMax]] and an NDV estimate from a DRIVER-SIDE union
    * of the recorded per-dir HLL sketches (DataSketches heapify +
    * union — the same registers `hll_union_agg` merges, without
    * launching a job at plan time). A column blocked on either figure
    * simply drops that figure; tombstones or a legacy stats format
    * drop everything (physical-row figures would mis-estimate a
    * logically-deleted snapshot — the metadata tier's standing
    * exact-or-refuse rule). Consumed by the scan's
    * `Statistics.columnStats()` under `spark.sql.cbo.enabled`. */
  def columnStatsServe(name: String)
      : Map[String, (Option[(BigDecimal, BigDecimal)], Option[Long])] =
    latestManifest(name) match {
      case None => Map.empty
      case Some(m) =>
        if (m.hasTombs ||
            m.statsVersion != SnapshotBucketedStore.CurrentStatsVersion)
          return Map.empty
        val live = (m.buckets.values ++ m.logs).toSeq
        val nonEmpty = live.filterNot(d => m.rows.get(d).contains(0L))
        def minMax(c: String): Option[(BigDecimal, BigDecimal)] = {
          val per = nonEmpty.map(d =>
            m.stats.get(d).flatMap(_.find(_._1 == c)).flatMap {
              case (_, mn, mx) =>
                (scala.util.Try(BigDecimal(mn)).toOption,
                  scala.util.Try(BigDecimal(mx)).toOption) match {
                  case (Some(a), Some(b)) => Some((a, b))
                  case _ => None
                }
            })
          if (per.isEmpty || per.exists(_.isEmpty)) None
          else Some((per.flatten.map(_._1).min, per.flatten.map(_._2).max))
        }
        def ndv(c: String): Option[Long] = {
          val per = nonEmpty.map(d => m.ndv.get(d).flatMap(_.find(_._1 == c)))
          if (per.isEmpty || per.exists(_.isEmpty)) None
          else try {
            val u = new org.apache.datasketches.hll.Union(SnapshotBucketedStore.NdvLgK)
            per.flatten.foreach { case (_, b64) =>
              u.update(org.apache.datasketches.hll.HllSketch.heapify(
                java.util.Base64.getDecoder.decode(b64)))
            }
            Some(Math.round(u.getResult.getEstimate))
          } catch { case scala.util.control.NonFatal(_) => None }
        }
        // a DROPPED declared column serves nothing: its recorded
        // figures describe a name the schema no longer carries (X259)
        val cols = (statsColumns ++ ndvColumns).distinct
          .filterNot(m.droppedNames.contains)
        cols.flatMap { c =>
          val v = (minMax(c), ndv(c))
          if (v._1.isEmpty && v._2.isEmpty) None else Some(c -> v)
        }.toMap
    }

  /** METADATA-ONLY approximate quantiles of a [[quantileColumns]]
    * column (X218 — per-dir KLL sketches on the X214/X216 substrate):
    * every commit records a per-dir Apache DataSketches KLL quantile
    * sketch (k = [[graft.expr.KllSketchAgg.DefaultK]] — ~1.65%
    * normalized rank error at 99% confidence, ~3 KB per dir·column)
    * in the same manifest rename as the dir; the answer is one
    * driver-side merge over the live dirs' sketch images (KLL merges
    * losslessly in error bound, so the generation structure only
    * costs the bound, never correctness of the bound) — no data file
    * opened. This is the percentile-dashboard / histogram-boundary /
    * range-partitioner answer a 100 TB table wants in milliseconds;
    * exact quantiles still cost the X113 distributed rank walk.
    * Honesty, stated twice: (1) KLL compaction is RANDOMIZED — two
    * commits of identical data may record different (all valid)
    * images, so this tier's contract is an error BAND, not a value;
    * (2) sketches live over the DOUBLE promotion of the column.
    * Merge order is fixed (sorted images) so the answer is
    * deterministic GIVEN a manifest. None when any live non-empty
    * dir lacks a recorded sketch (legacy tables, undeclared or
    * non-numeric column) — scan fallback, the metadata tier's shared
    * conservative degrade; an all-null column merges to an empty
    * union → None (no data, no order statistic). */
  def metadataApproxQuantiles(
      name: String,
      column: String,
      probs: Seq[Double]): Option[Seq[Double]] = {
    require(probs.forall(p => p >= 0.0 && p <= 1.0),
      s"ranks must be in [0, 1]: ${probs.mkString(", ")}")
    latestManifest(name).flatMap(qskMerged(_, column))
      .map(u => probs.map(u.getQuantile))
  }

  /** The live dirs' recorded KLL images of `column`, merged (fixed
    * sorted order — deterministic GIVEN the manifest). None when any
    * live non-empty dir lacks an image (the metadata tier's shared
    * gate) or every image is empty (all-null column). */
  private def qskMerged(m: Manifest,
      column: String): Option[org.apache.datasketches.kll.KllDoublesSketch] = {
    if (m.hasTombs) return None // sketches describe physical rows → scan
    if (m.droppedNames.contains(column)) return None // retired name (X259)
    val live = (m.buckets.values ++ m.logs).toSeq
    val per: Seq[Option[String]] = live.flatMap { d =>
      m.qsk.get(d).flatMap(_.find(_._1 == column)) match {
        case Some((_, b64)) => Seq(Some(b64))
        case None =>
          if (m.rows.get(d).contains(0L)) Nil else Seq(None)
      }
    }
    if (per.exists(_.isEmpty)) None
    else graft.expr.KllSketchAgg.mergeImages(
      per.flatten.sorted.map(java.util.Base64.getDecoder.decode))
  }

  /** METADATA-ONLY approximate count of rows with `lo <= col <= hi`
    * (the X218 sketches answering the OTHER planner question —
    * range-predicate SELECTIVITY): merged-sketch
    * `n * (rank≤(hi) - rank<(lo))`, where n is the exact non-null
    * update count the sketch carries and the two ranks share the
    * recorded ~1.65% normalized-rank-error band. This is the
    * join-sizing / shuffle-partition-count / skew-probe estimate a
    * 100 TB planner wants before committing to a plan; the exact
    * count still scans (or, for whole-dir-contained ranges, prunes
    * via the exact min/max stats first). Same gates as
    * [[metadataApproxQuantiles]]: any live non-empty dir without a
    * sketch → None; an all-null column has no in-range rows → 0.
    * NOTE the estimate counts NON-NULL rows only (nulls never enter
    * an order statistic — same as SQL `BETWEEN` semantics). */
  def metadataRangeCount(
      name: String,
      column: String,
      lo: Double,
      hi: Double): Option[Long] = {
    require(lo <= hi, s"empty range: lo=$lo > hi=$hi")
    latestManifest(name).flatMap { m =>
      // gate BEFORE the merged-sketch branch: qskMerged's None means
      // "all-null column" (→ 0) there, which a tombstoned snapshot
      // must not masquerade as
      if (m.hasTombs) return None
      val live = (m.buckets.values ++ m.logs).toSeq
      val missing = live.exists { d =>
        m.qsk.get(d).flatMap(_.find(_._1 == column)).isEmpty &&
          !m.rows.get(d).contains(0L)
      }
      if (missing) None
      else qskMerged(m, column) match {
        case None => Some(0L) // no non-null values anywhere
        case Some(u) =>
          import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
          val below = u.getRank(lo, QuantileSearchCriteria.EXCLUSIVE)
          val upTo = u.getRank(hi, QuantileSearchCriteria.INCLUSIVE)
          Some(math.round(u.getN * math.max(0.0, upTo - below)))
      }
    }
  }

  /** METADATA-ONLY distribution drift between two tables' numeric
    * columns (X222 — the monitoring tier's last answer): POPULATION
    * STABILITY INDEX over `buckets` equal-probability bins whose
    * boundaries come from the REFERENCE side's merged KLL sketch —
    * PSI = Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ), the standard drift score (common
    * operating points: < 0.1 stable, 0.1–0.25 investigate, > 0.25
    * shifted). Served from two manifests, no file opened — the
    * "did this week's corpus shift under the model?" answer at 100 TB
    * in milliseconds. Bin probabilities are rank differences on each
    * side's own sketch (clamped at 1e-6 — an empty bin is evidence,
    * not a division by zero) and inherit the recorded rank-error
    * band; the score is an ESTIMATE, specs assert separation (same
    * distribution ≈ 0, planted shift large), never a pinned value.
    * Gates as [[metadataApproxQuantiles]]; all-null on either side →
    * None (no distribution, no drift). */
  def metadataDrift(
      reference: String,
      current: String,
      column: String,
      buckets: Int = 10): Option[Double] =
    for {
      ma <- latestManifest(reference)
      mb <- latestManifest(current)
      d <- driftOf(ma, mb, column, buckets)
    } yield d

  /** [[metadataDrift]] between two RETAINED VERSIONS of one table —
    * the self-monitoring form (this snapshot vs last week's). */
  def metadataDriftVersions(
      name: String,
      referenceVersion: Int,
      currentVersion: Int,
      column: String,
      buckets: Int = 10): Option[Double] =
    for {
      ma <- manifestAt(name, referenceVersion)
      mb <- manifestAt(name, currentVersion)
      d <- driftOf(ma, mb, column, buckets)
    } yield d

  private def driftOf(ma: Manifest, mb: Manifest, column: String,
      buckets: Int): Option[Double] =
    for {
      sa <- qskMerged(ma, column)
      sb <- qskMerged(mb, column)
    } yield graft.expr.KllSketchAgg.psi(sa, sb, buckets)

  /** Dirs surviving an any-of membership probe: each dir's Bloom is
    * deserialized ONCE and probed with every hash (never per
    * (hash, dir) pair). Any unhashable probe value → keep all. */
  private def keptForAny(name: String, m: Manifest, all: Seq[String],
      column: String, values: Seq[Any]): Seq[String] = {
    if (values.isEmpty) return Nil
    val dtOpt = columnTypeOf(name, m, column)
    val hashes = dtOpt.map(dt => values.map(typedKeyHashes(_, dt)))
      .getOrElse(Seq(None))
    if (hashes.exists(_.isEmpty)) all
    else {
      val hs = hashes.flatten.flatten
      all.filter(d => dirBloom(m.keys.get(d), column)
        .forall(bf => hs.exists(bf.mightContainLong)))
    }
  }

  override def read(name: String): Option[DataFrame] =
    latestManifest(name).flatMap(readManifest(name, _))

  /** Read generation dirs of snapshot `m` with OUTSTANDING KEY
    * TOMBSTONES applied (merge-on-read deletes, X234 — the
    * deletion-vector discipline Delta/Iceberg grew for exactly the
    * single-key-delete-on-a-100 TB-table case): dirs without
    * tombstones read in ONE multi-dir scan exactly as before (zero
    * cost on the common path); each tombstoned dir anti-joins its
    * OWN sidecar key set (broadcast — tombstones are delete batches,
    * driver-small by the [[deleteLazy]] contract). Per-dir — never a
    * union across dirs — because a key deleted from generation A and
    * later re-upserted lands in a NEW dir carrying no tombstone; a
    * union anti-join would kill the resurrected row. A dir whose
    * footer schema LACKS a sidecar's key column skips that anti-join
    * — exact, because an absent column reads as NULL and an
    * equality/IN predicate never matches NULL — so a conservative
    * all-bucket SQL DELETE cannot strand generations that predate a
    * later-added column. Tombstones COMPOSE with numeric
    * type-widening: when the plain assembly hits a cross-generation
    * type conflict, every dir folds through [[widenedFrames]]'s
    * promotion lattice and each tombstoned dir anti-joins its own
    * sidecars on the WIDENED frame (the cast commutes with key
    * equality — sidecar keys coerce in the join), so a widening
    * upsert over a tombstoned table reads instead of refusing
    * (docs/SCALE.md §8 item 14). */
  /** Dir read + tombstone anti-joins + dropped-column suppression —
    * every batch read path flows through here, so DROP COLUMN (X259)
    * is one name-drop at the end: generations that still physically
    * carry a dropped column serve without it, and any REWRITE that
    * reads through here (upsert merge, applyDeletes, compactLogs,
    * clustered rewrites) sheds the column physically for free. */
  private def readDataDirs(name: String, m: Manifest, rels: Seq[String]): DataFrame =
    dropSuppressed(m, readDataDirsRaw(name, m, rels))

  /** The X259 name suppression: serve a frame without the manifest's
    * dropped columns. Applied by [[readDataDirs]] (every batch read)
    * AND by the read paths that go to raw dirs directly — CDC
    * capture ([[appendsSince]]) and the [[compactLogs]] fold — so no
    * consumer ever sees a retired name, and every rewrite sheds the
    * bytes. */
  private def dropSuppressed(m: Manifest, df: DataFrame): DataFrame = {
    val gone = m.droppedNames.filter(df.columns.contains)
    if (gone.isEmpty) df else df.drop(gone: _*)
  }

  private def readDataDirsRaw(name: String, m: Manifest, rels: Seq[String]): DataFrame = {
    val tombed = rels.filter(m.liveTombs.contains)
    if (tombed.isEmpty) return readDirs(dirsOf(name, m, rels))
    val clean = rels.filterNot(m.liveTombs.contains)
    // sidecars group by their key column: one anti-join per column
    // (SQL DELETEs may target different columns), each over the union
    // of that column's sidecar dirs
    def antiJoined(d: String, df: DataFrame, raw: StructType): DataFrame =
      m.liveTombs(d).groupBy(_._1).toSeq.sortBy(_._1).foldLeft(df) {
        case (acc, (k, ts)) =>
          if (!raw.fieldNames.contains(k)) acc // predates column: exact skip
          else {
            val doomed = readDirs(dirsOf(name, m, ts.map(_._2)))
              .select(k).distinct()
            acc.join(org.apache.spark.sql.functions.broadcast(doomed),
              Seq(k), "left_anti")
          }
      }
    def plain(): DataFrame = {
      val parts =
        (if (clean.nonEmpty) Seq(readDirs(dirsOf(name, m, clean))) else Nil) ++
          tombed.map { d =>
            val df = readDirs(dirsOf(name, m, Seq(d)))
            antiJoined(d, df, df.schema)
          }
      parts.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    }
    try plain()
    catch {
      case scala.util.control.NonFatal(e) =>
        val byRel = rels.map(r => r -> resolveDir(name, r))
        val widened = widenedFrames(byRel.map(_._2), e)
          .zip(byRel).map { case ((_, raw, df), (rel, _)) => rel -> (raw, df) }
          .toMap
        val parts = clean.map(r => widened(r)._2) ++ tombed.map { d =>
          val (raw, df) = widened(d)
          antiJoined(d, df, raw)
        }
        parts.reduce(_ unionByName _)
    }
  }

  private def readManifest(name: String, m: Manifest): Option[DataFrame] = {
    val all = (m.buckets.values ++ m.logs).toSeq
    // generations may differ in schema after a widening upsert —
    // mergeSchema unions the footers (old-generation rows read null
    // in later-added columns)
    if (all.isEmpty) None
    else Some(readDataDirs(name, m, all))
  }

  /** Commit HISTORY as a queryable frame (the `DESCRIBE HISTORY`
    * answer): one row per retained snapshot — version, the streaming
    * batch mark, bucket/log generation counts, and the row count
    * served from the manifest's recorded per-dir counts (X214; null
    * for legacy manifests with unstatted live dirs — the shared
    * honest degrade, never a wrong number). Metadata-only: the audit
    * of a 100 TB table's whole lifetime costs its manifest files.
    * None when the table doesn't exist. */
  def history(name: String): Option[DataFrame] = {
    val vs = snapshots(name)
    if (vs.isEmpty) return None
    val rows = vs.flatMap(manifestAt(name, _)).map { m =>
      val live = (m.buckets.values ++ m.logs).toSeq
      // outstanding tombstones → recorded physical counts over-count
      // the logical snapshot: null, the shared honest degrade
      val n: Option[Long] =
        if (m.hasTombs || !live.forall(m.rows.contains)) None
        else Some(live.map(m.rows).sum)
      org.apache.spark.sql.Row(m.version, m.lastBatch.map(Long.box).orNull,
        m.buckets.size, m.logs.size, n.map(Long.box).orNull)
    }
    import org.apache.spark.sql.types._
    Some(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("last_batch", LongType),
        StructField("n_buckets", IntegerType, nullable = false),
        StructField("n_logs", IntegerType, nullable = false),
        StructField("row_count", LongType)))))
  }

  /** The current snapshot's MANIFEST ENTRIES as a queryable frame
    * (the `t$files` metadata table): one row per live generation dir —
    * kind (bucket/log), bucket id, recorded row count, and any
    * outstanding tombstone sidecars attached to it. Metadata-only:
    * auditing WHAT a 100 TB table physically is costs its manifest.
    * None when the table doesn't exist. */
  def manifestEntries(name: String): Option[DataFrame] =
    latestManifest(name).map { m =>
      val tombsOf = m.liveTombs
      val rows =
        m.buckets.toSeq.sortBy(_._1).map { case (b, d) =>
          org.apache.spark.sql.Row(d, "bucket", Long.box(b),
            m.rows.get(d).map(Long.box).orNull,
            tombsOf.getOrElse(d, Nil).map { case (k, rel) => s"$k:$rel" }
              .mkString(",") match { case "" => null; case s => s },
            m.bytes.get(d).map(Long.box).orNull)
        } ++
          m.logs.map(d => org.apache.spark.sql.Row(d, "log", null,
            m.rows.get(d).map(Long.box).orNull, null,
            m.bytes.get(d).map(Long.box).orNull))
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("dir", StringType, nullable = false),
          StructField("kind", StringType, nullable = false),
          StructField("bucket", LongType),
          StructField("row_count", LongType),
          StructField("tombstones", StringType),
          StructField("bytes", LongType))))
    }

  /** Committed snapshot versions still on disk, ascending. What's
    * listable is what [[vacuum]]'s retention window kept — retention
    * IS the time-travel horizon. */
  def snapshots(name: String): Seq[Int] = {
    val dir = tableDir(name)
    val f = fs(dir)
    if (!f.exists(dir)) return Nil
    f.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
      case ManifestName(n) => Some(n.toInt)
      case _ => None
    }).sorted
  }

  /** TIMESTAMP → version resolution for time travel: the NEWEST
    * retained snapshot committed at-or-before `millis` (epoch
    * milliseconds), by each manifest's own commit stamp under a
    * monotone envelope (versions are ordered truth; a wall clock that
    * stepped backwards between commits never reorders them). None when
    * every retained stamp is later than `millis` — asking for a time
    * before the first (retained) commit is a caller error to surface
    * loudly, not a silent latest-version fallback; [[vacuum]]'s
    * retention window is the travel horizon here exactly as it is for
    * version travel. Legacy manifests without a stamp cannot be
    * resolved by time and are skipped (version travel still serves
    * them). */
  def versionAt(name: String, millis: Long): Option[Int] = {
    var env = Long.MinValue
    snapshots(name).flatMap(manifestAt(name, _)).flatMap { m =>
      m.commitMillis.map { ts => env = math.max(env, ts); (m.version, env) }
    }.takeWhile(_._2 <= millis).lastOption.map(_._1)
  }

  /** TIME-TRAVEL read: the table exactly as committed at `version`.
    * Retained snapshots are useless write-only weight otherwise — a
    * user paying [[vacuum]]'s retention cost gets to read, diff
    * (`readAt(v2).exceptAll(readAt(v1))`), and audit them. None when
    * the version was never committed or vacuum already reclaimed its
    * manifest; a version inside the retention window always resolves
    * (vacuum keeps every dir its retained manifests reference). */
  def readAt(name: String, version: Int): Option[DataFrame] =
    manifestAt(name, version).flatMap(readManifest(name, _))

  /** Roll the table back (or forward) to `version` — AS A NEW COMMIT,
    * never in place: the new manifest re-references the old version's
    * generation dirs byte-for-byte (no data copied, same trick as
    * untouched buckets in [[upsert]]), so the restore is itself
    * O(manifest), atomic, and revertible by another restore. The
    * streaming batch high-water mark is carried from the CURRENT
    * snapshot, not the restored one — epochs are monotonic, and
    * resurrecting an old mark would let a crash-replayed batch
    * re-apply after the restore. */
  def restore(name: String, version: Int): Unit = {
    val target = manifestAt(name, version).getOrElse(
      throw new java.util.NoSuchElementException(
        s"$name has no snapshot v$version (vacuumed, or never committed)"))
    val cur = latestManifest(name).get // target existing ⇒ table exists
    commit(name, Manifest(cur.version + 1, target.buckets, target.logs,
      cur.lastBatch, target.stats, target.keys, target.statsVersion,
      target.rows, target.ndv, target.qsk, fanout = target.fanout,
      tombs =
      // the restored version's OUTSTANDING tombstones restore with it —
      // dropping them would silently resurrect merge-on-read deletes
      target.tombs,
      bytes = target.bytes,
      // the restored version's dropped-column marker restores WITH it
      // (explicit, even when empty): rolling back past a DROP COLUMN
      // resurrects the column — the marker is snapshot state like
      // everything else here
      dropped = target.dropped.orElse(Some(Nil))))
  }

  /** ZERO-COPY table clone (X221 — Delta's SHALLOW CLONE / Iceberg's
    * snapshot-ref discipline): `dst` is born as ONE manifest whose
    * dir entries REFERENCE `src`'s generation dirs (`@src/<rel>` —
    * store-root-relative, resolved by [[resolveDir]]), carrying the
    * source's stats/Blooms/rows/NDV/quantile sketches verbatim —
    * they describe the dirs, and the dirs are the same bytes. O(one
    * manifest write) at ANY table size: the 100 TB fork (a dev copy
    * to test a migration, a frozen training-set snapshot with its
    * own retention, an experiment branch) costs milliseconds and
    * zero storage until the copies DIVERGE — every write to either
    * side is copy-on-write by construction (all commit families
    * rewrite touched buckets into the writing table's OWN dirs and
    * drop the refs; untouched buckets keep referencing the shared
    * bytes). Pass `version` to clone a historic snapshot (time-travel
    * fork — the retained-manifest horizon applies).
    *
    * The lifecycle contract that makes sharing safe: [[vacuum]] on
    * the SOURCE keeps any dir referenced by a clone's on-disk
    * manifests (the cross-table keep-scan), and a clone's own vacuum
    * only ever lists its own data dir — neither side can reclaim the
    * other's bytes. A clone-of-a-clone re-points at the ORIGINAL
    * owner, so reference chains never deepen and the keep-scan's
    * `@owner/` match finds every borrower. The streaming batch mark
    * carries over: the clone CONTAINS those epochs, so re-draining
    * the same source into it stays exactly-once. GDPR discipline,
    * stated loudly: a keyed [[delete]] on one side does NOT touch the
    * other — right-to-be-forgotten must be applied to every clone
    * (and the shared bytes are only physically reclaimed once no
    * manifest anywhere references them). */
  def cloneTable(src: String, dst: String, version: Option[Int] = None): Unit = {
    require(src != dst, s"cannot clone '$src' onto itself")
    require(latestManifest(dst).isEmpty, s"clone target '$dst' already exists")
    val m = version match {
      case Some(v) => manifestAt(src, v).getOrElse(
        throw new java.util.NoSuchElementException(
          s"$src has no snapshot v$v (vacuumed, or never committed)"))
      case None => latestManifest(src).getOrElse(
        throw new java.util.NoSuchElementException(s"no such table: $src"))
    }
    def ref(d: String) = if (d.startsWith("@")) d else s"@$src/$d"
    // the clone inherits the source's recorded SHAPE (props sidecar):
    // it borrows the source's bucket layout byte-for-byte, so serving
    // it under a different key/bucket shape would be silently wrong
    val srcProps = tableProps(src)
    if (srcProps.nonEmpty) writeTableProps(dst, srcProps)
    commit(dst, Manifest(0,
      m.buckets.map { case (b, d) => b -> ref(d) },
      m.logs.map(ref),
      m.lastBatch,
      m.liveStats.map { case (d, s) => ref(d) -> s },
      m.liveKeys.map { case (d, s) => ref(d) -> s },
      m.statsVersion,
      m.liveRows.map { case (d, n) => ref(d) -> n },
      m.liveNdv.map { case (d, s) => ref(d) -> s },
      m.liveQsk.map { case (d, s) => ref(d) -> s },
      // outstanding tombstones clone BY REFERENCE like the data dirs
      // they mask — both sides of the (dir, sidecar) pair re-point at
      // the owner, and vacuum's borrow scan protects both
      m.liveTombs.map { case (d, ts) =>
        ref(d) -> ts.map { case (k, rel) => (k, ref(rel)) } },
      fanout = m.fanout,
      bytes = m.liveBytes.map { case (d, n) => ref(d) -> n },
      // the clone shows the source's LOGICAL schema: its dropped-
      // column marker copies over (the borrowed dirs still carry the
      // bytes; the name suppression is what makes them one table)
      dropped = m.dropped.orElse(Some(Nil))))
  }

  /** Keyed diff of two retained snapshots (`added`/`removed`/
    * `changed` + changed-column list per key, [[graft.ops.Diff.keyed]]
    * semantics) with MANIFEST-LEVEL pruning: a bucket whose dir
    * reference is identical in both manifests is byte-identical data
    * — every key in it is provably unchanged WITHOUT reading a row,
    * so both scans load only the touched buckets. Hash bucketing is
    * stable across versions, so a key's old and new rows land in the
    * same bucket id and pruning never splits a pair. Diff cost scales
    * with the touched fraction of the table, not its size — on a
    * 100 TB table where a run upserts 0.1% of keys, the diff reads
    * ~0.1% (times bucket granularity) of two versions, not 200 TB.
    *
    * Pruning applies when `includeUnchanged` is false (the audit
    * shape); asking for unchanged rows requires their keys, hence a
    * full read of both versions. A version that predates a column
    * (widening upsert) reads null there, so such rows report
    * `changed` on the new column — the evolution audit a reviewer
    * wants. Bucketed upsert tables only: log generations carry no key
    * contract (use [[appendsSince]]). None when either version is
    * gone (never committed, or vacuumed). */
  def diffVersions(
      name: String,
      v1: Int,
      v2: Int,
      key: String,
      includeUnchanged: Boolean = false): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{col, lit}
    for {
      m1 <- manifestAt(name, v1)
      m2 <- manifestAt(name, v2)
    } yield {
      require(m1.logs.isEmpty && m2.logs.isEmpty,
        s"$name has append-log generations; keyed diff targets bucketed " +
          "upsert tables — use appendsSince for log tables")
      // a bucket is unchanged only when BOTH its dir ref and its
      // outstanding tombstones match — same bytes under different
      // merge-on-read deletes is different content
      def sameBucket(b: Long): Boolean =
        m1.buckets.get(b) == m2.buckets.get(b) &&
          m1.buckets.get(b).flatMap(m1.liveTombs.get) ==
            m2.buckets.get(b).flatMap(m2.liveTombs.get)
      val touched =
        if (includeUnchanged) (m1.buckets.keySet ++ m2.buckets.keySet).toSeq.sorted
        else (m1.buckets.keySet ++ m2.buckets.keySet).toSeq
          .filterNot(sameBucket).sorted
      def side(m: Manifest): Option[DataFrame] = {
        val rels = touched.flatMap(m.buckets.get(_))
        if (rels.isEmpty) None else Some(readDataDirs(name, m, rels))
      }
      (side(m1), side(m2)) match {
        case (None, None) =>
          // nothing touched on either side: an empty diff in the
          // canonical (key, change, changed_cols) shape
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(
              readManifest(name, m2).orElse(readManifest(name, m1))
                .map(_.schema.fields.filter(_.name == key)).getOrElse(Array.empty).toSeq ++
                Seq(org.apache.spark.sql.types.StructField("change",
                    org.apache.spark.sql.types.StringType),
                  org.apache.spark.sql.types.StructField("changed_cols",
                    org.apache.spark.sql.types.StringType))))
        case (o, n) =>
          val base = o.orElse(n).get
          val old = o.getOrElse(base.limit(0))
          val neu = n.getOrElse(base.limit(0))
          // align columns across a widening upsert: the missing side
          // reads null, typed from the side that has the column
          val allCols = old.columns ++ neu.columns.filterNot(old.columns.contains)
          def aligned(df: DataFrame): DataFrame = {
            val have = df.columns.toSet
            val donor = if (df eq old) neu else old
            df.select(allCols.map { c =>
              if (have(c)) col(c)
              else lit(null).cast(donor.schema(c).dataType).as(c)
            }.toIndexedSeq: _*)
          }
          graft.ops.Diff.keyed(aligned(old), aligned(neu), Seq(key),
            includeUnchanged)
      }
    }
  }

  /** [[diffVersions]] WITH PAYLOAD — the CDC read an incremental
    * downstream consumer actually applies: one row per key whose
    * presence or payload differs between `since` and `upto` (default:
    * latest), carrying `change` ∈ added|changed|removed plus the
    * NEW-side payload columns (null for removed keys, whose only
    * actionable content is the key itself). Cost scales with the
    * TOUCHED fraction, same as [[diffVersions]]: the label pass
    * prunes to buckets whose dir refs differ, and the payload fetch
    * reads only the new side of those same buckets — never the whole
    * table. None when either version is gone (never committed, or
    * vacuumed — the consumer's signal to fall back to a full
    * rebuild). Bucketed upsert tables only ([[appendsSince]] is the
    * log-table form, where the delta needs no diff at all). */
  def changesSince(
      name: String,
      since: Int,
      key: String,
      upto: Option[Int] = None): Option[DataFrame] = {
    import org.apache.spark.sql.functions.col
    for {
      end <- upto.orElse(snapshots(name).lastOption)
      labels <- diffVersions(name, since, end, key)
      m1 <- manifestAt(name, since)
      m2 <- manifestAt(name, end)
    } yield {
      // tombstone-aware touch test, same rule as diffVersions: a
      // bucket with the same dir but different merge-on-read deletes
      // HAS changed
      val touched = (m1.buckets.keySet ++ m2.buckets.keySet).toSeq
        .filter(b => m1.buckets.get(b) != m2.buckets.get(b) ||
          m1.buckets.get(b).flatMap(m1.liveTombs.get) !=
            m2.buckets.get(b).flatMap(m2.liveTombs.get))
      val newRels = touched.flatMap(m2.buckets.get(_))
      val neu = if (newRels.isEmpty) None
        else Some(readDataDirs(name, m2, newRels))
      // payload schema donor for the all-removed edge (no new-side
      // dirs in any touched bucket): the table's own schema at either
      // end — planning-time footer reads only, never a data scan
      val donor = neu
        .orElse(readManifest(name, m2)).orElse(readManifest(name, m1))
      val lab = labels.select(col(key), col("change"))
      donor match {
        case None => lab // both versions empty ⇒ labels is empty too
        case Some(d) =>
          // reserved-name guard already ran inside diffVersions: the
          // payload cannot carry change/changed_cols columns
          lab.join(neu.getOrElse(d.limit(0)), Seq(key), "left")
      }
    }
  }

  /** Is the dir's recorded range provably CONTAINED in [lower,
    * upper]? The drop-side dual of [[survives]]: containment must be
    * certain, so missing/unparseable stats answer NO, and legacy
    * float-string widening makes the test strictly harder (a widened
    * range inside the bounds implies the true range is). */
  private def engulfedBy(
      stats: Option[Seq[(String, String, String)]],
      column: String,
      lower: BigDecimal,
      upper: BigDecimal,
      legacyStats: Boolean): Boolean =
    stats.flatMap(_.find(_._1 == column)) match {
      case None => false
      case Some((_, mn, mx)) =>
        (scala.util.Try(BigDecimal(mn)), scala.util.Try(BigDecimal(mx))) match {
          case (scala.util.Success(lo0), scala.util.Success(hi0)) =>
            val eps = SnapshotBucketedStore.LegacyStatsEps
            val lo = if (legacyStats) lo0 - lo0.abs * eps else lo0
            val hi = if (legacyStats) hi0 + hi0.abs * eps else hi0
            lo >= lower && hi <= upper
          case _ => false
        }
    }

  /** Range DELETE with manifest-level classification — the TTL /
    * retention sweep (`DELETE WHERE column BETWEEN lower AND upper`,
    * null rows never match, standard SQL semantics). Every generation
    * dir classifies by its recorded min/max:
    *
    *   - DISJOINT from the range: untouched — not even listed.
    *   - CONTAINED in the range: candidate for a METADATA-ONLY drop —
    *     the dir reference leaves the manifest, no data moves. Since
    *     min/max ignore nulls, containment alone cannot prove a dir
    *     holds no null rows (which must survive); a one-column probe
    *     over the contained dirs checks, and a dir carrying nulls
    *     demotes to the rewrite path. On the 100 TB time-ordered
    *     table this sweep exists for, expired generations drop for
    *     the cost of reading ONE column of already-doomed dirs — or,
    *     with a non-nullable column, effectively the manifest write.
    *   - STRADDLING (or stats missing/unparseable): rewritten without
    *     the matching rows (nulls kept via the three-valued-logic
    *     coalesce), staged as new generation dirs.
    *
    * One manifest commit applies drops and rewrites atomically; a
    * crash mid-stage leaves the previous snapshot serving and only
    * orphan dirs behind (the upsert discipline). Superseded dirs stay
    * time-travel-readable until [[vacuum]]. Returns
    * (dropped, rewritten, untouched) dir counts — the X75-style
    * metric surface; None when the table doesn't exist. */
  def deleteRange(
      name: String,
      column: String,
      lower: Any,
      upper: Any): Option[(Int, Int, Int)] = {
    import org.apache.spark.sql.functions.{coalesce, col, count, input_file_name, lit, not, regexp_extract}
    latestManifest(name).map { m =>
      require(!m.droppedNames.contains(column),
        s"$name: '$column' was dropped — a predicate on a retired name " +
          "would silently target hidden values (X259); rebuild() first")
      val legacy = m.statsVersion < SnapshotBucketedStore.CurrentStatsVersion
      val lo = boundDecimal(lower); val hi = boundDecimal(upper)
      val entries: Seq[(Option[Long], String)] =
        m.buckets.toSeq.sortBy(_._1).map { case (b, d) => (Option(b), d) } ++
          m.logs.map(d => (None: Option[Long], d))
      def cls(d: String): Int =
        if (!survives(m.stats.get(d), column, lo, hi, legacy)) 0
        else if (engulfedBy(m.stats.get(d), column, lo, hi, legacy)) 1
        else 2
      val byCls = entries.groupBy(e => cls(e._2))
      val disjoint = byCls.getOrElse(0, Nil)
      val contained = byCls.getOrElse(1, Nil)
      val straddle = byCls.getOrElse(2, Nil)
      // null probe: count null `column` rows per contained dir (one
      // narrow scan); only a provably null-free dir may drop
      val nullsByDir: Map[String, Long] =
        if (contained.isEmpty) Map.empty
        else readDirs(dirsOf(name, m, contained.map(_._2)))
          .select(col(column).as("graft_c_"),
            regexp_extract(input_file_name(), "(data/[^/]+)/[^/]+$", 1)
              .as("graft_d_"))
          .groupBy(col("graft_d_"))
          .agg((count(lit(1)) - count(col("graft_c_"))).as("graft_n_"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // a contained dir absent from the probe result produced no rows
      // at all (empty generation) — dropping it is trivially safe
      val (dropped, demoted) = contained.partition(e =>
        nullsByDir.getOrElse(e._2, 0L) == 0L)
      val rewrites = straddle ++ demoted
      val v = m.version + 1
      val pred = col(column) >= lit(lower) && col(column) <= lit(upper)
      var bucketMap = m.buckets
      var logList = m.logs
      var statsMap = m.stats
      var keysMap = m.keys
      var rowsMap = m.rows
      var ndvMap = m.ndv
      var qskMap = m.qsk
      dropped.foreach { case (ob, d) =>
        ob match {
          case Some(b) => bucketMap -= b
          case None => logList = logList.filterNot(_ == d)
        }
        statsMap -= d; keysMap -= d; rowsMap -= d; ndvMap -= d; qskMap -= d
      }
      rewrites.zipWithIndex.foreach { case ((ob, d), i) =>
        // tombstone-aware read: the rewrite applies outstanding
        // merge-on-read deletes too (free physical erasure)
        val kept = readDataDirs(name, m, Seq(d))
          .filter(not(coalesce(pred, lit(false))))
        val rel = ob match {
          case Some(b) => s"data/b$b-g$v"
          case None => s"data/del$i-g$v"
        }
        writeDir(kept, new Path(tableDir(name), rel).toString)
        val dm = metaForDir(name, rel)
        ob match {
          case Some(b) => bucketMap += b -> rel
          case None => logList = logList.map(x => if (x == d) rel else x)
        }
        statsMap -= d; keysMap -= d; rowsMap -= d; ndvMap -= d; qskMap -= d
        statsMap = statsMap ++ statsPart(dm)
        keysMap = keysMap ++ keysPart(dm)
        rowsMap = rowsMap ++ rowsPart(dm)
        ndvMap = ndvMap ++ ndvPart(dm)
        qskMap = qskMap ++ qskPart(dm)
      }
      commit(name, Manifest(v, bucketMap, logList, m.lastBatch,
        statsMap, keysMap, carriedStatsVersion(Some(m)), rowsMap, ndvMap,
        qskMap, m.tombs, // liveTombs drops entries of rewritten/dropped dirs
        fanout = m.fanout))
      (dropped.size, rewrites.size, disjoint.size)
    }
  }

  /** Change-data capture for append-log tables: exactly the rows
    * appended after version `since`, as of version `upto` (default:
    * latest). Zero compute — appends only ever ADD log dirs, so the
    * delta IS the dir-set difference of the two manifests; nothing is
    * scanned but the new generations themselves. The contract breaks
    * if a [[compactLogs]] rewrote history inside the range (old dirs
    * vanish into a merged generation, so "new dirs" would double-count
    * compacted rows) — that case refuses loudly rather than
    * mis-reporting; capture deltas across compaction-free ranges, the
    * same horizon rule Delta-style CDC imposes across VACUUM. */
  def appendsSince(
      name: String,
      since: Int,
      upto: Option[Int] = None): Option[DataFrame] =
    for {
      m1 <- manifestAt(name, since)
      m2 <- upto.map(manifestAt(name, _)).getOrElse(latestManifest(name))
    } yield {
      require(m1.buckets.isEmpty && m2.buckets.isEmpty,
        s"$name has bucketed upsert generations; appendsSince targets " +
          "append-log tables — use diffVersions for keyed tables")
      require(m2.version >= m1.version,
        s"backwards capture range: v$since → v${m2.version}")
      val rewritten = m1.logs.filterNot(m2.logs.contains)
      require(rewritten.isEmpty,
        s"$name log history was compacted between v$since and " +
          s"v${m2.version} (${rewritten.mkString(",")} superseded); " +
          "dir-level capture is only sound across compaction-free ranges")
      val fresh = m2.logs.filterNot(m1.logs.contains)
      // suppression rides the CAPTURE-END snapshot's marker: a dir
      // appended before a drop must not leak the retired column into
      // the change feed (consumers see the table's current schema)
      if (fresh.isEmpty)
        readManifest(name, m2).map(_.limit(0)).getOrElse(
          dropSuppressed(m2, readDirs(dirsOf(name, m1, m1.logs)).limit(0)))
      else dropSuppressed(m2, readDirs(dirsOf(name, m2, fresh)))
    }

  /** The generation format this store reads/writes — the SQL
    * streaming source (X252) is a direct parquet-file reader and must
    * refuse other formats loudly instead of mis-decoding. */
  def storageFormat: String = fmt

  /** DIR-LEVEL twin of [[appendsSince]] for the DSv2 streaming source
    * (X252): the RELATIVE log dirs committed in (since, upto] — same
    * append-log-only and compaction-refusal contract (rewritten
    * history would double-count), but returning the dirs themselves
    * so a file-granular reader can plan partitions without a
    * driver-side DataFrame. `since < 0` means "nothing consumed":
    * the whole log at `upto` (the initial load). */
  def appendDirsSince(name: String, since: Int, upto: Int): Seq[String] = {
    val m2 = manifestAt(name, upto).getOrElse(
      throw new java.util.NoSuchElementException(
        s"graft table '$name' lost v$upto (vacuumed? retention must " +
          "cover the trigger interval)"))
    require(m2.buckets.isEmpty,
      s"$name has bucketed upsert generations; the streaming source " +
        "tails append-log tables")
    if (since < 0) return m2.logs
    val m1 = manifestAt(name, since).getOrElse(
      throw new java.util.NoSuchElementException(
        s"graft table '$name' lost v$since needed by the stream " +
          "(vacuum retention must cover the trigger interval)"))
    require(m2.version >= m1.version,
      s"backwards capture range: v$since → v${m2.version}")
    val rewritten = m1.logs.filterNot(m2.logs.contains)
    require(rewritten.isEmpty,
      s"$name log history was compacted between v$since and v$upto " +
        s"(${rewritten.mkString(",")} superseded); dir-level capture " +
        "is only sound across compaction-free ranges")
    m2.logs.filterNot(m1.logs.contains)
  }

  /** The DATA FILES of the given relative dirs, resolved to full
    * paths — partition planning for the file-granular streaming
    * reader. Hidden/metadata files excluded, same filter as every
    * other dir walk here. */
  def dataFilePaths(name: String, dirs: Seq[String]): Seq[String] =
    dirs.flatMap { d =>
      val p = new Path(resolveDir(name, d))
      val f = fs(p)
      // a vanished dir means vacuum reclaimed a generation the stream
      // still needs — refuse LOUDLY (the appendDirsSince discipline one
      // step earlier); silently emitting fewer rows would corrupt the
      // consumer's exactly-once ledger without a trace
      if (!f.exists(p))
        throw new java.util.NoSuchElementException(
          s"graft table '$name' lost generation dir '$d' needed by the " +
            "stream (vacuum retention must cover the trigger interval)")
      f.listStatus(p).toSeq.filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith(".") && !n.startsWith("_")
      }.map(_.getPath.toString)
    }

  /** The streaming/refresh high-water mark: the highest batch id an
    * [[appendIfNew]]/[[replaceWithBatch]] committed for this table.
    * Public because exactly-once CONSUMERS need it too — an
    * incremental refresher ([[IncrementalAgg]]) stores its source
    * cursor here, so "what have I applied" survives crashes in the
    * same manifest rename as the data it describes. */
  def lastAppliedBatch(name: String): Option[Long] =
    latestManifest(name).flatMap(_.lastBatch)

  /** [[replace]] that also SETS the batch high-water mark (replace
    * itself only carries the existing mark forward): the rebuild
    * path of exactly-once consumers — one manifest rename installs
    * both the recomputed content and the cursor saying what it
    * covers. Refuses to move the mark backwards: a lower id would
    * re-open the door for replays of already-applied epochs. */
  def replaceWithBatch(name: String, df: DataFrame, batchId: Long): Unit = {
    val prev = latestManifest(name)
    require(prev.flatMap(_.lastBatch).forall(_ <= batchId),
      s"$name batch mark would move backwards: " +
        s"${prev.flatMap(_.lastBatch)} → $batchId")
    val v = prev.map(_.version + 1).getOrElse(0)
    val rel = s"data/log-$v"
    writeDir(df, new Path(tableDir(name), rel).toString)
    val dm = metaForDir(name, rel)
    commit(name, Manifest(v, Map.empty, Seq(rel), Some(batchId),
      statsPart(dm), keysPart(dm), rows = rowsPart(dm), ndv = ndvPart(dm),
      qsk = qskPart(dm), fanout = prev.flatMap(_.fanout),
      dropped = Some(Nil))) // full rewrite = the new schema truth
  }

  /** K2 append as a committed log generation: new dir + new manifest.
    * Mirrors [[upsert]]'s role-split guard in the other direction:
    * appending log dirs into a bucketed upsert target would brick it
    * (every later upsert/delete refuses on the logs-present check). */
  override def append(name: String, df: DataFrame): Unit =
    appendCommit(name, df, None)

  /** Exactly-once streaming append: the batch id commits in the SAME
    * manifest rename as the data, so "data landed but marker didn't"
    * cannot exist. A replayed epoch (batchId ≤ recorded high-water
    * mark) is skipped — foreachBatch epochs are monotonic per query. */
  override def appendIfNew(name: String, df: DataFrame, batchId: Long): Boolean = {
    val applied = latestManifest(name).flatMap(_.lastBatch)
    if (applied.exists(batchId <= _)) false
    else { appendCommit(name, df, Some(batchId)); true }
  }

  private def appendCommit(name: String, df: DataFrame, batchId: Option[Long]): Unit = {
    val prev = latestManifest(name)
    require(prev.forall(_.buckets.isEmpty),
      s"$name has bucketed upsert generations; append targets log tables only")
    refuseDroppedWrite(name, prev, df)
    val v = prev.map(_.version + 1).getOrElse(0)
    val rel = s"data/log-$v"
    writeDir(df, new Path(tableDir(name), rel).toString)
    val dm = metaForDir(name, rel)
    commit(name, Manifest(v, prev.map(_.buckets).getOrElse(Map.empty),
      prev.map(_.logs).getOrElse(Nil) :+ rel,
      batchId.orElse(prev.flatMap(_.lastBatch)),
      fanout = prev.flatMap(_.fanout),
      stats = prev.map(_.stats).getOrElse(Map.empty) ++ statsPart(dm),
      keys = prev.map(_.keys).getOrElse(Map.empty) ++ keysPart(dm),
      statsVersion = carriedStatsVersion(prev),
      rows = prev.map(_.rows).getOrElse(Map.empty) ++ rowsPart(dm),
      ndv = prev.map(_.ndv).getOrElse(Map.empty) ++ ndvPart(dm),
      qsk = prev.map(_.qsk).getOrElse(Map.empty) ++ qskPart(dm)))
  }

  /** Log-structured compaction for append-mode tables: fold the
    * current snapshot's N log generations into ONE (optionally
    * `transform`ed — e.g. a sketch table's cell-wise sum, a candidate
    * table's distinct), committed with a compare-and-swap against the
    * snapshot that was read. An append (e.g. a streaming drain's
    * [[appendIfNew]]) landing between the read and the commit makes
    * the CAS fail — the compaction RETRIES against the fresh snapshot
    * instead of silently dropping the new generation while its batch
    * mark survives, which a blind read-then-replace would do. The
    * batch mark carries the base snapshot's value, which the CAS
    * proves complete. Superseded generation dirs (and any lost-race
    * staging) become unreferenced garbage for [[vacuum]].
    *
    * Returns true when the log is compact (≤ 1 generation), false if
    * every attempt lost its race. A real streaming user needs this —
    * one dir per micro-batch forever is unbounded read fan-in. */
  def compactLogs(
      name: String,
      transform: DataFrame => DataFrame = identity,
      maxAttempts: Int = 5): Boolean = {
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val base = latestManifest(name) match {
        case None => return true
        case Some(m) => m
      }
      require(base.buckets.isEmpty,
        s"$name has bucketed upsert generations; compactLogs targets append-log tables")
      if (base.logs.size <= 1) return true
      val v = base.version + 1
      val rel = s"data/log-$v"
      // the fold reads SUPPRESSED (X259): the transform sees the
      // logical schema, and the compacted generation physically sheds
      // any dropped column the old log dirs still carried
      val merged = transform(dropSuppressed(base,
        readDirs(dirsOf(name, base, base.logs))))
      writeDir(merged, new Path(tableDir(name), rel).toString)
      // CAS: commit only if nothing advanced the table while we wrote
      if (latestManifest(name).exists(_.version == base.version)) {
        try {
          val dm = metaForDir(name, rel)
          commit(name, Manifest(v, Map.empty, Seq(rel), base.lastBatch,
            statsPart(dm), keysPart(dm), rows = rowsPart(dm),
            ndv = ndvPart(dm), qsk = qskPart(dm), fanout = base.fanout))
          return true
        } catch { case _: ConcurrentCommitException => () } // lost the race
      }
    }
    false
  }

  /** K3/K4 full replace — still one manifest rename; the previous
    * snapshot's dirs stay readable until [[vacuum]]. */
  override def replace(name: String, df: DataFrame): Unit = {
    val prev = latestManifest(name)
    val v = prev.map(_.version + 1).getOrElse(0)
    val rel = s"data/log-$v"
    // A replace source may read this very table (self-overwrite);
    // writing to a fresh generation dir makes that safe by layout.
    // The streaming batch mark survives the replace: compaction
    // (SketchIntake.compact) rewrites content between streaming
    // commits, and dropping the mark there would let a crash-replayed
    // epoch re-apply after a compact.
    writeDir(df, new Path(tableDir(name), rel).toString)
    val dm = metaForDir(name, rel)
    commit(name, Manifest(v, Map.empty, Seq(rel), prev.flatMap(_.lastBatch),
      statsPart(dm), keysPart(dm), rows = rowsPart(dm), ndv = ndvPart(dm),
      qsk = qskPart(dm), fanout = prev.flatMap(_.fanout),
      dropped = Some(Nil))) // full rewrite = the new schema truth
  }

  override def upsert(name: String, incoming: DataFrame, key: String)(implicit s: SparkSession): Unit =
    upsertCore(name, incoming, key, None)

  /** [[upsert]] that also SETS the streaming batch high-water mark —
    * the keyed exactly-once sink: O(touched-buckets) write cost like
    * any upsert, and the mark commits in the SAME manifest rename as
    * the merged buckets (the [[replaceWithBatch]] contract without
    * the full rewrite). Refuses to move the mark backwards; callers
    * replaying an epoch should check [[lastAppliedBatch]] first, the
    * same discipline as [[appendIfNew]]. */
  def upsertWithBatch(name: String, incoming: DataFrame, key: String,
      batchId: Long): Unit = {
    require(latestManifest(name).flatMap(_.lastBatch).forall(_ <= batchId),
      s"$name batch mark would move backwards")
    upsertCore(name, incoming, key, Some(batchId))
  }

  private def upsertCore(name: String, incoming: DataFrame, key: String,
      batchId: Option[Long]): Unit = {
    import org.apache.spark.sql.functions.col
    val prev = latestManifest(name)
    require(prev.forall(_.logs.isEmpty),
      s"$name has append-log generations; bucketed upsert targets are upsert-only")
    refuseDroppedWrite(name, prev, incoming)
    // BUCKET-COLUMN TYPE STABILITY (X212's hard boundary): bucket
    // assignment and key Blooms hash xxhash64(bucket column), and
    // xxhash64 is type-tagged — an upsert whose key (or cluster)
    // column arrives at a WIDER type would bucket the same logical
    // keys into different dirs than their existing rows (silent key
    // splits, missed replacements, wrong delete targeting). Value
    // columns widen freely (the read path reconciles); the bucket
    // column must migrate through one atomic [[rebuild]] at the new
    // type. One footer-schema probe per upsert; an unreadable dir
    // defers to the loud failure the data read will raise anyway.
    prev.foreach { m =>
      val bucketBy = clusterColumn
        .filter(incoming.columns.contains).getOrElse(key)
      m.buckets.values.headOption.foreach { d =>
        val stored =
          try Some(spark.read.format(fmt)
            .load(resolveDir(name, d)).schema)
          catch { case scala.util.control.NonFatal(_) => None }
        for {
          sch <- stored
          f <- sch.fields.find(_.name == bucketBy)
          in <- incoming.schema.fields.find(_.name == bucketBy)
        } require(f.dataType == in.dataType,
          s"$name: bucket column '$bucketBy' type drift " +
            s"(stored ${f.dataType.simpleString}, incoming " +
            s"${in.dataType.simpleString}): bucket/Bloom hashes are " +
            "type-tagged — migrate the bucket column through one " +
            "atomic rebuild() at the new type instead")
      }
    }
    val v = prev.map(_.version + 1).getOrElse(0)
    val stage = new Path(tableDir(name), s"stage-$v")
    val f = fs(stage)
    // the RECORDED fan-out wins over this store's configured default —
    // a mismatched modulus would hash keys into the wrong dirs
    val fan = fanoutFor(prev)
    // buckets the batch touches: ≤ fan values, driver-safe
    val touched = withBucketN(incoming, key, fan)
      .select(BucketCol).distinct().collect().map(_.getLong(0)).sorted
    // manifest-level pruning: ONLY the touched buckets' dirs are even
    // named, let alone listed or read. Tombstone-aware: the merge must
    // not resurrect rows a lazy delete already removed — the rewrite
    // applies the outstanding sidecars and the new generation carries
    // none (liveTombs drops them with the superseded dirs)
    val existingRels = prev.toSeq.flatMap(m =>
      touched.flatMap(b => m.buckets.get(b)))
    val existing =
      if (existingRels.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], incoming.schema)
      else readDataDirs(name, prev.get, existingRels)
    val merged = withBucketN(graft.ops.Upsert.upsert(existing, incoming, key), key, fan)
    sortedForWrite(merged).write.mode(SaveMode.Overwrite).partitionBy(BucketCol).format(fmt).save(stage.toString)
    // per-bucket data-skipping stats + key Blooms, ONE grouped agg
    // over the stage (before the renames — the staged layout still
    // carries the bucket partition column)
    val stageMeta = metaForStage(stage.toString)
    // move each staged bucket dir to its immutable generation home
    f.mkdirs(new Path(tableDir(name), "data"))
    val newBuckets = touched.flatMap { b =>
      val src = new Path(stage, s"$BucketCol=$b")
      if (f.exists(src)) {
        val rel = s"data/b$b-g$v"
        val dst = new Path(tableDir(name), rel)
        // a dir at THIS version can only be an orphan of a crashed
        // attempt (no committed manifest references version v yet) —
        // clear it so the rename can't silently fail
        if (f.exists(dst)) f.delete(dst, true)
        if (!f.rename(src, dst))
          throw new java.io.IOException(s"bucket move failed: $src -> $dst")
        Some(b -> rel)
      } else None
    }.toMap
    f.delete(stage, true)
    commit(name, Manifest(v,
      prev.map(_.buckets).getOrElse(Map.empty) ++ newBuckets, Nil,
      batchId.orElse(prev.flatMap(_.lastBatch)),
      prev.map(_.stats).getOrElse(Map.empty) ++
        newBuckets.flatMap { case (b, rel) =>
          stageMeta.get(b).filter(_.stats.nonEmpty).map(rel -> _.stats) },
      prev.map(_.keys).getOrElse(Map.empty) ++
        newBuckets.flatMap { case (b, rel) =>
          stageMeta.get(b).filter(_.keys.nonEmpty).map(rel -> _.keys) },
      carriedStatsVersion(prev),
      prev.map(_.rows).getOrElse(Map.empty) ++
        newBuckets.flatMap { case (b, rel) =>
          stageMeta.get(b).flatMap(_.rows).map(rel -> _) },
      prev.map(_.ndv).getOrElse(Map.empty) ++
        newBuckets.flatMap { case (b, rel) =>
          stageMeta.get(b).filter(_.ndv.nonEmpty).map(rel -> _.ndv) },
      prev.map(_.qsk).getOrElse(Map.empty) ++
        newBuckets.flatMap { case (b, rel) =>
          stageMeta.get(b).filter(_.qsk.nonEmpty).map(rel -> _.qsk) },
      prev.map(_.tombs).getOrElse(Map.empty), // untouched buckets keep theirs
      fanout = Some(fan)))
  }

  /** Atomic FULL REBUILD of a bucketed-upsert table: every bucket of
    * `df` stages completely, then ONE manifest commit swaps the whole
    * table — rows absent from `df` are gone from the new snapshot,
    * and the superseded generation stays [[readAt]]-readable until
    * [[vacuum]]. The bucketed twin of [[replace]], which this exists
    * to avoid: replace writes an append-LOG generation, after which
    * the table refuses keyed upserts — but an index rebuilt under new
    * frozen artifacts (re-trained centroids, refit df model) must
    * KEEP taking streaming upserts afterwards. A crash mid-stage
    * leaves the previous snapshot serving (no manifest references the
    * staged dirs); the streaming batch mark carries forward across
    * the rebuild, same as [[replace]]. */
  def rebuild(name: String, df: DataFrame, key: String): Unit = {
    val prev = latestManifest(name)
    val v = prev.map(_.version + 1).getOrElse(0)
    val stage = new Path(tableDir(name), s"stage-$v")
    val f = fs(stage)
    val bucketed = withBucket(df, key)
    val touched = bucketed
      .select(BucketCol).distinct().collect().map(_.getLong(0)).sorted
    sortedForWrite(bucketed).write.mode(SaveMode.Overwrite).partitionBy(BucketCol)
      .format(fmt).save(stage.toString)
    val stageMeta = metaForStage(stage.toString)
    f.mkdirs(new Path(tableDir(name), "data"))
    val newBuckets = touched.flatMap { b =>
      val src = new Path(stage, s"$BucketCol=$b")
      if (f.exists(src)) {
        val rel = s"data/b$b-g$v"
        val dst = new Path(tableDir(name), rel)
        if (f.exists(dst)) f.delete(dst, true)
        if (!f.rename(src, dst))
          throw new java.io.IOException(s"bucket move failed: $src -> $dst")
        Some(b -> rel)
      } else None
    }.toMap
    f.delete(stage, true)
    commit(name, Manifest(v, newBuckets, Nil,
      prev.flatMap(_.lastBatch),
      newBuckets.flatMap { case (b, rel) =>
        stageMeta.get(b).filter(_.stats.nonEmpty).map(rel -> _.stats) }.toMap,
      newBuckets.flatMap { case (b, rel) =>
        stageMeta.get(b).filter(_.keys.nonEmpty).map(rel -> _.keys) }.toMap,
      rows = newBuckets.flatMap { case (b, rel) =>
        stageMeta.get(b).flatMap(_.rows).map(rel -> _) }.toMap,
      ndv = newBuckets.flatMap { case (b, rel) =>
        stageMeta.get(b).filter(_.ndv.nonEmpty).map(rel -> _.ndv) }.toMap,
      qsk = newBuckets.flatMap { case (b, rel) =>
        stageMeta.get(b).filter(_.qsk.nonEmpty).map(rel -> _.qsk) }.toMap,
      // rebuild is the fan-out MIGRATION point: the whole table was
      // just rehashed under this store's configured modulus
      fanout = Some(numBuckets),
      dropped = Some(Nil))) // full rewrite = the new schema truth
  }

  /** Z-ORDER CLUSTERING REWRITE (X253 — the store surface for
    * [[graft.ops.ZOrder]], the hand-rolled OPTIMIZE ZORDER BY): lay
    * an append-log table out along the Morton curve of `cols` and
    * commit it as `slabs` LOG GENERATIONS, each a contiguous z-range
    * — so every slab's recorded min/max box is NARROW in EVERY listed
    * dimension and the existing conjunctive stats pruning
    * ([[readWhereAll]], and the SQL catalog scan through it) skips
    * most slabs for a predicate on ANY of the columns. A linear sort
    * can only make ONE column's ranges narrow; time-ordered ingest
    * makes none. Dimensions are MIN/MAX-NORMALIZED into the z domain
    * (decimal-exact affine map — monotone, so locality holds for any
    * integral range; a pmod fold would co-locate values 2^bits apart
    * and scramble the very stats pruning reads). One shuffle
    * (range-partition by z) + one manifest rename; the batch mark
    * carries forward. Like [[compactLogs]], this REWRITES log
    * history: dir-level streaming capture across it refuses (the
    * standing contract). `cols` must be recorded stats columns —
    * clustering a column the manifest doesn't stat would change
    * nothing, refused loudly — and integral/date/timestamp (z-space
    * is integer bit-interleaving). Returns the slab count written. */
  def rewriteClustered(name: String, cols: Seq[String], bits: Int = 16,
      slabs: Int = 16): Int = {
    import org.apache.spark.sql.functions.{col, greatest, lit, max, min, spark_partition_id}
    require(cols.nonEmpty && cols.size * bits <= 62,
      s"need 1+ columns and columns*bits <= 62 (got ${cols.size} * $bits)")
    require(slabs >= 2, "clustering into < 2 slabs prunes nothing")
    val missing = cols.filterNot(statsColumns.contains)
    require(missing.isEmpty,
      s"z-order columns must be recorded stats columns (pruning reads " +
        s"the manifest boxes): ${missing.mkString(", ")} not in " +
        s"statscolumns [${statsColumns.mkString(", ")}]")
    val prev = latestManifest(name).getOrElse(
      throw new java.util.NoSuchElementException(s"graft table '$name' does not exist"))
    require(prev.buckets.isEmpty,
      s"$name has bucketed keyed generations — z-order rewrites " +
        "append-log tables; keyed tables cluster within buckets via " +
        "the sortcolumns store shape")
    val df = readManifest(name, prev).getOrElse(
      throw new java.util.NoSuchElementException(s"graft table '$name' is unreadable"))
    cols.foreach { c =>
      require(df.columns.contains(c), s"'$c' is not a column of '$name'")
      import org.apache.spark.sql.types._
      val ok = df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType | DateType |
             TimestampType => true
        case _ => false
      }
      require(ok, s"z-order needs an integral/date/timestamp column; " +
        s"'$c' is ${df.schema(c).dataType.simpleString}")
    }
    val v = prev.version + 1
    // min/max-normalize each dimension into [0, 2^bits): exact decimal
    // affine map, monotone by construction
    val longs = cols.map(c => col(c).cast("long"))
    val boundsRow = df.agg(longs.map(min).head,
      (longs.map(min).tail ++ longs.map(max)): _*).collect().head
    // empty table or an all-null dimension: no curve to lay out
    if (cols.indices.exists(i => boundsRow.isNullAt(i))) return 0
    val mns = cols.indices.map(boundsRow.getLong)
    val mxs = cols.indices.map(i => boundsRow.getLong(cols.size + i))
    val top = (1L << bits) - 1
    val dims = cols.zipWithIndex.map { case (c, i) =>
      val span = math.max(1L, mxs(i) - mns(i))
      ((col(c).cast("long") - lit(mns(i)))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))
        * lit(top) / lit(span)).cast("long")
    }
    val clustered = graft.ops.ZOrder.layout(df, dims, bits, slabs)
      .withColumn(BucketCol, spark_partition_id().cast("long"))
    val stage = new Path(tableDir(name), s"stage-$v")
    val f = fs(stage)
    clustered.write.mode(SaveMode.Overwrite).partitionBy(BucketCol)
      .format(fmt).save(stage.toString)
    val stageMeta = metaForStage(stage.toString)
    f.mkdirs(new Path(tableDir(name), "data"))
    val written = (0 until slabs).flatMap { i =>
      val src = new Path(stage, s"$BucketCol=$i")
      if (f.exists(src)) {
        val rel = s"data/z$i-g$v"
        val dst = new Path(tableDir(name), rel)
        if (f.exists(dst)) f.delete(dst, true)
        if (!f.rename(src, dst))
          throw new java.io.IOException(s"slab move failed: $src -> $dst")
        Some(i.toLong -> rel)
      } else None
    }
    f.delete(stage, true)
    commit(name, Manifest(v, Map.empty, written.map(_._2),
      prev.lastBatch,
      written.flatMap { case (i, rel) =>
        stageMeta.get(i).filter(_.stats.nonEmpty).map(rel -> _.stats) }.toMap,
      written.flatMap { case (i, rel) =>
        stageMeta.get(i).filter(_.keys.nonEmpty).map(rel -> _.keys) }.toMap,
      carriedStatsVersion(Some(prev)),
      rows = written.flatMap { case (i, rel) =>
        stageMeta.get(i).flatMap(_.rows).map(rel -> _) }.toMap,
      ndv = written.flatMap { case (i, rel) =>
        stageMeta.get(i).filter(_.ndv.nonEmpty).map(rel -> _.ndv) }.toMap,
      qsk = written.flatMap { case (i, rel) =>
        stageMeta.get(i).filter(_.qsk.nonEmpty).map(rel -> _.qsk) }.toMap,
      fanout = prev.fanout))
    written.size
  }

  /** Keyed row deletion — the right-to-be-forgotten path a 100 TB
    * training-data warehouse needs: rewrite ONLY the buckets
    * containing the doomed keys (O(touched), same discipline as
    * upsert) and commit atomically, so a crash mid-delete leaves the
    * previous complete snapshot, never a half-deleted table. The
    * deleted rows physically persist in superseded generation dirs
    * until [[vacuum]] — run vacuum after delete when the point is
    * physical erasure, not just logical. `keys` is a one-column frame
    * of key values (broadcast into the anti-join). */
  def delete(name: String, keyCol: String, keys: DataFrame)(implicit s: SparkSession): Unit = {
    val prev = latestManifest(name)
    require(prev.forall(_.logs.isEmpty),
      s"$name has append-log generations; keyed delete targets bucketed tables")
    require(prev.forall(!_.droppedNames.contains(keyCol)),
      s"$name: '$keyCol' was dropped — a predicate on a retired name " +
        "would silently target hidden values (X259); rebuild() first")
    if (prev.isEmpty) return
    val v = prev.get.version + 1
    val (keyFrame, touchedDirs) = deleteTargeting(name, prev.get, keyCol, keys)
    if (touchedDirs.isEmpty) return
    // mergeSchema like read/upsert: after a widening upsert the touched
    // buckets span generations with different schemas — a single-footer
    // inference could pick an OLD generation and rewrite the bucket
    // without the later-added columns, destroying them in the snapshot.
    // Tombstone-aware: the rewrite also applies outstanding
    // merge-on-read sidecars (physical erasure rides along).
    val existing = readDataDirs(name, prev.get, touchedDirs.map(_._2))
    val remaining = withBucketN(
      existing.join(
        org.apache.spark.sql.functions.broadcast(keyFrame), Seq(keyCol), "left_anti"),
      keyCol, prev.get.fanout.getOrElse(numBuckets))
    val stage = new Path(tableDir(name), s"stage-$v")
    val f = fs(stage)
    sortedForWrite(remaining).write.mode(SaveMode.Overwrite).partitionBy(BucketCol).format(fmt).save(stage.toString)
    val stageMeta = metaForStage(stage.toString)
    f.mkdirs(new Path(tableDir(name), "data"))
    // a touched bucket may become empty (every row deleted): it then
    // has no staged dir and simply drops out of the manifest
    val newBuckets = touchedDirs.flatMap { case (b, _) =>
      val src = new Path(stage, s"$BucketCol=$b")
      if (f.exists(src)) {
        val rel = s"data/b$b-g$v"
        val dst = new Path(tableDir(name), rel)
        if (f.exists(dst)) f.delete(dst, true)
        if (!f.rename(src, dst))
          throw new java.io.IOException(s"bucket move failed: $src -> $dst")
        Some(b -> rel)
      } else None
    }.toMap
    f.delete(stage, true)
    commit(name, Manifest(v,
      prev.get.buckets -- touchedDirs.map(_._1) ++ newBuckets, Nil,
      prev.get.lastBatch,
      prev.get.stats ++
        newBuckets.flatMap { case (b, rel) =>
          stageMeta.get(b).filter(_.stats.nonEmpty).map(rel -> _.stats) },
      prev.get.keys ++
        newBuckets.flatMap { case (b, rel) =>
          stageMeta.get(b).filter(_.keys.nonEmpty).map(rel -> _.keys) },
      carriedStatsVersion(prev),
      prev.get.rows ++
        newBuckets.flatMap { case (b, rel) =>
          stageMeta.get(b).flatMap(_.rows).map(rel -> _) },
      prev.get.ndv ++
        newBuckets.flatMap { case (b, rel) =>
          stageMeta.get(b).filter(_.ndv.nonEmpty).map(rel -> _.ndv) },
      prev.get.qsk ++
        newBuckets.flatMap { case (b, rel) =>
          stageMeta.get(b).filter(_.qsk.nonEmpty).map(rel -> _.qsk) },
      prev.get.tombs, // rewritten dirs' tombstones drop via liveTombs
      fanout = prev.get.fanout.orElse(Some(numBuckets))))
  }

  /** ONE-COMMIT row-level delta (X244 — what SQL MERGE INTO / UPDATE
    * resolve to through [[GraftV2Table]]'s `SupportsDelta` write):
    * apply `upserts` (keep-last keyed replace + inserts) AND remove
    * `deleteKeys`, atomically — a reader is entirely before or
    * entirely after the merge, never between its update and delete
    * halves (two chained commits would expose exactly that seam).
    * Cost shape is the keyed-write contract: touched buckets =
    * buckets(upsert keys) ∪ buckets(delete keys), only those rewrite
    * (O(touched), plan-audited), untouched buckets carry over by
    * reference; an emptied bucket drops out of the manifest. The
    * rewrite applies outstanding merge-on-read tombstones on the
    * dirs it touches, like every bucket rewrite. `deleteKeys` joins
    * un-forced (AQE picks broadcast vs shuffle) — an arbitrary-
    * predicate SQL DELETE can doom millions of keys, which is
    * exactly when a forced broadcast would fall over. */
  def applyDelta(name: String, upserts: DataFrame, deleteKeys: DataFrame,
      key: String): Unit = {
    import org.apache.spark.sql.functions.col
    val prev = latestManifest(name).getOrElse(
      throw new java.util.NoSuchElementException(s"no such table: $name"))
    require(prev.logs.isEmpty,
      s"$name has append-log generations; row-level SQL writes target " +
        "keyed bucketed tables")
    require(clusterColumn.isEmpty,
      "row-level SQL writes target key-bucketed tables — cluster-bucketed " +
        "indexes are append+delete surfaces (re-embed = delete + insert)")
    val delKeys = deleteKeys.select(col(deleteKeys.columns.head).as(key)).distinct()
    val fan = prev.fanout.getOrElse(numBuckets)
    val touched = withBucketN(
      upserts.select(col(key)).union(delKeys.select(col(key))), key, fan)
      .select(BucketCol).distinct().collect().map(_.getLong(0)).sorted
    if (touched.isEmpty) return
    val v = prev.version + 1
    val existingRels = touched.flatMap(b => prev.buckets.get(b)).toSeq
    val existing =
      if (existingRels.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], upserts.schema)
      else readDataDirs(name, prev, existingRels)
    val kept = existing.join(delKeys, Seq(key), "left_anti")
    val merged = withBucketN(graft.ops.Upsert.upsert(kept, upserts, key), key, fan)
    val stage = new Path(tableDir(name), s"stage-$v")
    val f = fs(stage)
    sortedForWrite(merged).write.mode(SaveMode.Overwrite)
      .partitionBy(BucketCol).format(fmt).save(stage.toString)
    val stageMeta = metaForStage(stage.toString)
    f.mkdirs(new Path(tableDir(name), "data"))
    val newBuckets = touched.flatMap { b =>
      val src = new Path(stage, s"$BucketCol=$b")
      if (f.exists(src)) {
        val rel = s"data/b$b-g$v"
        val dst = new Path(tableDir(name), rel)
        if (f.exists(dst)) f.delete(dst, true)
        if (!f.rename(src, dst))
          throw new java.io.IOException(s"bucket move failed: $src -> $dst")
        Some(b -> rel)
      } else None // the merge emptied this bucket: it drops out
    }.toMap
    f.delete(stage, true)
    commit(name, Manifest(v,
      prev.buckets -- touched ++ newBuckets, Nil,
      prev.lastBatch,
      prev.stats ++
        newBuckets.flatMap { case (b, rel) =>
          stageMeta.get(b).filter(_.stats.nonEmpty).map(rel -> _.stats) },
      prev.keys ++
        newBuckets.flatMap { case (b, rel) =>
          stageMeta.get(b).filter(_.keys.nonEmpty).map(rel -> _.keys) },
      carriedStatsVersion(Some(prev)),
      prev.rows ++
        newBuckets.flatMap { case (b, rel) =>
          stageMeta.get(b).flatMap(_.rows).map(rel -> _) },
      prev.ndv ++
        newBuckets.flatMap { case (b, rel) =>
          stageMeta.get(b).filter(_.ndv.nonEmpty).map(rel -> _.ndv) },
      prev.qsk ++
        newBuckets.flatMap { case (b, rel) =>
          stageMeta.get(b).filter(_.qsk.nonEmpty).map(rel -> _.qsk) },
      prev.tombs, // rewritten dirs' tombstones drop via liveTombs
      fanout = Some(fan)))
  }

  /** ALTER TABLE ADD COLUMNS, metadata-only (X247): commit a ZERO-ROW
    * "schema generation" — a footer-only dir carrying the EXTENDED
    * schema — under the reserved bucket id -1 (pmod never produces
    * it, so no keyed write ever touches or rewrites it). Reads merge
    * it like any generation: existing rows show the new columns as
    * null, exactly the add-column semantics a widening upsert already
    * has — this is the DDL spelling for declaring the column BEFORE
    * any data carries it. O(one footer write + one manifest rename)
    * at any table size. Works on bucketed and log tables alike;
    * [[replace]]/[[rebuild]] supersede it wholesale (a full rewrite
    * is the new schema truth). New columns are nullable by
    * construction — existing rows have no value for them. */
  def addColumns(name: String,
      cols: Seq[org.apache.spark.sql.types.StructField]): Unit = {
    val prev = latestManifest(name).getOrElse(
      throw new java.util.NoSuchElementException(s"no such table: $name"))
    val cur = readManifest(name, prev).getOrElse(
      throw new java.util.NoSuchElementException(s"no such table: $name")).schema
    val dup = cols.map(_.name).filter(cur.fieldNames.contains)
    require(dup.isEmpty,
      s"$name already has column(s): ${dup.mkString(", ")}")
    // a DROPPED name is RETIRED (X259): re-declaring it would let the
    // hidden old-generation values resurface under the new column —
    // name-keyed lineage cannot tell them apart without column ids
    val retired = cols.map(_.name).filter(prev.droppedNames.contains)
    require(retired.isEmpty,
      s"$name: column name(s) ${retired.mkString(", ")} were dropped and " +
        "are retired — rebuild()/replace() the table to reuse them")
    require(cols.nonEmpty, "ADD COLUMNS needs at least one column")
    val extended = StructType(cur.fields ++ cols.map(_.copy(nullable = true)))
    val v = prev.version + 1
    val rel = s"data/schema-g$v"
    writeDir(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], extended)
      .repartition(1), new Path(tableDir(name), rel).toString)
    val dm = metaForDir(name, rel)
    commit(name, Manifest(v, prev.buckets + (SchemaBucket -> rel), prev.logs,
      prev.lastBatch,
      prev.stats ++ statsPart(dm), prev.keys ++ keysPart(dm),
      carriedStatsVersion(Some(prev)),
      // rows: 0 recorded explicitly — the zero-row record is what lets
      // delete targeting skip this dir and metadata counts stay exact
      prev.rows ++ rowsPart(dm) + (rel -> 0L),
      prev.ndv ++ ndvPart(dm), prev.qsk ++ qskPart(dm),
      prev.tombs, fanout = prev.fanout))
  }

  /** The reserved bucket id of zero-row schema generations —
    * `pmod(xxhash64(...), fan)` is non-negative, so no keyed write
    * ever computes it: schema gens are never "touched", never
    * rewritten, and carry across every keyed commit untouched. */
  private val SchemaBucket = -1L

  /** ALTER TABLE DROP COLUMN, metadata-only (X259 — the inverse of
    * [[addColumns]]): ONE manifest rename records the dropped names;
    * no data byte moves. Reads suppress the columns by name over
    * every generation that still physically carries them
    * ([[readDataDirs]]); any content rewrite (upsert merge,
    * [[applyDeletes]], [[compactLogs]], [[rebuild]]) sheds them
    * physically as a side effect, and [[vacuum]] then reclaims the
    * superseded bytes — the same lazy-then-compact lifecycle as
    * merge-on-read deletes. O(manifest) at any table size.
    *
    * The contract a name-keyed lattice can honestly carry:
    *   - a dropped NAME IS RETIRED — re-adding it would let hidden
    *     old-generation values resurface as the "new" column (no
    *     column ids to tell them apart); [[addColumns]] and every
    *     ingest path refuse it until a [[rebuild]]/[[replace]]
    *     resets the marker (a full rewrite is the new schema truth);
    *   - TIME TRAVEL serves the column at pre-drop versions (the
    *     marker is snapshot state) and [[restore]] resurrects it;
    *   - physical erasure needs the rewrite + vacuum, exactly like
    *     [[deleteLazy]] — documented, not silent;
    *   - RENAME COLUMN stays refused at the catalog: without column
    *     ids a rename is drop+add of the same bytes, which the
    *     retirement rule above forbids for good reason.
    *
    * The cluster column refuses (physical layout hangs off it); a
    * keyed table's upsert-key column is refused by the SQL catalog,
    * which knows the key (a direct API caller dropping it gets the
    * loud merge failure on the next upsert). */
  def dropColumns(name: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "DROP COLUMN needs at least one column")
    cols.foreach(c => require(c.matches("[A-Za-z0-9_]+"),
      s"droppable column names are [A-Za-z0-9_]+ (manifest line syntax): $c"))
    val prev = latestManifest(name).getOrElse(
      throw new java.util.NoSuchElementException(s"no such table: $name"))
    val cur = readManifest(name, prev).getOrElse(
      throw new java.util.NoSuchElementException(s"no such table: $name")).schema
    val missing = cols.filterNot(cur.fieldNames.contains)
    require(missing.isEmpty,
      s"$name has no column(s): ${missing.mkString(", ")}")
    require(cur.fieldNames.toSet != cols.toSet,
      s"cannot drop every column of $name — use dropTable")
    clusterColumn.foreach(cc => require(!cols.contains(cc),
      s"$name: '$cc' is the cluster column — physical bucket layout " +
        "hangs off it; rebuild() under a new shape instead"))
    commit(name, Manifest(prev.version + 1, prev.buckets, prev.logs,
      prev.lastBatch, prev.stats, prev.keys, carriedStatsVersion(Some(prev)),
      prev.rows, prev.ndv, prev.qsk, prev.tombs, fanout = prev.fanout,
      dropped = Some((prev.droppedNames ++ cols).distinct)))
  }

  /** The ingest-side half of the X259 retirement rule: a frame
    * carrying a dropped column's name must refuse loudly — committing
    * it would write live data under a name the read path suppresses
    * (silent data loss), or worse, resurrect hidden values. */
  private def refuseDroppedWrite(name: String, prev: Option[Manifest],
      df: DataFrame): Unit =
    prev.map(_.droppedNames).filter(_.nonEmpty).foreach { gone =>
      val clash = df.columns.filter(gone.contains)
      require(clash.isEmpty,
        s"$name: column name(s) ${clash.mkString(", ")} were dropped and " +
          "are retired — rebuild()/replace() the table to reuse them")
    }

  /** Scratch dir for one SQL row-level write's delta files — under
    * the table dir with the `stage-` prefix, so a crashed query's
    * debris is swept by [[vacuum]] like every other stage. */
  def deltaStagePath(name: String, id: String): String =
    new Path(tableDir(name),
      s"stage-delta-${id.replaceAll("[^A-Za-z0-9_-]", "_")}").toString

  /** The delete-targeting pass shared by [[delete]] and
    * [[deleteLazy]]: (typed key frame, the (bucket, dir) pairs that
    * might hold any doomed key). Type discipline: bucket targeting
    * hashes xxhash64(key) and the manifest Blooms are type-tagged the
    * same way, so a keys frame whose column type differs from the
    * table's (Int ids for a Long column) would hash into the WRONG
    * buckets and silently no-op the delete. The frame is cast to the
    * table's type when the cast round-trips losslessly for every key;
    * otherwise every bucket is a candidate with the ORIGINAL frame
    * (Spark's own join coercion decides equality) — conservative,
    * never a no-op. With a cluster column the keys frame can't
    * compute its rows' buckets (they bucket by the CLUSTER value,
    * absent here) — every bucket is a candidate and the key Blooms
    * do the narrowing. Membership-stats narrowing (a candidate whose
    * key Bloom provably contains NONE of the doomed keys is skipped)
    * applies when the key list is driver-small (≤10k — the X189
    * probe bound); each dir's Bloom deserializes ONCE. */
  private def deleteTargeting(name: String, m: Manifest, keyCol: String,
      keys: DataFrame, targetByKeyHash: Boolean = true): (DataFrame, Seq[(Long, String)]) = {
    import org.apache.spark.sql.functions.col
    val rawFrame = keys.select(col(keys.columns.head).as(keyCol)).distinct()
    val tableDt = columnTypeOf(name, m, keyCol)
    def withOrigType(dt: org.apache.spark.sql.types.DataType) = rawFrame
      .select(col(keyCol).cast(tableDt.get).as(keyCol),
        col(keyCol).as("graft_orig_"))
      .withColumn("graft_lossy_",
        !(col(keyCol).cast(dt) <=> col("graft_orig_")))
    val (keyFrame, typeSafe) = tableDt match {
      case Some(dt) if rawFrame.schema(keyCol).dataType == dt =>
        (rawFrame, true)
      case Some(_) =>
        val probe = withOrigType(rawFrame.schema(keyCol).dataType)
          .localCheckpoint()
        if (probe.filter(col("graft_lossy_")).limit(1).count() > 0)
          (rawFrame, false)
        else (probe.select(keyCol), true)
      case None => (rawFrame, false)
    }
    // `targetByKeyHash = false` is the arbitrary-column contract (SQL
    // DELETE on a non-key column): rows matching the predicate live in
    // buckets assigned by the UPSERT key's hash, not this column's, so
    // hash targeting would silently miss them — every bucket is a
    // candidate and only the Blooms (when this column has them) narrow
    val bucketDirs: Seq[(Long, String)] =
      (if (targetByKeyHash && typeSafe && clusterColumn.isEmpty) {
        val touched = withBucketN(keyFrame, keyCol, m.fanout.getOrElse(numBuckets))
          .select(BucketCol).distinct().collect().map(_.getLong(0)).sorted
        touched.toSeq.flatMap(b => m.buckets.get(b).map(b -> _))
      } else m.buckets.toSeq.sortBy(_._1))
        // a dir RECORDED as zero rows provably holds no doomed key —
        // skipping is exact, and keeps the conservative all-bucket path
        // from rewriting (and thereby dropping) zero-row schema
        // generations (addColumns) and empty batch-mark epochs
        .filterNot { case (_, d) => m.rows.get(d).contains(0L) }
    val touchedDirs =
      if (!typeSafe || !keyColumns.contains(keyCol)) bucketDirs
      else {
        val probe = keyFrame.limit(10001).collect().map(r => keyHash(r.get(0)))
        if (probe.length > 10000) bucketDirs
        else bucketDirs.filter { case (_, d) =>
          dirBloom(m.keys.get(d), keyCol)
            .forall(bf => probe.exists(bf.mightContainLong))
        }
      }
    (keyFrame, touchedDirs)
  }

  /** MERGE-ON-READ keyed deletion (X234 — the deletion-vector tier
    * [[delete]] lacks): commits a per-snapshot KEY-TOMBSTONE SIDECAR
    * instead of rewriting the touched buckets, so the commit costs
    * O(tombstone write + one manifest rename) — a single-key GDPR
    * delete on a 100 TB table stops paying a full bucket rewrite per
    * key hit. Reads anti-join each tombstoned dir's sidecars
    * ([[readDataDirs]]) for AFFECTED dirs only; the untouched rest of
    * the table reads exactly as before. Logical-delete semantics are
    * IDENTICAL to [[delete]] (SnapshotStoreSpec pins lazy ≡ eager
    * bit-for-bit); what differs is WHEN the bytes move:
    * [[applyDeletes]] (or any upsert/delete/deleteRange touching the
    * dir) physically applies outstanding tombstones, and [[vacuum]]
    * then reclaims the superseded generations — run both when the
    * point is physical erasure. While tombstones are outstanding the
    * manifest-served metadata aggregates (COUNT/MIN/MAX/NDV/
    * quantiles) honestly refuse (scan fallback) — recorded per-dir
    * figures describe physical rows. Same targeting and type
    * discipline as [[delete]] ([[deleteTargeting]]); a re-upsert of
    * a tombstoned key RESURRECTS it (the new row lands in a fresh
    * generation carrying no tombstone — keep-last semantics hold). */
  def deleteLazy(name: String, keyCol: String, keys: DataFrame,
      targetByKeyHash: Boolean = true)(implicit s: SparkSession): Unit = {
    require(keyCol.matches("[A-Za-z0-9_]+"),
      s"tombstone key column must be [A-Za-z0-9_]+ (manifest line syntax): $keyCol")
    val prev = latestManifest(name)
    require(prev.forall(_.logs.isEmpty),
      s"$name has append-log generations; keyed delete targets bucketed tables")
    require(prev.forall(!_.droppedNames.contains(keyCol)),
      s"$name: '$keyCol' was dropped — a predicate on a retired name " +
        "would silently target hidden values (X259); rebuild() first")
    if (prev.isEmpty) return
    val m = prev.get
    val (keyFrame, targeted) =
      deleteTargeting(name, m, keyCol, keys, targetByKeyHash)
    // a dir whose footer schema predates the predicate column can hold
    // no matching row — attaching a tombstone there would only gate the
    // metadata serves and cost [[applyDeletes]] a no-op rewrite. The
    // footer probe runs ONLY on the arbitrary-column path (SQL DELETE):
    // a keyed table's every generation was written BY a keyed upsert,
    // so the upsert-key column is always present. A dir the manifest
    // already stats/Blooms on this column provably has it (no probe);
    // an unreadable footer conservatively attaches (the read-side skip
    // in [[readDataDirs]] stays the correctness net either way).
    val touchedDirs =
      if (targetByKeyHash && keyColumns.contains(keyCol)) targeted
      else targeted.filter { case (_, d) =>
        m.stats.getOrElse(d, Nil).exists(_._1 == keyCol) ||
          m.keys.getOrElse(d, Nil).exists(_._1 == keyCol) ||
          m.ndv.getOrElse(d, Nil).exists(_._1 == keyCol) ||
          (try spark.read.format(fmt).load(resolveDir(name, d))
            .schema.fieldNames.contains(keyCol)
          catch { case scala.util.control.NonFatal(_) => true })
      }
    if (touchedDirs.isEmpty) return
    val v = m.version + 1
    val rel = s"data/tomb-g$v"
    writeDir(keyFrame, new Path(tableDir(name), rel).toString)
    val newTombs = m.tombs ++ touchedDirs.map { case (_, d) =>
      d -> (m.tombs.getOrElse(d, Nil) :+ (keyCol -> rel))
    }
    commit(name, Manifest(v, m.buckets, m.logs, m.lastBatch, m.stats,
      m.keys, carriedStatsVersion(Some(m)), m.rows, m.ndv, m.qsk, newTombs,
      fanout = m.fanout))
  }

  /** Physically apply every outstanding tombstone: each tombstoned
    * dir rewrites WITHOUT its doomed keys (O(tombstoned dirs), the
    * rest of the table untouched), one manifest commit drops the
    * sidecar references, and the superseded generations await
    * [[vacuum]]. Returns the number of dirs rewritten. The compaction
    * half of the merge-on-read trade — run it on the maintenance
    * cadence, like log compaction. */
  def applyDeletes(name: String): Int = {
    val m = latestManifest(name) match {
      case None => return 0
      case Some(x) => x
    }
    val tombed = m.liveTombs
    if (tombed.isEmpty) return 0
    val v = m.version + 1
    val relToBucket = m.buckets.map(_.swap)
    var buckets = m.buckets
    var stats = m.stats; var keysM = m.keys; var rows = m.rows
    var ndv = m.ndv; var qsk = m.qsk
    tombed.keys.toSeq.sorted.foreach { d =>
      val b = relToBucket(d)
      val rel = s"data/b$b-g$v"
      val dst = new Path(tableDir(name), rel)
      val f = fs(dst)
      if (f.exists(dst)) f.delete(dst, true) // crash orphan at this version
      writeDir(readDataDirs(name, m, Seq(d)), dst.toString)
      stats -= d; keysM -= d; rows -= d; ndv -= d; qsk -= d
      // an all-deleted dir drops its bucket out of the manifest —
      // decided by the REWRITTEN frame's row count, not by probing for
      // part files: the eager non-partitioned writer leaves a
      // footer-only file for an empty frame (the same behavior
      // GraftCatalog.createTable relies on), which a file probe would
      // mis-read as live data and retain empty generations forever
      val hasFiles = f.exists(dst) && f.listStatus(dst).exists { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith(".") && !n.startsWith("_")
      }
      val dm = if (hasFiles) metaForDir(name, rel) else Map.empty[String, DirMeta]
      if (dm.get(rel).flatMap(_.rows).getOrElse(0L) == 0L) {
        f.delete(dst, true)
        buckets -= b
      } else {
        buckets += b -> rel
        stats = stats ++ statsPart(dm); keysM = keysM ++ keysPart(dm)
        rows = rows ++ rowsPart(dm); ndv = ndv ++ ndvPart(dm)
        qsk = qsk ++ qskPart(dm)
      }
    }
    commit(name, Manifest(v, buckets, m.logs, m.lastBatch, stats, keysM,
      carriedStatsVersion(Some(m)), rows, ndv, qsk,
      m.tombs, // all applied dirs left `buckets` → liveTombs drops them
      fanout = m.fanout))
    tombed.size
  }

  /** ANALYZE (X257): backfill the metadata tier for generations that
    * predate this store's declared stats shape — per-dir min/max,
    * key Blooms, HLL NDV, KLL quantiles and row counts recomputed
    * FROM THE DATA and committed in one manifest rename, with every
    * dir ref unchanged (metadata-only history: no data byte moves).
    * The lever this pulls at 100 TB: a table written by an older
    * shape (or ingested before anyone declared `statscolumns`) scans
    * fully on every filtered read because pruning has nothing to
    * consult, the manifest aggregates refuse, and CBO sees nothing —
    * one analyze pass (columnar, reading only the declared columns)
    * turns all three tiers on. `onlyMissing` (default) recomputes
    * just the dirs lacking a recorded row count or missing a
    * declared stat family — re-analyzing an already-covered table is
    * a no-op commit-free pass; `onlyMissing = false` forces a full
    * recompute (the legacy-stats upgrade path: when every live dir
    * is recomputed the manifest's stats format advances to current).
    * Tombstones are orthogonal: recorded figures describe PHYSICAL
    * rows as everywhere, and the serving gates still apply. Returns
    * the number of dirs analyzed. */
  def analyzeTable(name: String, onlyMissing: Boolean = true): Int = {
    val m = latestManifest(name).getOrElse(
      throw new java.util.NoSuchElementException(
        s"graft table '$name' does not exist"))
    val live = (m.buckets.values ++ m.logs).toSeq
    def covered(d: String): Boolean = {
      val zeroRows = m.rows.get(d).contains(0L)
      m.rows.contains(d) &&
        (zeroRows || statsColumns.isEmpty ||
          m.stats.get(d).exists(_.nonEmpty)) &&
        (zeroRows || ndvColumns.isEmpty || m.ndv.get(d).exists(_.nonEmpty)) &&
        (zeroRows || keyColumns.isEmpty || m.keys.get(d).exists(_.nonEmpty))
    }
    val targets = if (onlyMissing) live.filterNot(covered) else live
    // legacy dirs missing a recorded byte size (X258) make every scan
    // estimate pay a per-dir listing — a metadata-only commit here
    // backfills them (commit's bytesFilled lists each exactly once)
    val bytesMissing = live.exists(d => !m.bytes.contains(d))
    if (targets.isEmpty && !bytesMissing) return 0
    val computed = targets.flatMap { d =>
      val dm = metaOf(readDirs(Seq(resolveDir(name, d))))
      if (dm.isEmpty) None else Some(d -> dm)
    }.toMap
    val v = m.version + 1
    // a full recompute upgrades the stats format; a partial one keeps
    // the sticky minimum (one legacy float-string survivor must keep
    // the conservative read-side widening)
    val full = targets.toSet == live.toSet
    val statsVer =
      if (full) SnapshotBucketedStore.CurrentStatsVersion
      else carriedStatsVersion(Some(m))
    // a FULL recompute REPLACES the per-dir maps rather than merging:
    // a dir holding a legacy entry for a formerly-declared stats
    // column (since redeclared; this recompute recorded nothing for
    // it) must not keep that stale entry under the upgraded version —
    // survives() would skip the LegacyStatsEps widening and could
    // wrongly prune the dir. A partial recompute merges (untargeted
    // dirs keep their entries) and the sticky version keeps the
    // read-side widening honest.
    val next =
      if (full) Manifest(v, m.buckets, m.logs, m.lastBatch,
        statsPart(computed), keysPart(computed), statsVer,
        rowsPart(computed), ndvPart(computed), qskPart(computed),
        m.tombs, fanout = m.fanout)
      else Manifest(v, m.buckets, m.logs, m.lastBatch,
        m.stats ++ statsPart(computed),
        m.keys ++ keysPart(computed),
        statsVer,
        m.rows ++ rowsPart(computed),
        m.ndv ++ ndvPart(computed),
        m.qsk ++ qskPart(computed),
        m.tombs,
        fanout = m.fanout)
    // nothing recomputable changed (e.g. an all-null stats column that
    // can never record): skip the commit instead of minting identical
    // history forever — unless a byte backfill still needs to land
    if (next.stats == m.stats && next.keys == m.keys && next.rows == m.rows &&
        next.ndv == m.ndv && next.qsk == m.qsk && statsVer == m.statsVersion &&
        !bytesMissing)
      return 0
    commit(name, next)
    targets.size
  }

  /** Garbage collection: delete data dirs not referenced by any of the
    * `retainSnapshots` newest manifests, and older manifests. The
    * retention window is the concurrency contract: a reader holding a
    * snapshot no older than `retainSnapshots` commits is never broken
    * by a vacuum (default 1 = only the current snapshot is protected —
    * fine for the single-process case, raise it when long scans
    * overlap commits). Safe to run any time after a crash or a commit
    * (single-writer). Note keyed [[delete]] only physically erases
    * once vacuum reclaims the superseded generations. */
  def vacuum(name: String, retainSnapshots: Int = 1): Unit = {
    require(retainSnapshots >= 1, "must retain at least the current snapshot")
    latestManifest(name).foreach { m =>
      val dir = tableDir(name)
      val f = fs(dir)
      val keepFrom = m.version - (retainSnapshots - 1)
      val retained = (keepFrom to m.version).flatMap(manifestAt(name, _))
      // qualify both sides — listStatus returns scheme-qualified paths
      // (file:/...), a bare string compare would mark everything dead
      val own = retained
        .flatMap(r => r.buckets.values ++ r.logs ++
          r.tombs.values.flatten.map(_._2)) // tombstone sidecars are data too
        .filterNot(_.startsWith("@")) // borrowed refs live under their owner
        .map(d => f.makeQualified(new Path(dir, d)).toString).toSet
      // dirs of THIS table still referenced by OTHER tables' on-disk
      // manifests (zero-copy clones, X221): every borrower's ref names
      // the original owner (`@<name>/<rel>`), so one marker scan over
      // sibling manifests finds every outstanding borrow. ALL on-disk
      // manifests count, not just each sibling's latest — any of them
      // can still be read (readAt) or restored.
      val marker = s"@$name/"
      val rootP = new Path(root)
      val borrowed = fs(rootP).listStatus(rootP).toSeq
        .filter(_.isDirectory).map(_.getPath.getName)
        .filterNot(_ == name)
        .flatMap(t => snapshots(t).flatMap(v => manifestAt(t, v)))
        .flatMap(r => r.buckets.values ++ r.logs ++
          r.tombs.values.flatten.map(_._2)) // cloned tombstone refs too
        .filter(_.startsWith(marker))
        .map(d => f.makeQualified(new Path(dir, d.stripPrefix(marker))).toString)
        .toSet
      val live = own ++ borrowed
      val dataDir = new Path(dir, "data")
      if (f.exists(dataDir))
        f.listStatus(dataDir).foreach { st =>
          if (!live.contains(st.getPath.toString)) f.delete(st.getPath, true)
        }
      f.listStatus(dir).foreach(st => st.getPath.getName match {
        case ManifestName(n) if n.toInt < keepFrom => f.delete(st.getPath, false)
        case n if n.startsWith("stage-") || n.endsWith(".tmp") => f.delete(st.getPath, true)
        case _ => ()
      })
    }
  }

  // ----------------------------------------------------------------
  // Table lifecycle (the catalog surface: SHOW/DROP/RENAME)
  // ----------------------------------------------------------------

  /** Immutable per-table SHAPE sidecar (X243 — what makes one catalog
    * serve differently-shaped tables): `props.txt` under the table
    * dir, `k=v` lines, written ONCE before the table's first commit
    * (a crash between leaves an orphan sidecar under a table that
    * does not exist yet — the next CREATE overwrites it). Shape is
    * immutable by design: key/bucket changes migrate through
    * [[rebuild]], the same discipline as bucket-column type drift. */
  def writeTableProps(name: String, props: Map[String, String]): Unit = {
    require(props.forall { case (k, v) =>
      k.matches("[A-Za-z0-9_.]+") && !v.contains("\n") && !v.contains("\r") },
      s"table property keys must be [A-Za-z0-9_.]+ and values line-free: $props")
    val p = new Path(tableDir(name), "props.txt")
    val out = fs(p).create(p, true)
    try out.write(props.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The table's recorded shape properties — empty for tables created
    * before (or without) the DDL surface. */
  def tableProps(name: String): Map[String, String] = {
    val p = new Path(tableDir(name), "props.txt")
    val f = fs(p)
    if (!f.exists(p)) return Map.empty
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    text.linesIterator.map(_.trim).filter(_.nonEmpty).map { l =>
      val Array(k, v) = l.split("=", 2); k -> v
    }.toMap
  }

  /** CREATE TABLE: commit generation 0 carrying the declared schema
    * and zero rows. With `keyed` set (the upsert-key column) it
    * commits as an empty BUCKET generation — the table is keyed from
    * birth: upserts, MERGE and keyed deletes work before the first
    * row lands; keyless it commits an append-log generation. Either
    * way the schema reads back from a footer-only file, atomically. */
  def createTable(name: String, schema: StructType,
      keyed: Option[String] = None): Unit = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema).repartition(1)
    keyed match {
      case Some(k) =>
        require(schema.fieldNames.contains(k),
          s"upsert key '$k' is not a column of the declared schema: " +
            schema.fieldNames.mkString(", "))
        clusterColumn.foreach(cc => require(schema.fieldNames.contains(cc),
          s"cluster column '$cc' is not a column of the declared schema"))
        val prev = latestManifest(name)
        val v = prev.map(_.version + 1).getOrElse(0)
        val rel = s"data/b0-g$v"
        writeDir(empty, new Path(tableDir(name), rel).toString)
        // On an EXISTING table (the TRUNCATE path — DDL create refuses
        // existing tables upstream) the streaming batch high-water mark
        // and the recorded bucket fan-out CARRY: dropping the mark
        // would let a crash-replayed streaming epoch re-insert an
        // already-committed batch into the truncated table (the same
        // reason replace/compactLogs carry it), and the fan-out is the
        // table's declared shape, which truncation preserves.
        commit(name, Manifest(v, Map(0L -> rel), Nil,
          prev.flatMap(_.lastBatch),
          fanout = Some(prev.flatMap(_.fanout).getOrElse(numBuckets))))
      case None => append(name, empty)
    }
  }

  /** Tables under this store root: directories holding at least one
    * committed manifest — metadata-only (one listing + one manifest
    * existence probe per dir, no data touched). */
  def tableNames: Seq[String] = {
    val rootP = new Path(root)
    val f = fs(rootP)
    if (!f.exists(rootP)) return Nil
    f.listStatus(rootP).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(t => snapshots(t).nonEmpty).sorted
  }

  /** (bucket-dir count, log-dir count) of the current snapshot — the
    * table-ROLE probe (keyed upsert target vs append log) the SQL
    * surfaces need before choosing a commit family. Metadata-only. */
  def tableKind(name: String): Option[(Int, Int)] =
    latestManifest(name).map(m => (m.buckets.size, m.logs.size))

  /** Tables whose on-disk manifests BORROW generation dirs from
    * `name` (zero-copy clones, X221 — refs spell `@name/<rel>`).
    * Same marker scan as [[vacuum]]'s cross-table keep set; ALL
    * retained manifests count, since any of them can still be read
    * or restored. */
  def borrowers(name: String): Seq[String] = {
    val marker = s"@$name/"
    val rootP = new Path(root)
    val f = fs(rootP)
    if (!f.exists(rootP)) return Nil
    f.listStatus(rootP).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(_ == name)
      .filter(t => snapshots(t).flatMap(v => manifestAt(t, v))
        .exists(m => (m.buckets.values ++ m.logs ++
          m.tombs.values.flatten.map(_._2)).exists(_.startsWith(marker))))
      .sorted
  }

  /** DROP TABLE: every manifest and data dir, physically. Refuses
    * while zero-copy clones still borrow this table's generation
    * dirs — dropping the owner would silently break every borrower's
    * reads (drop or [[rebuild]] the borrowers first; their refs
    * resolve against the OWNER's name). Returns false when the table
    * never existed (the [[org.apache.spark.sql.connector.catalog
    * .TableCatalog.dropTable]] contract). */
  def dropTable(name: String): Boolean = {
    if (latestManifest(name).isEmpty) return false
    val bs = borrowers(name)
    require(bs.isEmpty,
      s"cannot drop '$name': ${bs.mkString(", ")} still reference its " +
        "generation dirs (zero-copy clones) — drop or rebuild the " +
        "borrowers first")
    val dir = tableDir(name)
    fs(dir).delete(dir, true)
  }

  /** RENAME TABLE: ONE filesystem rename of the table dir — manifest
    * entries are table-relative, so every committed snapshot survives
    * under the new name, including time travel. Refuses when the
    * target exists and when borrowers reference the OLD name (their
    * `@from/...` refs would dangle); a table that itself borrows
    * renames freely — its refs name the original owners. */
  def renameTable(from: String, to: String): Unit = {
    require(latestManifest(from).isDefined, s"no such table: $from")
    val toDir = tableDir(to)
    require(!fs(toDir).exists(toDir), s"rename target '$to' already exists")
    val bs = borrowers(from)
    require(bs.isEmpty,
      s"cannot rename '$from': ${bs.mkString(", ")} still reference its " +
        "generation dirs (zero-copy clones) — their @$from/ refs would dangle")
    val fromDir = tableDir(from)
    if (!fs(fromDir).rename(fromDir, toDir))
      throw new java.io.IOException(s"table rename failed: $from -> $to")
  }
}

/** Partitioned-read spec for JDBC scans: Spark issues `numPartitions`
  * range-sliced queries on `column` instead of one single-connection
  * full-table scan — without this, a 100 TB warehouse table funnels
  * through one task. */
final case class JdbcPartitioning(
    column: String,
    lowerBound: Long,
    upperBound: Long,
    numPartitions: Int,
)

/** JDBC store: the production shape matching the reference's MySQL
  * sinks (lambda.py:163-190). Untestable in this sandbox (no DB), kept
  * thin and obvious; the option plumbing is pure and unit-tested. */
class JdbcStore( // non-final: the rename seam below is a test override point
    url: String,
    props: java.util.Properties,
    partitioning: Option[JdbcPartitioning] = None,
    renameSwap: Boolean = true, // test seam: false forces the DELETE+INSERT fallback
)(implicit spark: SparkSession)
    extends TableStore {

  /** The exact option map handed to the JDBC source — exposed so the
    * partitioned-read plumbing is testable without a database. */
  def readOptions(name: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val base = Map("url" -> url, "dbtable" -> name) ++
      props.stringPropertyNames.asScala.map(k => k -> props.getProperty(k))
    base ++ partitioning.fold(Map.empty[String, String]) { pt =>
      Map(
        "partitionColumn" -> pt.column,
        "lowerBound" -> pt.lowerBound.toString,
        "upperBound" -> pt.upperBound.toString,
        "numPartitions" -> pt.numPartitions.toString,
      )
    }
  }

  override def read(name: String): Option[DataFrame] =
    try Some(spark.read.format("jdbc").options(readOptions(name)).load())
    catch { case _: Exception => None } // missing table → None (lambda.py:177-178)

  override def append(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, name, props)

  private def withConnection[T](f: java.sql.Connection => T): T = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  private def dropIfExists(conn: java.sql.Connection, table: String): Unit =
    try { conn.createStatement().execute(s"DROP TABLE $table"); () }
    catch { case _: java.sql.SQLException => () } // absent → nothing to drop

  private def tableExistsOn(conn: java.sql.Connection, table: String): Boolean =
    try { conn.createStatement().executeQuery(s"SELECT * FROM $table WHERE 1=0").close(); true }
    catch { case _: java.sql.SQLException => false }

  /** Test seam: one RENAME statement. Strand-recovery tests override
    * this to commit-then-die on the second rename — simulating an
    * autocommitting-DDL dialect (MySQL) where a failure between the
    * two renames cannot be rolled back and the live table is left
    * under `_graft_replace_old` — without needing that engine here
    * (Derby DDL is transactional, so the natural path can't reach
    * the recovery branch). */
  protected def renameTable(conn: java.sql.Connection,
      from: String, to: String): Unit = {
    conn.createStatement().execute(s"RENAME TABLE $from TO $to")
    ()
  }

  /** Column names of a live table, in its physical order — read from
    * the zero-row result's metadata, so it works on any dialect. */
  private def columnsOf(conn: java.sql.Connection, table: String): Seq[String] = {
    val rs = conn.createStatement().executeQuery(s"SELECT * FROM $table WHERE 1=0")
    try {
      val md = rs.getMetaData
      (1 to md.getColumnCount).map(md.getColumnName)
    } finally rs.close()
  }

  /** K3/K4 full replace, STAGED: the naive `mode(Overwrite).jdbc`
    * truncates the live table and repopulates it row by row — a
    * concurrent reader in that window sees an empty or partial
    * warehouse table (docs/SCALE.md §8 item 1; the reference has the
    * same gap, lambda.py:184-190). Here the new content lands fully
    * in `<name>_graft_replace_stage` first, then swaps in via TWO
    * RENAMEs INSIDE ONE TRANSACTION (DDL is transactional on Derby/
    * Postgres-family engines) — a reader is either before the commit
    * (complete old table) or after it (complete new table), never in
    * between. Dialects whose RENAME cannot ride a transaction
    * (MySQL autocommits DDL — though its multi-name `RENAME TABLE a
    * TO b, c TO a` is itself atomic) fall back to DELETE+INSERT-
    * SELECT in one transaction: same no-gap guarantee through the
    * engine's isolation instead of the catalog. The staging also
    * makes self-replace safe (a plan reading `name` while replacing
    * it) — the read materializes into the stage before the target is
    * touched. First write of a table skips the dance: there is no
    * reader-visible gap on a table that doesn't exist yet. */
  override def replace(name: String, df: DataFrame): Unit = {
    if (read(name).isEmpty) {
      df.write.mode(SaveMode.Overwrite).jdbc(url, name, props)
      return
    }
    val stage = name + "_graft_replace_stage"
    val old = name + "_graft_replace_old"
    withConnection { conn =>
      // crash debris from a previous attempt: the live table exists,
      // so any leftover stage/old tables are safe to clear
      dropIfExists(conn, stage)
      dropIfExists(conn, old)
    }
    df.write.mode(SaveMode.Overwrite).jdbc(url, stage, props)
    withConnection { conn =>
      conn.setAutoCommit(false)
      val swapped = renameSwap && {
        try {
          renameTable(conn, name, old)
          renameTable(conn, stage, name)
          conn.commit()
          true
        } catch {
          case _: java.sql.SQLException =>
            conn.rollback()
            // a dialect whose RENAME autocommits strands the live table
            // under `old` when the SECOND rename fails (the rollback
            // undoes nothing) — put it back before any fallback, which
            // targets `name`
            if (!tableExistsOn(conn, name) && tableExistsOn(conn, old)) {
              renameTable(conn, old, name)
              conn.commit()
            }
            false
        }
      }
      if (!swapped) {
        // transactional-RENAME-less dialect: one DELETE + INSERT-SELECT
        // transaction — readers under READ COMMITTED (or stricter)
        // never observe the in-between state. Only sound when live and
        // stage agree on COLUMNS: replace semantics allow a schema
        // change, and a positional SELECT * would silently transpose
        // same-typed columns — the column list is explicit and checked.
        val liveCols = columnsOf(conn, name)
        val stageCols = columnsOf(conn, stage)
        if (liveCols.map(_.toLowerCase).sorted == stageCols.map(_.toLowerCase).sorted) {
          val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
          val cols = liveCols.map(dialect.quoteIdentifier).mkString(", ")
          val st = conn.createStatement()
          st.executeUpdate(s"DELETE FROM $name")
          st.executeUpdate(s"INSERT INTO $name ($cols) SELECT $cols FROM $stage")
          conn.commit()
          conn.setAutoCommit(true)
        } else {
          // schema changed AND the transactional swap was refused: no
          // gap-free path exists on this dialect — honest degrade to
          // drop + publish (the pre-staging replace semantics, with
          // the gap bounded to two DDL statements, never a silently
          // transposed table)
          conn.setAutoCommit(true)
          dropIfExists(conn, name)
          val renamed =
            try { conn.createStatement().execute(s"RENAME TABLE $stage TO $name"); true }
            catch { case _: java.sql.SQLException => false }
          if (!renamed) df.write.mode(SaveMode.Overwrite).jdbc(url, name, props)
        }
      } else conn.setAutoCommit(true)
      // post-commit cleanup; a crash here leaves only debris tables,
      // cleared by the next replace
      dropIfExists(conn, old)
      dropIfExists(conn, stage)
    }
  }

  /** The trait's read-merge-replace default is UNSAFE over JDBC: the
    * read is lazy, so the overwrite truncates the target while the
    * merge plan still needs to scan it — the incoming batch would
    * silently win the whole table. Same self-overwrite hazard the file
    * stores solve with a staging dir; here the stage is a real table:
    * merged rows land in `<name>_graft_stage` (materializing the read
    * of the live target), the target is then rewritten FROM the stage,
    * and the stage is dropped. */
  override def upsert(name: String, incoming: DataFrame, key: String)(implicit s: SparkSession): Unit =
    read(name) match {
      case None => replace(name, incoming)
      case Some(existing) =>
        val stage = name + "_graft_stage"
        graft.ops.Upsert.upsert(existing, incoming, key)
          .write.mode(SaveMode.Overwrite).jdbc(url, stage, props)
        replace(name, spark.read.format("jdbc").options(readOptions(stage)).load())
        val conn = java.sql.DriverManager.getConnection(url, props)
        try conn.createStatement().execute(s"DROP TABLE $stage")
        catch { case _: java.sql.SQLException => () } // best-effort cleanup
        finally conn.close()
    }
}
