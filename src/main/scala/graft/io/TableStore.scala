package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

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

/** Key-bucketed parquet store: each table is laid out as
  * `<root>/<name>/graft_bucket=<b>/` with b = pmod(xxhash64(key), n).
  * [[upsert]] rewrites ONLY the buckets the incoming batch touches —
  * an O(batch)-cost upsert against an O(table)-size target, which is
  * the difference between "works" and "melts" at 100 TB (docs/SCALE.md
  * §2). Everything else behaves like [[ParquetDirStore]]; the bucket
  * column is internal and never surfaces to readers. */
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
final class JdbcStore(
    url: String,
    props: java.util.Properties,
    partitioning: Option[JdbcPartitioning] = None,
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

  override def replace(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, name, props)
}
