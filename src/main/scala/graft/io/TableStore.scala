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
}

/** Parquet-directory store: each table is `<root>/<name>` (a parquet
  * dir). Stands in for MySQL in tests; also a perfectly good lake
  * layout on its own. */
final class ParquetDirStore(root: String)(implicit spark: SparkSession) extends TableStore {

  private def path(name: String) = s"$root/$name"

  override def read(name: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(path(name))) else None
  }

  override def append(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path(name))

  override def replace(name: String, df: DataFrame): Unit = {
    // The incoming plan may read the same table (upsert reads sales_tgt
    // then replaces it) — self-overwrite would clobber input files mid
    // read, so land in a staging dir and swap atomically-ish.
    val p = new org.apache.hadoop.fs.Path(path(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new org.apache.hadoop.fs.Path(path(name) + "_stage")
    df.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    if (fs.exists(p)) fs.delete(p, true)
    fs.rename(stage, p)
  }
}

/** JDBC store: the production shape matching the reference's MySQL
  * sinks (lambda.py:163-190). Untestable in this sandbox (no DB), kept
  * thin and obvious. */
final class JdbcStore(url: String, props: java.util.Properties)(implicit spark: SparkSession)
    extends TableStore {

  override def read(name: String): Option[DataFrame] =
    try Some(spark.read.jdbc(url, name, props).cache())
    catch { case _: Exception => None } // missing table → None (lambda.py:177-178)

  override def append(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, name, props)

  override def replace(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, name, props)
}
