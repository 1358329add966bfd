package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Lake file lifecycle ops: parquet landing (K1), quarantine move (K5),
  * raw delete (K6) — /root/reference/lambda.py:123-158,196-202.
  */
object FileOps {

  /** One run timestamp, threaded through every sink — fixes the
    * reference's double-stamp quirk where quarantine and parquet paths
    * each call now() and can land in different-second folders
    * (lambda.py:126 vs :146). */
  def runStamp(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())

  def baseName(path: String): String = new Path(path).getName

  def stripExtension(name: String): String = {
    val i = name.lastIndexOf('.')
    if (i > 0) name.substring(0, i) else name
  }

  /** K1: land the validated batch as parquet under
    * `<lake>/processed/<stamp>/<base>` (lambda.py:141-158). */
  def writeProcessed(df: DataFrame, lake: String, stamp: String, sourcePath: String): String = {
    val dest = s"$lake/processed/$stamp/${stripExtension(baseName(sourcePath))}"
    df.write.mode(SaveMode.Overwrite).parquet(dest)
    dest
  }

  /** K5: move a rejected file to `<lake>/quarantine/<stamp>/<base>`.
    * Failures are logged, not raised — matches the reference's
    * swallow-and-continue (lambda.py:138-139). Returns the destination
    * on success. */
  def quarantine(spark: SparkSession, sourcePath: String, lake: String, stamp: String): Option[String] =
    try {
      val src = new Path(sourcePath)
      val dest = new Path(s"$lake/quarantine/$stamp/${src.getName}")
      val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(dest.getParent)
      if (!fs.rename(src, dest)) {
        // cross-filesystem: copy + delete
        org.apache.hadoop.fs.FileUtil.copy(
          src.getFileSystem(spark.sparkContext.hadoopConfiguration), src,
          fs, dest, true, spark.sparkContext.hadoopConfiguration)
      }
      Some(dest.toString)
    } catch {
      case e: Exception =>
        System.err.println(s"[graft] quarantine of $sourcePath failed: ${e.getMessage}")
        None
    }

  /** K6: delete the raw file after successful processing; errors
    * swallowed (lambda.py:196-202). */
  def deleteRaw(spark: SparkSession, sourcePath: String): Boolean =
    try {
      val p = new Path(sourcePath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
    } catch {
      case e: Exception =>
        System.err.println(s"[graft] delete of $sourcePath failed: ${e.getMessage}")
        false
    }
}
