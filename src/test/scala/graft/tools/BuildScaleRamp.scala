package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builds the suffix-family scale-ramp corpora under /tmp: the sf0.1
  * documents table replicated ×2 and ×3 with offset doc_ids and a
  * per-copy token suffix (`regexp_replace` appends `zzN` to every
  * token of copy N > 0), so each copy keeps the SAME internal repeat
  * structure while sharing no tokens — and therefore no spurious
  * cross-copy repeats — with the others. That makes output size scale
  * with the factor (each copy mines its own repeats) while input
  * scale stresses the global suffix sort/LCP machinery, which is what
  * the SCALE.md §14 ramp measures. nation.parquet is copied for the
  * bench warmup scan. Writes only under /tmp; testdata stays
  * untouched.
  */
object BuildScaleRamp {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    for (factor <- Seq(2, 3)) {
      val out = s"/tmp/graft_sf0.$factor"
      val copies = (0 until factor).map { c =>
        if (c == 0) docs
        else docs
          .withColumn("doc_id", col("doc_id") + lit(c * 10000000L))
          .withColumn("text",
            regexp_replace(col("text"), "(\\S+)", s"$$1zz$c"))
      }
      copies.reduce(_ unionByName _)
        .repartition(16)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      spark.read.parquet(s"$src/nation.parquet")
        .write.mode("overwrite").parquet(s"$out/nation.parquet")
      println(s"built $out: ${spark.read.parquet(s"$out/documents.parquet").count()} docs")
    }
    spark.stop()
  }
}
