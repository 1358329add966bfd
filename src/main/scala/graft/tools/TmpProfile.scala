package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the suffix-rank family — delete before commit. */
object TmpProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warmup
    docs.groupBy().count().collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("q50 crossDocRepeats w=4 full") {
      graft.llm.SuffixRank.crossDocRepeats(docs, "doc_id", "text", 4).count()
    }
    val slice = docs.filter(col("doc_id") % 5 === 0)
    time("q51 maximalCrossDocRepeats full") {
      graft.llm.SuffixRank.maximalCrossDocRepeats(slice, "doc_id", "text", 4).count()
    }
    time("q51 suffixRanks only") {
      graft.llm.SuffixRank.suffixRanks(slice, "doc_id", "text").count()
    }
    spark.stop()
  }
}
