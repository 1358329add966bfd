package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-pass timer: runs the named catalog queries N times in
  * one session, printing EVERY pass (Bench reports only medians), so
  * fixture-build vs serve cost separates visibly — the q149/q156
  * memoization discipline is auditable per query. */
object PassTimer {
  def main(args: Array[String]): Unit = {
    val names = (if (args.nonEmpty) args(0) else "q166_antientropy_repair")
      .split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = java.nio.file.Files.createTempDirectory("graft_pt_").toString
    for (p <- 1 to passes; q <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$sink/$q")
      println(f"$q pass $p: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
