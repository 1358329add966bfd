package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot artifact generator for [[graft.llm.PqModel]]: per
  * subvector, k-means over the sf0.01 embeddings' 8-dim slices
  * (reusing Ivf.train — a PQ codebook IS a k-means quantizer per
  * subspace), printed as Scala source at 8 decimals so Scala and
  * DuckDB parse bit-identical doubles (the IvfModel recipe).
  * Re-run only to regenerate the frozen model; q95 never trains.
  */
object TrainPqCodebooks {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("e"))
    val M = graft.llm.PqModel.m
    val sub = graft.llm.PqModel.sub
    val K = graft.llm.PqModel.k
    for (mm <- 0 until M) {
      val slice = emb.select(col("vec_id"),
        org.apache.spark.sql.functions.slice(col("e"), mm * sub + 1, sub).as("s"))
      val cents = graft.llm.Ivf.train(slice, "vec_id", "s", k = K, iters = 3)
      println(s"    // subvector $mm")
      println("    Array(")
      cents.orderBy("cell").collect().foreach { r =>
        val vals = r.getSeq[Double](1).map(d => f"$d%.8f").mkString(", ")
        println(s"      Array($vals),")
      }
      println("    ),")
    }
    spark.stop()
  }
}
