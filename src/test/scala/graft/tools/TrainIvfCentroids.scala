package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot artifact generator for [[graft.llm.IvfModel]]: runs
  * Ivf.train on the sf0.01 embeddings table and prints the centroid
  * matrix as Scala source (8 decimal places — both Scala and DuckDB
  * parse the decimal string to the same nearest double, which is what
  * keeps the q21 oracle bit-exact). Re-run only to regenerate the
  * frozen model; q21 itself never trains.
  */
object TrainIvfCentroids {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val cents = graft.llm.Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    cents.orderBy("cell").collect().foreach { r =>
      val vals = r.getSeq[Double](1).map(d => f"$d%.8f").mkString(", ")
      println(s"    Array($vals),")
    }
    spark.stop()
  }
}
