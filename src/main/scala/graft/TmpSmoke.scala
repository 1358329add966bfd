package graft
import org.apache.spark.sql.SparkSession

object TmpSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("SMOKE_ROWS=" + SparkEntry.entry(spark).count())
    spark.stop()
  }
}
