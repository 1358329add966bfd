package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: runs one catalog query and prints how many
  * times the executed (AQE-final) plan reuses exchanges/stages —
  * the evidence that repartition-based subtree sharing kicked in. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q24_clean_corpus"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    val n = df.collect().length
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"rows=$n")
    val plan = df.queryExecution.executedPlan.toString
    val reused = plan.linesIterator.count(l => l.contains("Reused"))
    val exchanges = plan.linesIterator.count(l => l.trim.startsWith("Exchange") || l.contains("ShuffleQueryStage"))
    println(s"PLANCHECK name=$name sec=$sec reused=$reused exchanges=$exchanges")
    spark.stop()
  }
}
