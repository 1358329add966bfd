package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("same-bucketed tables sort-merge-join with zero exchanges") {
    val spark2 = spark
    import spark2.implicits._
    // bucketed joins need SMJ, not broadcast — force it for the test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice")
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      Bucketing.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 4)
      Bucketing.writeBucketed(orders, "b_orders", "l_orderkey", 4)

      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
      joined.collect() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n${plan.take(800)}")

      // identical result to the plain (shuffling) join
      val plain = lineitem.join(orders, "l_orderkey")
      assert(joined.count() == plain.count())
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange") || plainPlan.contains("ShuffleQueryStage"),
        "control: the unbucketed join DOES shuffle")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
