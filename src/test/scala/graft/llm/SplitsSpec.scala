package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("split is total, stable across runs, and roughly proportioned") {
    val df = spark.range(10000).toDF("id")
    val a = Splits.withSplit(df, "id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Splits.withSplit(df, "id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b) // deterministic
    assert(a.values.sum == 10000)
    assert(math.abs(a("train") - 9000) < 300, a.toString) // hash-uniformity
    assert(math.abs(a("val") - 500) < 150 && math.abs(a("test") - 500) < 150, a)
  }

  test("different salts give independent splits; same salt identical") {
    val df = spark.range(2000).toDF("id")
    val s1 = Splits.withSplit(df, "id", salt = "a").select("id", "split")
      .as[(Long, String)].collect().toMap
    val s1b = Splits.withSplit(df, "id", salt = "a").select("id", "split")
      .as[(Long, String)].collect().toMap
    val s2 = Splits.withSplit(df, "id", salt = "b").select("id", "split")
      .as[(Long, String)].collect().toMap
    assert(s1 == s1b)
    val agree = s1.count { case (k, v) => s2(k) == v }.toDouble / s1.size
    assert(agree < 0.95, s"salted splits should differ: agreement $agree")
  }

  test("weights normalize and honor order") {
    val df = spark.range(5000).toDF("id")
    val counts = Splits.withSplit(df, "id", weights = Seq("x" -> 3.0, "y" -> 1.0))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("x") - 3750) < 200, counts.toString)
  }
}
