package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profiles nulls, distincts, min/max and exact sums per column") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1.25), (2L, 1.25), (2L, null), (null, 2.5),
    ).toDF("a", "b")
    val out = Profile.numeric(df, Seq("a", "b")).orderBy("col_name").collect()
    val a = out(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 4L && a.getLong(2) == 1L &&
      a.getLong(3) == 2L && a.getDouble(4) == 1.0 && a.getDouble(5) == 2.0 &&
      a.getDouble(6) == 5.0)
    val b = out(1)
    assert(b.getString(0) == "b" && b.getLong(1) == 4L && b.getLong(2) == 1L &&
      b.getLong(3) == 2L && b.getDouble(4) == 1.25 && b.getDouble(5) == 2.5 &&
      b.getDouble(6) == 5.0)
  }

  // The reason the histogram key is DECIMAL(38,18) and not double:
  // 2^53 and 2^53+1 are the same double but distinct int64s.
  test("distinct count survives bigints above 2^53") {
    val big = 1L << 53
    val df = Seq(big, big + 1, big + 1).toDF("a")
    val out = Profile.numeric(df, Seq("a")).collect().head
    assert(out.getLong(3) == 2L, "2^53 and 2^53+1 must stay distinct")
    assert(out.getLong(1) == 3L && out.getLong(2) == 0L)
  }

  test("empty input still yields one row per requested column") {
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("a", LongType), StructField("b", DoubleType))))
    val out = Profile.numeric(df, Seq("a", "b")).orderBy("col_name").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L)
      assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
    }
  }
}
