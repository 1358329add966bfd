package graft.io

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Isolation probe for the executor-side delta parquet writer. */
class DeltaWriterProbeSpec extends SparkSpec {

  test("writer round-trips ops, longs, strings and nulls") {
    val scratch = tmpDir("delta_probe_")
    val rowSchema = StructType(Seq(
      StructField("uuid", LongType, nullable = false),
      StructField("v", LongType),
      StructField("tag", StringType)))
    val outSchema = StructType(
      StructField("graft_op_", IntegerType, nullable = false) +: rowSchema.fields)
    val box = org.apache.spark.sql.GraftBridge.confBox(spark)
    val wc = GraftDeltaWrite.parquetWriterConf()
    val w = new GraftDeltaWriter(scratch, rowSchema, outSchema, 0, box, wc, 0, 7L)
    (0 until 100).foreach { i =>
      w.insert(InternalRow(i.toLong, i * 2L, UTF8String.fromString(s"t$i")))
    }
    (0 until 30).foreach { i =>
      w.delete(null, InternalRow((1000 + i).toLong))
    }
    val msg = w.commit().asInstanceOf[GraftDeltaFiles]
    assert(msg.files.size == 1)
    val back = spark.read.schema(outSchema).parquet(msg.files.head)
    assert(back.count() == 130)
    import org.apache.spark.sql.functions.col
    assert(back.filter(col("graft_op_") === 0).count() == 30)
    val r = back.filter(col("uuid") === 42L).head()
    assert(r.getInt(0) == 1 && r.getLong(2) == 84L && r.getString(3) == "t42")
    val d = back.filter(col("uuid") === 1005L).head()
    assert(d.getInt(0) == 0 && d.isNullAt(2) && d.isNullAt(3))
  }
}
