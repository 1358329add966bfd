package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

class AvroIoSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_").toString

  test("round-trip: primitives, nulls, arrays, nested structs") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = false),
      StructField("flag", BooleanType, nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = false),
        nullable = true),
      StructField("blob", BinaryType, nullable = true),
      StructField("inner", StructType(Seq(
        StructField("a", IntegerType, nullable = false),
        StructField("b", StringType, nullable = true),
      )), nullable = true),
    ))
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, Seq("x", "y"),
        Array[Byte](1, 2, 3), Row(7, "in")),
      Row(2L, null, -0.25, false, null, null, Row(8, null)),
      Row(3L, "gamma", 0.0, true, Seq.empty[String],
        Array.empty[Byte], null),
    )
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmpDir()
    AvroIo.write(df, dir)
    val back = AvroIo.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val a = df.orderBy("id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    })
    val b = back.orderBy("id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    })
    assert(a.toSeq == b.toSeq)
  }

  test("read is distributed: multi-partition write yields one container each") {
    val df = (1 to 1000).map(i => (i.toLong, s"doc$i")).toDF("id", "t")
      .repartition(4)
    val dir = tmpDir()
    AvroIo.write(df, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 4, files.map(_.getName).toSeq)
    val back = AvroIo.read(spark, dir)
    assert(back.count() == 1000)
    assert(back.agg(sum("id")).head.getLong(0) == 500500L)
  }

  test("lineitem slice survives the trip bit-for-bit") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_orderkey", $"l_quantity", $"l_returnflag")
    val dir = tmpDir()
    AvroIo.write(li, dir)
    val back = AvroIo.read(spark, dir)
    val a = li.groupBy("l_returnflag")
      .agg(graft.Tables.dsum($"l_quantity").as("q"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect().map(_.toSeq)
    val b = back.groupBy("l_returnflag")
      .agg(graft.Tables.dsum($"l_quantity").as("q"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("formatOf routes .avro and Readers.read aligns the contract schema") {
    val df = Seq((5L, "x"), (6L, "y")).toDF("id", "t").coalesce(1)
    val dir = tmpDir()
    AvroIo.write(df, dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).head.getPath
    assert(Readers.formatOf(spark, f) == Readers.Avro)
    val schema = StructType(Seq(
      StructField("t", StringType), StructField("id", LongType)))
    val got = Readers.read(spark, f, schema)
    assert(got.schema.fieldNames.toSeq == Seq("t", "id"))
    assert(got.count() == 2)
  }

  test("temporal logical types round-trip exactly (date, micros, ntz)") {
    import java.time.{Instant, LocalDate, LocalDateTime}
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("ntz", TimestampNTZType, nullable = true),
    ))
    val rows = Seq(
      Row(1L, LocalDate.of(1969, 12, 31), // pre-epoch
        Instant.parse("1969-12-31T23:59:59.123456Z"),
        LocalDateTime.of(1969, 12, 31, 23, 59, 59, 123456000)),
      Row(2L, LocalDate.of(1970, 1, 1),
        Instant.EPOCH,
        LocalDateTime.of(1970, 1, 1, 0, 0)),
      Row(3L, LocalDate.of(2096, 2, 29), // leap day, far future
        Instant.parse("2096-02-29T12:34:56.999999Z"),
        LocalDateTime.of(2096, 2, 29, 12, 34, 56, 999999000)),
      Row(4L, null, null, null),
    )
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmpDir()
    AvroIo.write(df, dir)
    val back = AvroIo.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // compare as rendered micros/days — engine-independent view
    def render(f: org.apache.spark.sql.DataFrame) =
      f.select(col("id"), datediff(col("d"), lit("1970-01-01")).as("days"),
          unix_micros(col("ts")).as("us"),
          unix_micros(col("ntz").cast("timestamp")).as("nus"))
        .orderBy("id").collect().map(_.toSeq).toSeq
    assert(render(back) == render(df))
  }

  test("lineitem l_shipdate (timestamp[us]) survives the avro trip") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_orderkey", $"l_shipdate",
        to_date($"l_shipdate").as("l_shipday"))
    val dir = tmpDir()
    AvroIo.write(li, dir)
    val back = AvroIo.read(spark, dir)
    def agg(f: org.apache.spark.sql.DataFrame) =
      f.agg(count(lit(1)), min($"l_shipdate"), max($"l_shipdate"),
          min($"l_shipday"), max($"l_shipday"))
        .collect().map(_.toSeq).toSeq
    assert(agg(back) == agg(li))
  }

  test("task commit: leftover attempt temps are invisible; _SUCCESS lands") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "t").coalesce(1)
    val dir = tmpDir()
    AvroIo.write(df, dir)
    assert(new java.io.File(dir, "_SUCCESS").exists())
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.endsWith(".tmp")), "no temp residue after commit")
    // a torn attempt file from a crashed task must not corrupt reads
    val torn = new java.io.File(dir, ".part-00099-attempt-7.avro.tmp")
    java.nio.file.Files.write(torn.toPath, Array[Byte](1, 2, 3))
    assert(AvroIo.read(spark, dir).count() == 2)
  }

  test("unsupported types are refused loudly, not mangled") {
    val e1 = intercept[IllegalArgumentException] {
      AvroIo.toAvroSchema(StructType(Seq(
        StructField("m", DecimalType(18, 2)))))
    }
    assert(e1.getMessage.contains("avro matrix"))
  }
}
