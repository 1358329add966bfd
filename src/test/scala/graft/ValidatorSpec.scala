package graft

import org.apache.spark.sql.types.{DateType, DoubleType, LongType}

import graft.io.Readers
import graft.schema.SalesSchema
import graft.validate.Validator

class ValidatorSpec extends SparkSpec {

  private def readCsv(path: String) =
    Readers.csv(spark, path, SalesSchema.rawStructType)

  test("V1-V4: a clean batch validates and comes back typed") {
    val p = TestSales.writeCsv(tmpDir("val") + "/good.csv", 50)
    val r = Validator.validate(readCsv(p))
    assert(r.isValid, r.errors)
    assert(r.typed.schema("OrderDate").dataType == DateType)
    assert(r.typed.schema("ShipDate").dataType == DateType)
    assert(r.typed.schema("UnitsSold").dataType == LongType)
    assert(r.typed.schema("TotalProfit").dataType == DoubleType)
    assert(r.typed.count() == 50)
  }

  test("V1: missing required column is reported") {
    val dir = tmpDir("val")
    TestSales.writeCsv(s"$dir/h.csv", 5)
    // drop the last column (TotalProfit) from header and rows
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(s"$dir/h.csv"))
    val cut = new java.util.ArrayList[String]()
    lines.forEach(l => cut.add(l.substring(0, l.lastIndexOf(','))))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/miss.csv"), cut)
    val raw = spark.read.option("header", "true").csv(s"$dir/miss.csv")
    val r = Validator.validate(raw)
    assert(r.errors.exists(_.contains("TotalProfit")))
  }

  test("V2: non-numeric measure cell is reported") {
    val p = TestSales.writeCsv(tmpDir("val") + "/bad_num.csv", 10,
      mutate = row => if (row.startsWith("100000003")) {
        val f = row.split(","); f(8) = "not_a_number"; f.mkString(",")
      } else row)
    val r = Validator.validate(readCsv(p))
    assert(r.errors.exists(e => e.contains("UnitsSold") && e.contains("numeric")))
  }

  test("V3: bad date format (13/45/2016) is reported") {
    val p = TestSales.writeCsv(tmpDir("val") + "/bad_date.csv", 10,
      mutate = row => if (row.startsWith("100000004")) {
        val f = row.split(","); f(5) = "13/45/2016"; f.mkString(",")
      } else row)
    val r = Validator.validate(readCsv(p))
    assert(r.errors.exists(e => e.contains("OrderDate") && e.contains("date")))
  }

  test("V4: duplicated uuid within the batch is reported") {
    val p = TestSales.writeCsv(tmpDir("val") + "/dup.csv", 10,
      mutate = row => row.replaceFirst("^100000007", "100000001"))
    val r = Validator.validate(readCsv(p))
    assert(r.errors.exists(_.contains("Duplicate")))
  }

  test("row-grain mode splits good and bad rows") {
    val p = TestSales.writeCsv(tmpDir("val") + "/mixed.csv", 10,
      mutate = row => if (row.startsWith("100000002")) {
        val f = row.split(","); f(5) = "99/99/9999"; f.mkString(",")
      } else row)
    val (good, bad) = Validator.validateRows(readCsv(p))
    assert(good.count() == 9)
    assert(bad.count() == 1)
  }
}
