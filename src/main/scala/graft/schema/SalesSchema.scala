package graft.schema

import java.sql.Date

import org.apache.spark.sql.types._

/** The 14-column sales contract enforced by the reference's validator
  * (/root/reference/lambda.py:83-87), as an explicit Spark schema.
  *
  * Production reads never infer: CSV/JSON come in as strings and are
  * cast by the validator, so a bad cell becomes a validation error, not
  * a reader exception (SURVEY.md §1.2).
  */
object SalesSchema {

  val requiredColumns: Seq[String] = Seq(
    "uuid", "Country", "ItemType", "SalesChannel", "OrderPriority",
    "OrderDate", "Region", "ShipDate", "UnitsSold", "UnitPrice",
    "UnitCost", "TotalRevenue", "TotalCost", "TotalProfit",
  )

  /** Measure columns that must be numeric (lambda.py:96-100). */
  val numericColumns: Seq[String] = Seq(
    "UnitsSold", "UnitPrice", "UnitCost", "TotalRevenue", "TotalCost",
    "TotalProfit",
  )

  /** Date columns carrying strict MM/dd/yyyy strings (lambda.py:103-109). */
  val dateColumns: Seq[String] = Seq("OrderDate", "ShipDate")

  /** The input date format the reference enforces (lambda.py:107). */
  val inputDateFormat = "MM/dd/yyyy"

  /** The warehouse-facing date format (lambda.py:168-169). */
  val outputDateFormat = "yyyy-MM-dd"

  val keyColumn = "uuid"

  /** Typed schema AFTER validation (dates parsed, measures numeric). */
  val structType: StructType = StructType(Seq(
    StructField("uuid", LongType, nullable = false),
    StructField("Country", StringType),
    StructField("ItemType", StringType),
    StructField("SalesChannel", StringType),
    StructField("OrderPriority", StringType),
    StructField("OrderDate", DateType),
    StructField("Region", StringType),
    StructField("ShipDate", DateType),
    StructField("UnitsSold", LongType),
    StructField("UnitPrice", DoubleType),
    StructField("UnitCost", DoubleType),
    StructField("TotalRevenue", DoubleType),
    StructField("TotalCost", DoubleType),
    StructField("TotalProfit", DoubleType),
  ))

  /** Raw read schema: everything as string, so type errors surface as
    * validation failures instead of reader crashes. */
  val rawStructType: StructType =
    StructType(requiredColumns.map(StructField(_, StringType)))
}

/** Typed row for Dataset[SaleRecord] use where type safety helps. */
final case class SaleRecord(
    uuid: Long,
    Country: String,
    ItemType: String,
    SalesChannel: String,
    OrderPriority: String,
    OrderDate: Date,
    Region: String,
    ShipDate: Date,
    UnitsSold: Long,
    UnitPrice: Double,
    UnitCost: Double,
    TotalRevenue: Double,
    TotalCost: Double,
    TotalProfit: Double,
)
