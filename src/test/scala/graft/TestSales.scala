package graft

import java.nio.file.{Files, Paths}

/** Deterministic synthetic sales batches in the reference's 14-column
  * shape (FIXTURES.md §A) — generated, not copied from the reference.
  */
object TestSales {

  val header: String =
    "uuid,Country,ItemType,SalesChannel,OrderPriority,OrderDate,Region," +
      "ShipDate,UnitsSold,UnitPrice,UnitCost,TotalRevenue,TotalCost,TotalProfit"

  private val countries = Vector("Atlantis", "Borduria", "Carpania", "Dystopia", "Elbonia")
  private val items = Vector("Widgets", "Gadgets", "Sprockets")
  private val regions = Vector("North", "South")

  /** One deterministic CSV row; uuid = 100000000 + i. */
  def csvRow(i: Int): String = {
    val c = countries(i % countries.size)
    val it = items(i % items.size)
    val ch = if (i % 2 == 0) "Online" else "Offline"
    val pr = Vector("C", "H", "L", "M")(i % 4)
    val day = (i % 28) + 1
    val od = f"${(i % 12) + 1}%02d/$day%02d/2016"
    val sd = f"${(i % 12) + 1}%02d/${math.min(day + 3, 28)}%02d/2016"
    val units = 100 + i
    val price = 10.50 + (i % 7)
    val cost = 8.25 + (i % 5)
    val rev = units * price
    val tc = units * cost
    s"${100000000 + i},$c,$it,$ch,$pr,$od,${regions(i % 2)},$sd,$units," +
      f"$price%.2f,$cost%.2f,$rev%.2f,$tc%.2f,${rev - tc}%.2f"
  }

  def writeCsv(path: String, n: Int, mutate: String => String = identity): String = {
    val rows = (0 until n).map(i => mutate(csvRow(i)))
    Files.write(Paths.get(path), (header +: rows).mkString("\n").getBytes)
    path
  }

  def jsonRecord(i: Int): String = {
    val f = csvRow(i).split(",")
    s"""{"uuid":${f(0)},"Country":"${f(1)}","ItemType":"${f(2)}","SalesChannel":"${f(3)}",""" +
      s""""OrderPriority":"${f(4)}","OrderDate":"${f(5)}","Region":"${f(6)}","ShipDate":"${f(7)}",""" +
      s""""UnitsSold":${f(8)},"UnitPrice":${f(9)},"UnitCost":${f(10)},"TotalRevenue":${f(11)},""" +
      s""""TotalCost":${f(12)},"TotalProfit":${f(13)}}"""
  }

  /** NDJSON form (reference S4). */
  def writeNdjson(path: String, n: Int): String = {
    Files.write(Paths.get(path), (0 until n).map(jsonRecord).mkString("\n").getBytes)
    path
  }

  /** Array-of-records form (reference S3). */
  def writeJsonArray(path: String, n: Int): String = {
    Files.write(Paths.get(path), (0 until n).map(jsonRecord).mkString("[\n", ",\n", "\n]").getBytes)
    path
  }
}
