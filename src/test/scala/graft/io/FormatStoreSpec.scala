package graft.io

import graft.SparkSpec

class FormatStoreSpec extends SparkSpec {
  import spark.implicits._

  test("ORC store: roundtrip, append, replace, keyed upsert") {
    implicit val s = spark
    val store = new OrcDirStore(tmpDir("graft_orc_"))
    val df = (0 until 50).map(i => (i.toLong, s"v$i")).toDF("uuid", "v")
    assert(store.read("t").isEmpty)
    store.append("t", df)
    assert(store.read("t").get.count() == 50)
    store.append("t", df.filter($"uuid" < 10))
    assert(store.read("t").get.count() == 60)
    store.replace("t", df.filter($"uuid" < 5))
    assert(store.read("t").get.count() == 5)
    // default (reference-semantics) upsert works through any format
    store.upsert("t", (3 until 8).map(i => (i.toLong, "new")).toDF("uuid", "v"), "uuid")
    val after = store.read("t").get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after.size == 8)
    assert(after(3L) == "new" && after(0L) == "v0")
    // files really are ORC
    val files = new java.io.File(store.read("t").get.inputFiles.head
      .stripPrefix("file:")).getName
    assert(files.endsWith(".orc"), files)
  }

  test("pipeline runs unchanged on an ORC warehouse") {
    implicit val s = spark
    val root = tmpDir("graft_orc_pipe_")
    val store = new OrcDirStore(s"$root/warehouse")
    val raw = s"$root/in.csv"
    graft.TestSales.writeCsv(raw, 15)
    val result = new graft.pipeline.SalesPipeline(
      store, s"$root/lake", graft.pipeline.Notifier.Noop).run(spark, raw)
    assert(result.isInstanceOf[graft.pipeline.PipelineResult.Success], result)
    assert(store.read("sales_tgt").get.count() == 15)
  }
}
