package graft.io

import java.io.File

import graft.SparkSpec

class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag, i * 1.5)).toDF("uuid", "val", "m")

  private def bucketDirs(root: String, name: String): Map[String, Long] = {
    val dir = new File(s"$root/$name")
    dir.listFiles().filter(_.getName.startsWith("graft_bucket="))
      .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => s"${d.getName}/${f.getName}" -> f.lastModified()))
      .toMap
  }

  test("bucketed upsert rewrites only touched buckets") {
    val root = tmpDir("graft_bucketed_")
    implicit val s = spark
    val store = new BucketedParquetDirStore(root, numBuckets = 8)

    store.upsert("tgt", rows(0 until 200, "v1"), "uuid")
    assert(store.read("tgt").get.count() == 200)
    val before = bucketDirs(root, "tgt")
    assert(before.keys.map(_.split("/")(0)).toSet.size == 8) // all buckets present

    Thread.sleep(1100) // mtime resolution guard
    // second batch: update 3 keys, add 2 — touches few buckets
    store.upsert("tgt", rows(198 until 203, "v2"), "uuid")
    val after = bucketDirs(root, "tgt")

    val table = store.read("tgt").get
    assert(table.count() == 203)
    // updated keys carry the new tag (incoming beats existing)
    assert(table.filter($"uuid" === 199L).select("val").as[String].head() == "v2")
    assert(table.filter($"uuid" === 0L).select("val").as[String].head() == "v1")

    val touchedBuckets = after.keySet.diff(before.keySet)
      .union(before.keySet.diff(after.keySet))
      .union(after.collect { case (k, m) if before.get(k).exists(_ != m) => k }.toSet)
      .map(_.split("/")(0))
    val allBuckets = after.keys.map(_.split("/")(0)).toSet
    assert(touchedBuckets.nonEmpty && touchedBuckets.size < allBuckets.size,
      s"expected partial rewrite, touched=$touchedBuckets of $allBuckets")
    // untouched bucket files are bit-identical (same name, same mtime)
    val untouched = before.keySet.intersect(after.keySet)
      .filterNot(k => touchedBuckets.contains(k.split("/")(0)))
    assert(untouched.nonEmpty)
    untouched.foreach(k => assert(before(k) == after(k), s"$k was rewritten"))
  }

  test("bucketed store read/replace roundtrip hides the bucket column") {
    val root = tmpDir("graft_bucketed_rt_")
    implicit val s = spark
    val store = new BucketedParquetDirStore(root, numBuckets = 4)
    store.upsert("t", rows(0 until 10, "a"), "uuid")
    assert(store.read("t").get.columns.toSeq == Seq("uuid", "val", "m"))
    store.replace("t", rows(0 until 3, "b"))
    assert(store.read("t").get.count() == 3)
  }

  test("bucketed upsert is idempotent (re-upload invariant)") {
    val root = tmpDir("graft_bucketed_idem_")
    implicit val s = spark
    val store = new BucketedParquetDirStore(root, numBuckets = 4)
    val batch = rows(0 until 50, "x")
    store.upsert("t", batch, "uuid")
    store.upsert("t", batch, "uuid")
    assert(store.read("t").get.count() == 50)
  }

  test("pipeline runs unchanged on a bucketed store") {
    val root = tmpDir("graft_bucketed_pipe_")
    implicit val s = spark
    val store = new BucketedParquetDirStore(s"$root/warehouse", numBuckets = 4)
    val raw = s"$root/in.csv"
    graft.TestSales.writeCsv(raw, 20)
    val result = new graft.pipeline.SalesPipeline(
      store, s"$root/lake", graft.pipeline.Notifier.Noop).run(spark, raw)
    assert(result.isInstanceOf[graft.pipeline.PipelineResult.Success], result)
    assert(store.read("sales_tgt").get.count() == 20)
  }

  test("JdbcStore partitioned-read option plumbing") {
    implicit val s = spark
    val props = new java.util.Properties()
    props.setProperty("user", "u")
    val store = new JdbcStore(
      "jdbc:mysql://db:3306/sales", props,
      Some(JdbcPartitioning("uuid", 0L, 1000000000L, 32)))
    val opts = store.readOptions("sales_tgt")
    assert(opts("partitionColumn") == "uuid")
    assert(opts("numPartitions") == "32")
    assert(opts("lowerBound") == "0" && opts("upperBound") == "1000000000")
    assert(opts("dbtable") == "sales_tgt" && opts("user") == "u")
    // unpartitioned store omits the slicing options entirely
    val plain = new JdbcStore("jdbc:mysql://db:3306/sales", props)
    assert(!plain.readOptions("sales").contains("partitionColumn"))
  }
}
