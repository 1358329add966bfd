package graft.streaming

import java.nio.file.{Files, Paths}

import graft.{SparkSpec, TestSales}
import graft.io.ParquetDirStore

class StreamingPipelineSpec extends SparkSpec {

  private def setup() = {
    val root = tmpDir("graft_stream_")
    val rawDir = s"$root/raw"
    Files.createDirectories(Paths.get(rawDir))
    implicit val s = spark
    val store = new ParquetDirStore(s"$root/warehouse")
    val pipe = new StreamingSalesPipeline(
      store, s"$root/lake", s"$root/checkpoint", graft.pipeline.Notifier.Noop)
    (root, rawDir, store, pipe)
  }

  test("drain processes each file exactly once across runs (checkpoint invariant)") {
    val (_, rawDir, store, pipe) = setup()
    TestSales.writeCsv(s"$rawDir/batch1.csv", 10)
    TestSales.writeCsv(s"$rawDir/batch2.csv", 5,
      _.replaceFirst("^1000000", "2000000")) // disjoint uuids

    val run1 = pipe.drainAvailableNow(spark, rawDir)
    assert(run1.processed.size == 2 && run1.quarantined.isEmpty, run1)
    assert(store.read("sales_tgt").get.count() == 15)
    assert(store.read("sales").get.count() == 15)

    // drain again with nothing new: no reprocessing, tables unchanged
    val run2 = pipe.drainAvailableNow(spark, rawDir)
    assert(run2.total == 0, run2)
    assert(store.read("sales_tgt").get.count() == 15)
    assert(store.read("sales").get.count() == 15)
  }

  test("a many-file drop drains in bounded batches (driver-hop contract)") {
    val root = tmpDir("graft_stream_")
    val rawDir = s"$root/raw"
    Files.createDirectories(Paths.get(rawDir))
    implicit val s = spark
    val store = new ParquetDirStore(s"$root/warehouse")
    val cap = 7
    val pipe = new StreamingSalesPipeline(
      store, s"$root/lake", s"$root/checkpoint",
      graft.pipeline.Notifier.Noop, maxFilesPerTrigger = cap)
    val nFiles = 60
    (0 until nFiles).foreach { i =>
      // disjoint uuid blocks per file so the upsert keeps all rows
      TestSales.writeCsv(f"$rawDir/drop_$i%03d.csv", 2,
        _.replaceFirst("^1000000", s"${3000000 + i * 10}"))
    }
    val run = pipe.drainAvailableNow(spark, rawDir)
    assert(run.processed.size == nFiles, run.batchFileCounts)
    // every micro-batch carried at most `cap` files — the per-batch
    // file-list collect is O(cap), never O(backlog) — and the batch
    // count is the ceiling division, not one mega-batch
    assert(run.batchFileCounts.nonEmpty &&
      run.batchFileCounts.forall(_ <= cap), run.batchFileCounts)
    assert(run.batchFileCounts.sum == nFiles, run.batchFileCounts)
    assert(run.batchFileCounts.size >= nFiles / cap, run.batchFileCounts)
    // the unbounded mode cannot be constructed
    intercept[IllegalArgumentException] {
      new StreamingSalesPipeline(store, s"$root/lake2", s"$root/cp2",
        graft.pipeline.Notifier.Noop, maxFilesPerTrigger = 0)
    }
  }

  test("new files after a drain are picked up incrementally; upsert keeps last") {
    val (_, rawDir, store, pipe) = setup()
    TestSales.writeCsv(s"$rawDir/b1.csv", 8)
    pipe.drainAvailableNow(spark, rawDir)
    assert(store.read("sales_tgt").get.count() == 8)

    // second file overlaps uuids 0..3 (same ids, new measures) + adds 4 new
    TestSales.writeCsv(s"$rawDir/b2.csv", 12)
    val run = pipe.drainAvailableNow(spark, rawDir)
    assert(run.processed == Seq(s"file:$rawDir/b2.csv") ||
      run.processed.exists(_.endsWith("b2.csv")), run)
    // 12 uuids total: 8 original, ids 8..11 new from b2
    assert(store.read("sales_tgt").get.count() == 12)
    // raw log appends both batches wholesale
    assert(store.read("sales").get.count() == 20)
  }

  test("invalid file is quarantined by the stream, valid sibling processed") {
    val (root, rawDir, store, pipe) = setup()
    TestSales.writeCsv(s"$rawDir/good.csv", 6)
    TestSales.writeCsv(s"$rawDir/bad.csv", 6,
      _.replaceFirst("/2016", "/banana")) // malformed dates -> V3
    val run = pipe.drainAvailableNow(spark, rawDir)
    assert(run.processed.size == 1 && run.processed.head.endsWith("good.csv"), run)
    assert(run.quarantined.size == 1 && run.quarantined.head.endsWith("bad.csv"), run)
    assert(store.read("sales_tgt").get.count() == 6)
    // quarantined file moved under the lake
    val qRoot = Paths.get(s"$root/lake/quarantine")
    assert(Files.exists(qRoot) && Files.walk(qRoot)
      .filter(p => p.toString.endsWith("bad.csv")).count() == 1)
  }

  // End-to-end with the manifest-committed sink: the stream's
  // checkpoint gives at-most-once file intake, the snapshot store's
  // single-rename commit gives torn-write-free tables — together the
  // full exactly-once story with a crash-safe warehouse.
  test("streaming pipeline over the snapshot store: committed, incremental, O(batch)") {
    val root = tmpDir("graft_stream_snap_")
    val rawDir = s"$root/raw"
    Files.createDirectories(Paths.get(rawDir))
    implicit val s = spark
    val store = new graft.io.SnapshotBucketedStore(s"$root/warehouse", numBuckets = 8)
    val pipe = new StreamingSalesPipeline(
      store, s"$root/lake", s"$root/checkpoint", graft.pipeline.Notifier.Noop)
    TestSales.writeCsv(s"$rawDir/b1.csv", 8)
    pipe.drainAvailableNow(spark, rawDir)
    assert(store.read("sales_tgt").get.count() == 8)
    TestSales.writeCsv(s"$rawDir/b2.csv", 12) // overlaps 8 uuids, adds 4
    val run = pipe.drainAvailableNow(spark, rawDir)
    assert(run.processed.size == 1, run)
    assert(store.read("sales_tgt").get.count() == 12)
    assert(store.read("sales").get.count() == 20) // raw log: both appends
    // target advanced through committed manifest versions, no torn state
    val manifests = new java.io.File(s"$root/warehouse/sales_tgt").listFiles()
      .map(_.getName).filter(_.startsWith("manifest-")).sorted
    assert(manifests.length >= 2 && manifests.forall(_.endsWith(".txt")), manifests.toSeq)
    store.vacuum("sales_tgt")
    assert(store.read("sales_tgt").get.count() == 12)
  }

  test("NDJSON stream variant ingests json files") {
    val root = tmpDir("graft_stream_json_")
    val rawDir = s"$root/raw"
    Files.createDirectories(Paths.get(rawDir))
    implicit val s = spark
    val store = new ParquetDirStore(s"$root/warehouse")
    val pipe = new StreamingSalesPipeline(
      store, s"$root/lake", s"$root/checkpoint",
      graft.pipeline.Notifier.Noop, format = "json")
    TestSales.writeNdjson(s"$rawDir/b1.json", 7)
    val run = pipe.drainAvailableNow(spark, rawDir)
    assert(run.processed.size == 1, run)
    assert(store.read("sales_tgt").get.count() == 7)
  }
}
