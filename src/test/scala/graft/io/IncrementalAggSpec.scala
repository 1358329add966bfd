package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def gen(ids: Range, k: String) =
    ids.map(i => (k, i.toLong, BigDecimal(i).setScale(2))).toDF("g", "v", "m")

  private def oneShot(src: org.apache.spark.sql.DataFrame) =
    src.groupBy("g").agg(sum("v").as("v"), sum("m").as("m"),
      count(lit(1)).as("rows"))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "v", "m", "rows").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).stripTrailingZeros, r.getLong(3)))).toMap

  test("refreshes apply only the new generations yet equal the one-shot aggregate") {
    val root = tmpDir("graft_iagg_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 2)

    store.append("ev", gen(0 until 100, "a"))                       // v0
    assert(IncrementalAgg.refresh(store, "ev", "agg", Seq("g"), Seq("v", "m")))
    store.append("ev", gen(100 until 150, "a").union(gen(0 until 30, "b"))) // v1
    store.append("ev", gen(30 until 40, "b"))                        // v2
    assert(IncrementalAgg.refresh(store, "ev", "agg", Seq("g"), Seq("v", "m")))

    val maintained = asMap(IncrementalAgg.read(store, "agg", Seq("g"), Seq("v", "m")).get)
    val expected = asMap(oneShot(store.read("ev").get))
    assert(maintained == expected, s"$maintained vs $expected")

    // the second refresh consumed generations v1+v2 ONLY — its delta
    // generation must not have re-read v0's dir
    assert(store.lastAppliedBatch("agg").contains(2L))

    // already current → no-op; and a replayed cursor can't double-count
    assert(!IncrementalAgg.refresh(store, "ev", "agg", Seq("g"), Seq("v", "m")))
    assert(!store.appendIfNew("agg",
      Seq(("a", 999L, BigDecimal(9).setScale(2))).toDF("g", "v", "m")
        .groupBy("g").agg(count(lit(1)).as("rows"), sum("v").as("v"), sum("m").as("m"))
        .select("g", "v", "m", "rows"),
      batchId = 2L), "replayed epoch must be fenced")
    assert(asMap(IncrementalAgg.read(store, "agg", Seq("g"), Seq("v", "m")).get) == expected)
  }

  test("destination compaction folds generations without changing the answer") {
    val root = tmpDir("graft_iagg_c_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 2)
    store.append("ev", gen(0 until 50, "a"))
    IncrementalAgg.refresh(store, "ev", "agg", Seq("g"), Seq("v", "m"))
    store.append("ev", gen(50 until 80, "a"))
    IncrementalAgg.refresh(store, "ev", "agg", Seq("g"), Seq("v", "m"))
    val before = asMap(IncrementalAgg.read(store, "agg", Seq("g"), Seq("v", "m")).get)
    IncrementalAgg.compact(store, "agg", Seq("g"), Seq("v", "m"))
    assert(asMap(IncrementalAgg.read(store, "agg", Seq("g"), Seq("v", "m")).get) == before)
    // the cursor survives compaction — the next refresh is still a no-op
    assert(!IncrementalAgg.refresh(store, "ev", "agg", Seq("g"), Seq("v", "m")))
  }

  test("a source compaction inside the refresh window triggers one exact rebuild") {
    val root = tmpDir("graft_iagg_r_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 2)
    store.append("ev", gen(0 until 40, "a"))
    IncrementalAgg.refresh(store, "ev", "agg", Seq("g"), Seq("v", "m"))
    store.append("ev", gen(40 until 60, "a"))
    assert(store.compactLogs("ev")) // rewrites history inside the window
    store.append("ev", gen(60 until 70, "b"))
    assert(IncrementalAgg.refresh(store, "ev", "agg", Seq("g"), Seq("v", "m")),
      "rebuild fallback must apply")
    val maintained = asMap(IncrementalAgg.read(store, "agg", Seq("g"), Seq("v", "m")).get)
    assert(maintained == asMap(oneShot(store.read("ev").get)))
    // and incremental again from here
    store.append("ev", gen(70 until 90, "b"))
    assert(IncrementalAgg.refresh(store, "ev", "agg", Seq("g"), Seq("v", "m")))
    assert(asMap(IncrementalAgg.read(store, "agg", Seq("g"), Seq("v", "m")).get) ==
      asMap(oneShot(store.read("ev").get)))
  }

  test("a vacuumed cursor manifest triggers the rebuild fallback, not a crash") {
    val root = tmpDir("graft_iagg_v_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 2)
    store.append("ev", gen(0 until 40, "a"))                          // v0
    IncrementalAgg.refresh(store, "ev", "agg", Seq("g"), Seq("v", "m")) // cursor=0
    store.append("ev", gen(40 until 60, "a"))                         // v1
    store.append("ev", gen(60 until 70, "b"))                         // v2
    store.vacuum("ev", retainSnapshots = 1) // v0 manifest gone: appendsSince(0,_) → None
    assert(IncrementalAgg.refresh(store, "ev", "agg", Seq("g"), Seq("v", "m")),
      "vacuumed-cursor refresh must fall back to a rebuild")
    val maintained = asMap(IncrementalAgg.read(store, "agg", Seq("g"), Seq("v", "m")).get)
    assert(maintained == asMap(oneShot(store.read("ev").get)))
    // and incremental again from the rebuilt cursor
    store.append("ev", gen(70 until 90, "b"))
    assert(IncrementalAgg.refresh(store, "ev", "agg", Seq("g"), Seq("v", "m")))
    assert(asMap(IncrementalAgg.read(store, "agg", Seq("g"), Seq("v", "m")).get) ==
      asMap(oneShot(store.read("ev").get)))
  }

  test("streaming drain maintains the aggregate bit-identical to one shot") {
    val root = tmpDir("graft_iagg_s_")
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val store = new SnapshotBucketedStore(root, numBuckets = 2)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val all = (1 to 400).map(i => (s"g${i % 5}", i.toLong))
    val (h1, h2) = all.splitAt(150)
    val ev = input.toDF().toDF("g", "v")
    input.addData(h1: _*)
    IncrementalAgg.drainTo(ev, store, "agg", Seq("g"), Seq("v"), s"$root/ckpt")
    input.addData(h2: _*)
    IncrementalAgg.drainTo(ev, store, "agg", Seq("g"), Seq("v"), s"$root/ckpt")
    val maintained = IncrementalAgg.read(store, "agg", Seq("g"), Seq("v")).get
      .select("g", "v", "rows").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val oneShot = all.toDF("g", "v").groupBy("g")
      .agg(sum("v").as("v"), count(lit(1)).as("rows"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(maintained == oneShot)
  }

  test("double sum columns are refused; missing source is a quiet no-op") {
    val root = tmpDir("graft_iagg_g_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 2)
    assert(!IncrementalAgg.refresh(store, "nope", "agg", Seq("g"), Seq("v")))
    store.append("ev", Seq(("a", 1.5)).toDF("g", "d"))
    intercept[IllegalArgumentException] {
      IncrementalAgg.refresh(store, "ev", "agg", Seq("g"), Seq("d"))
    }
  }
}
