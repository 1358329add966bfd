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

  test("min/max/count/avg maintain losslessly across refreshes, compaction, and rebuild") {
    import IncrementalAgg.AggCol
    val root = tmpDir("graft_iagg_m_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 2)
    val aggs = Seq(AggCol.sum("v"), AggCol.min("v"), AggCol.max("v"),
      AggCol.count("m"), AggCol.avg("v"))

    def src(rows: Seq[(String, Long, Option[java.math.BigDecimal])]) =
      rows.toDF("g", "v", "m")
    def oneShot() = store.read("ev").get.groupBy("g")
      .agg(sum("v").as("v"), min("v").as("min_v"), max("v").as("max_v"),
        count("m").as("cnt_m"),
        (sum("v").cast("double") / count("v").cast("double")).as("avg_v"),
        count(lit(1)).as("rows"))
    def asRows(df: org.apache.spark.sql.DataFrame) =
      df.select("g", "v", "min_v", "max_v", "cnt_m", "avg_v", "rows")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getDouble(5), r.getLong(6)))).toMap
    def maintained() =
      asRows(IncrementalAgg.readAggs(store, "agg", Seq("g"), aggs).get)

    val d = (x: Int) => Option(new java.math.BigDecimal(x))
    // window 1: group a, some null m (count must skip them)
    store.append("ev", src(Seq(("a", 5L, d(1)), ("a", 9L, None), ("a", 2L, d(2)))))
    assert(IncrementalAgg.refreshAggs(store, "ev", "agg", Seq("g"), aggs))
    assert(maintained() == asRows(oneShot()))

    // window 2: new group + a new minimum for a — the min must CROSS
    // the refresh boundary (partial extrema re-extremize)
    store.append("ev", src(Seq(("a", 1L, d(3)), ("b", 7L, None), ("b", 4L, d(4)))))
    store.append("ev", src(Seq(("b", 11L, d(5)))))
    assert(IncrementalAgg.refreshAggs(store, "ev", "agg", Seq("g"), aggs))
    assert(maintained() == asRows(oneShot()))

    // destination compaction folds generations without changing anything
    IncrementalAgg.compactAggs(store, "agg", Seq("g"), aggs)
    assert(maintained() == asRows(oneShot()))

    // source compaction inside the window → exact rebuild fallback
    store.append("ev", src(Seq(("a", 20L, d(6)))))
    assert(store.compactLogs("ev"))
    store.append("ev", src(Seq(("c", 3L, None))))
    assert(IncrementalAgg.refreshAggs(store, "ev", "agg", Seq("g"), aggs))
    assert(maintained() == asRows(oneShot()))
  }

  test("avg batch boundaries are invisible: maintained mean equals the one-shot mean bitwise") {
    import IncrementalAgg.AggCol
    val root = tmpDir("graft_iagg_a_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 2)
    // values chosen so the mean is NOT representable exactly: only the
    // decomposed (exact sum, exact count) form reproduces the one-shot
    // double bit-for-bit regardless of where the refresh boundary fell
    store.append("ev", Seq(("a", 1L), ("a", 1L)).toDF("g", "v"))
    IncrementalAgg.refreshAggs(store, "ev", "agg", Seq("g"), Seq(AggCol.avg("v")))
    store.append("ev", Seq(("a", 1L)).toDF("g", "v"))
    IncrementalAgg.refreshAggs(store, "ev", "agg", Seq("g"), Seq(AggCol.avg("v")))
    val got = IncrementalAgg.readAggs(store, "agg", Seq("g"), Seq(AggCol.avg("v")))
      .get.select("avg_v").head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(got) ==
      java.lang.Double.doubleToLongBits(3.0 / 3.0) && got == 1.0)
    // a second shape: 1/3-style non-terminating mean
    store.append("ev", Seq(("a", 0L), ("a", 0L), ("a", 1L)).toDF("g", "v"))
    IncrementalAgg.refreshAggs(store, "ev", "agg", Seq("g"), Seq(AggCol.avg("v")))
    val got2 = IncrementalAgg.readAggs(store, "agg", Seq("g"), Seq(AggCol.avg("v")))
      .get.select("avg_v").head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(got2) ==
      java.lang.Double.doubleToLongBits(4.0 / 6.0))
  }

  test("non-mergeable aggregates and colliding output names are refused") {
    import IncrementalAgg.AggCol
    val root = tmpDir("graft_iagg_x_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 2)
    store.append("ev", Seq(("a", 1L)).toDF("g", "v"))
    intercept[IllegalArgumentException] {
      IncrementalAgg.refreshAggs(store, "ev", "agg", Seq("g"),
        Seq(AggCol("median", "v", "med_v")))
    }
    intercept[IllegalArgumentException] {
      IncrementalAgg.refreshAggs(store, "ev", "agg", Seq("g"),
        Seq(AggCol.sum("v"), AggCol("min", "v", "v")))
    }
    intercept[IllegalArgumentException] {
      IncrementalAgg.refreshAggs(store, "ev", "agg", Seq("g"),
        Seq(AggCol("sum", "v", "rows")))
    }
    // min/max of doubles is fine (no arithmetic); sum/avg of doubles is not
    store.append("ev2", Seq(("a", 1.5)).toDF("g", "x"))
    assert(IncrementalAgg.refreshAggs(store, "ev2", "agg2", Seq("g"),
      Seq(AggCol.min("x"), AggCol.max("x"))))
    intercept[IllegalArgumentException] {
      IncrementalAgg.refreshAggs(store, "ev2", "agg3", Seq("g"), Seq(AggCol.avg("x")))
    }
  }

  test("delete on a bucketed source propagates: next refresh rebuilds, never retains") {
    val root = tmpDir("graft_iagg_d_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 2)
    // bucketed (upsert) source: per-user balances
    store.upsert("users", Seq(
      (1L, "a", 100L), (2L, "a", 50L), (3L, "b", 70L), (4L, "b", 30L))
      .toDF("uid", "g", "bal"), "uid")
    assert(IncrementalAgg.refresh(store, "users", "agg", Seq("g"), Seq("bal")))
    def maintained() = IncrementalAgg.read(store, "agg", Seq("g"), Seq("bal")).get
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(maintained() == Map("a" -> ((150L, 2L)), "b" -> ((100L, 2L))))

    // GDPR delete of uid 2: the delete commit advances the source
    // version, so the refresh CANNOT take the incremental shortcut
    // (appendsSince refuses bucketed manifests) and must rebuild
    store.delete("users", "uid", Seq(Tuple1(2L)).toDF("uid"))
    assert(IncrementalAgg.refresh(store, "users", "agg", Seq("g"), Seq("bal")),
      "post-delete refresh must apply")
    val fresh = store.read("users").get.groupBy("g")
      .agg(sum("bal").as("bal"), count(lit(1)).as("rows"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(maintained() == fresh && fresh == Map("a" -> ((100L, 1L)), "b" -> ((100L, 2L))),
      s"${maintained()} vs $fresh")
  }

  test("filtered log-compaction (the log-table delete path) propagates the same way") {
    val root = tmpDir("graft_iagg_dl_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 2)
    store.append("ev", gen(0 until 40, "a"))
    store.append("ev", gen(40 until 60, "b"))
    assert(IncrementalAgg.refresh(store, "ev", "agg", Seq("g"), Seq("v", "m")))
    // erase v >= 50 from history via the filtered compaction rewrite;
    // the compaction horizon makes the next capture refuse → rebuild
    assert(store.compactLogs("ev", _.filter(col("v") < 50L)))
    assert(IncrementalAgg.refresh(store, "ev", "agg", Seq("g"), Seq("v", "m")),
      "post-delete refresh must apply")
    val maintained = asMap(IncrementalAgg.read(store, "agg", Seq("g"), Seq("v", "m")).get)
    assert(maintained == asMap(oneShot(store.read("ev").get)))
    assert(maintained("b")._3 == 10L, "deleted rows' contributions must be gone")
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
