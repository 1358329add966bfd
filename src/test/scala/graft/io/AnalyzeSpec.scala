package graft.io

import graft.SparkSpec

/** ANALYZE (X257): backfilling the metadata tier for generations
  * written before the stats shape was declared — one metadata-only
  * commit turns on pruning, manifest aggregates, and CBO figures for
  * a legacy table; re-analyzing a covered table is a no-op. */
class AnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private def rows(r: Range) =
    r.map(i => (i.toLong, i * 2L, s"t$i")).toDF("uuid", "v", "tag")

  test("analyze turns on pruning, metadata aggregates, NDV and CBO figures") {
    val root = tmpDir("graft_an_")
    implicit val s = spark
    // written by a shape-less store: no stats, no Blooms, no NDV
    val bare = new SnapshotBucketedStore(root, numBuckets = 4)
    (0 until 4).foreach(g => bare.append("t", rows(g * 50 until (g + 1) * 50)))

    // reopened with the declared shape: everything refuses pre-analyze
    val shaped = new SnapshotBucketedStore(root, numBuckets = 4,
      statsColumns = Seq("v"), keyColumns = Seq("uuid"), ndvColumns = Seq("v"))
    assert(shaped.pruneStats("t", "v", 0L, 50L).get._1 == 4,
      "no recorded stats → nothing prunes")
    assert(shaped.metadataMinMax("t", "v").isEmpty)
    assert(shaped.metadataApproxDistinct("t", "v").isEmpty)
    assert(shaped.columnStatsServe("t").isEmpty)

    val cat = "lakean" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.conf.set(s"spark.sql.catalog.$cat.statscolumns", "v")
    spark.conf.set(s"spark.sql.catalog.$cat.keycolumns", "uuid")
    spark.conf.set(s"spark.sql.catalog.$cat.ndvcolumns", "v")
    val out = spark.sql(s"CALL $cat.system.analyze('t', false)").collect()
    assert(out.head.getInt(1) == 4, s"dirs analyzed: ${out.head.getInt(1)}")

    // every tier now serves, and the rows never moved
    assert(shaped.pruneStats("t", "v", 0L, 50L).get._1 <= 1,
      "range pruning must fire after analyze")
    assert(shaped.pruneEqStats("t", "uuid", 7L).get._1 <= 2,
      "Bloom pruning must fire after analyze")
    assert(shaped.metadataMinMax("t", "v").contains(
      (BigDecimal(0), BigDecimal(398))))
    assert(shaped.metadataCount("t").contains(200L))
    assert(shaped.metadataApproxDistinct("t", "v").exists(n => n > 180 && n < 220))
    assert(shaped.columnStatsServe("t").nonEmpty)
    assert(shaped.read("t").get.count() == 200)

    // covered table: analyze is a no-op, no version minted
    val vBefore = shaped.snapshots("t").last
    val again = spark.sql(s"CALL $cat.system.analyze('t', false)").collect()
    assert(again.head.getInt(1) == 0)
    assert(shaped.snapshots("t").last == vBefore, "no-op must not mint history")
  }

  test("full recompute upgrades a partially-covered table in one pass") {
    val root = tmpDir("graft_an_full_")
    implicit val s = spark
    val shaped = new SnapshotBucketedStore(root, numBuckets = 4,
      statsColumns = Seq("v"))
    shaped.append("t", rows(0 until 30)) // this one records stats
    val bare = new SnapshotBucketedStore(root, numBuckets = 4)
    bare.append("t", rows(30 until 60)) // this one doesn't
    assert(shaped.metadataMinMax("t", "v").isEmpty, "one unstatted dir blocks")
    assert(shaped.analyzeTable("t") == 1, "only the missing dir recomputes")
    assert(shaped.metadataMinMax("t", "v").contains(
      (BigDecimal(0), BigDecimal(118))))
  }

  test("full recompute REPLACES stale entries for redeclared stats columns") {
    val root = tmpDir("graft_an_stale_")
    implicit val s = spark
    // written under statscolumns=v: every dir records v bounds
    val oldShape = new SnapshotBucketedStore(root, numBuckets = 4,
      statsColumns = Seq("v"))
    (0 until 3).foreach(g => oldShape.append("t", rows(g * 20 until (g + 1) * 20)))
    assert(oldShape.pruneStats("t", "v", -100L, -50L).get._1 == 0,
      "v is statted: an out-of-range probe prunes every dir")

    // the shape is REDECLARED to uuid; a full recompute must DROP the
    // old v entries — a merge would keep them under the upgraded
    // stats version, where survives() skips the legacy widening and
    // could wrongly prune on stale bounds
    val newShape = new SnapshotBucketedStore(root, numBuckets = 4,
      statsColumns = Seq("uuid"))
    assert(newShape.analyzeTable("t", onlyMissing = false) == 3)
    assert(newShape.pruneStats("t", "uuid", 0L, 5L).get._1 <= 1,
      "the redeclared column prunes")
    assert(newShape.pruneStats("t", "v", -100L, -50L).get._1 == 3,
      "stale v entries must be gone: with no recorded stats every dir " +
        "is conservatively kept")
  }
}
