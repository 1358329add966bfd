package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** diffVersions (manifest-pruned keyed diff) + appendsSince
  * (dir-level change capture) on the snapshot store. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag, i * 1.5)).toDF("uuid", "val", "m")

  test("diffVersions classifies changes across upserts and prunes untouched buckets") {
    val root = tmpDir("graft_diffv_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 16)
    store.upsert("t", rows(0 until 200, "v1"), "uuid")       // v0
    store.upsert("t", rows(190 until 210, "v2"), "uuid")     // v1: 190..199 changed, 200..209 added

    val d = store.diffVersions("t", 0, 1, "uuid").get
    val byKey = d.collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2)))).toMap
    assert(byKey.size == 20)
    (190L until 200L).foreach { k =>
      assert(byKey(k) == ("changed", Some("val")), s"key $k")
    }
    (200L until 210L).foreach { k => assert(byKey(k) == ("added", None), s"key $k") }

    // manifest-level pruning is real: the diff's scan set must be a
    // strict subset of the two full snapshots' files — untouched
    // buckets (identical dir references) are never read
    val fullFiles = store.readAt("t", 0).get.inputFiles.toSet ++
      store.readAt("t", 1).get.inputFiles.toSet
    val diffFiles = d.inputFiles.toSet
    assert(diffFiles.subsetOf(fullFiles))
    assert(diffFiles.size < fullFiles.size,
      s"expected pruning: ${diffFiles.size} vs ${fullFiles.size}")
  }

  test("diffVersions of a version against itself is empty; reversed direction flips add/remove") {
    val root = tmpDir("graft_diffv_self_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4)
    store.upsert("t", rows(0 until 50, "a"), "uuid")
    store.upsert("t", rows(50 until 60, "a"), "uuid")
    assert(store.diffVersions("t", 1, 1, "uuid").get.isEmpty)
    val fwd = store.diffVersions("t", 0, 1, "uuid").get
    val bwd = store.diffVersions("t", 1, 0, "uuid").get
    assert(fwd.filter($"change" === "added").count() == 10)
    assert(bwd.filter($"change" === "removed").count() == 10)
    assert(fwd.filter($"change" === "changed").isEmpty)
  }

  test("diffVersions aligns a widening upsert: old rows read null in the new column") {
    val root = tmpDir("graft_diffv_widen_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 2)
    store.upsert("t", Seq((1L, "a"), (2L, "b")).toDF("uuid", "val"), "uuid")
    store.upsert("t",
      Seq((2L, "b", "extra")).toDF("uuid", "val", "note"), "uuid")
    val d = store.diffVersions("t", 0, 1, "uuid").get.collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2)))).toMap
    // key 2 gained a non-null note → changed on exactly that column;
    // key 1 may sit in the rewritten bucket (merged rows carry null
    // note on both sides) → null<=>null is unchanged, so absent
    assert(d == Map(2L -> ("changed", Some("note"))))
  }

  test("diffVersions returns None for vacuumed/unknown versions and refuses log tables") {
    val root = tmpDir("graft_diffv_guard_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 2)
    store.upsert("t", rows(0 until 10, "a"), "uuid")
    assert(store.diffVersions("t", 0, 7, "uuid").isEmpty)
    assert(store.diffVersions("nope", 0, 0, "uuid").isEmpty)

    store.append("log", rows(0 until 5, "x"))
    store.append("log", rows(5 until 9, "y"))
    intercept[IllegalArgumentException] {
      store.diffVersions("log", 0, 1, "uuid").get
    }
  }

  test("appendsSince returns exactly the later generations, zero recompute") {
    val root = tmpDir("graft_cdc_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 2)
    store.append("log", rows(0 until 5, "g0"))    // v0
    store.append("log", rows(5 until 12, "g1"))   // v1
    store.append("log", rows(12 until 20, "g2"))  // v2

    val sinceV0 = store.appendsSince("log", 0).get
    assert(sinceV0.count() == 15)
    assert(sinceV0.select("val").distinct().as[String].collect().toSet == Set("g1", "g2"))

    val window = store.appendsSince("log", 1, upto = Some(2)).get
    assert(window.select("val").distinct().as[String].collect().toSet == Set("g2"))

    // the capture reads ONLY the fresh dirs — no file of generation 0
    assert(sinceV0.inputFiles.forall(!_.contains("log-0")))

    assert(store.appendsSince("log", 2).get.isEmpty, "no new generations → empty")
  }

  test("appendsSince refuses a range that a compaction rewrote, and bucketed tables") {
    val root = tmpDir("graft_cdc_guard_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 2)
    store.append("log", rows(0 until 5, "g0"))
    store.append("log", rows(5 until 9, "g1"))
    assert(store.compactLogs("log"))
    intercept[IllegalArgumentException] {
      store.appendsSince("log", 0).get // g0/g1 dirs superseded inside the range
    }
    // from the compacted snapshot forward the capture is sound again
    store.append("log", rows(9 until 11, "g2"))
    val after = store.appendsSince("log", 2).get
    assert(after.select("val").distinct().as[String].collect().toSet == Set("g2"))

    store.upsert("keyed", rows(0 until 5, "a"), "uuid")
    intercept[IllegalArgumentException] {
      store.appendsSince("keyed", 0).get
    }
  }
}
