package graft.io

import java.io.File

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Anti-entropy bucket-digest repair (X211): digests are layout-
  * invariant multiset fingerprints; divergence detection names
  * exactly the buckets holding planted corruption; repair rewrites
  * ONLY those buckets (generation-dir assertion) and re-converges
  * the table bit-for-bit; a clean pass is metadata-only. */
class RepairSpec extends SparkSpec {
  import spark.implicits._

  private def rows(r: Range, v: String) =
    r.map(i => (i.toLong, s"$v-$i", i * 3L)).toDF("uuid", "val", "num")

  test("bucketDigests: layout-invariant, null-slot-unambiguous") {
    val df = rows(0 until 100, "a")
    val d1 = Repair.bucketDigests(df, "uuid", 8)
      .orderBy("bucket").collect().toSeq
    val d2 = Repair.bucketDigests(df.repartition(7).orderBy(desc("num")), "uuid", 8)
      .orderBy("bucket").collect().toSeq
    assert(d1 == d2, "digest must not depend on partitioning or order")
    // (a=null, b=1) vs (a=1, b=null): ordinal interleaving must split them
    val x = Seq((1L, Option.empty[String], Option("1"))).toDF("k", "a", "b")
    val y = Seq((1L, Option("1"), Option.empty[String])).toDF("k", "a", "b")
    val dx = Repair.bucketDigests(x, "k", 4).select("digest").as[Long].head()
    val dy = Repair.bucketDigests(y, "k", 4).select("digest").as[Long].head()
    assert(dx != dy, "null-position swap must change the digest")
  }

  test("repair: detects planted divergence, rewrites only those buckets, converges") {
    val root = tmpDir("graft_repair_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 8)
    val expected = rows(0 until 200, "v1")
    store.upsert("tgt", expected, "uuid")

    // corrupt out-of-line: one changed row, one extra row, one lost row
    store.upsert("tgt", Seq((10L, "CORRUPT", -1L)).toDF("uuid", "val", "num"), "uuid")
    store.upsert("tgt", Seq((9999L, "extra", 0L)).toDF("uuid", "val", "num"), "uuid")
    store.delete("tgt", "uuid", Seq(20L).toDF("uuid"))

    val nb = 8L
    def bucketOf(k: Long): Long =
      spark.range(1).select(pmod(xxhash64(lit(k)), lit(nb))).as[Long].head()
    val wantBad = Seq(10L, 9999L, 20L).map(bucketOf).distinct.sorted

    val act = store.read("tgt").get
    val bad = Repair.divergentBuckets(
      act.select("num", "uuid", "val"), expected.select("uuid", "val", "num"),
      "uuid", 8)
    assert(bad == wantBad, s"divergent buckets $bad, want $wantBad")

    val versionsBefore = store.snapshots("tgt").size
    val stats = Repair.repair(store, "tgt", expected, "uuid")
    assert(stats.bucketsCompared == 8 && stats.divergent == wantBad.size, stats)
    assert(stats.deleted == 1L, stats) // uuid 9999
    // upserted = every expected row in a divergent bucket
    val wantUp = expected
      .filter(pmod(xxhash64($"uuid"), lit(nb)).isin(wantBad: _*)).count()
    assert(stats.upserted == wantUp, stats)

    // converged bit-for-bit
    val got = store.read("tgt").get.orderBy("uuid").collect().toSeq
    assert(got == expected.orderBy("uuid").collect().toSeq)

    // the repair's upsert generation touched only divergent buckets
    val gens = new File(s"$root/tgt/data").listFiles().map(_.getName)
    val maxG = gens.map(_.split("-g").last.toInt).max
    assert(gens.count(_.endsWith(s"-g$maxG")) <= wantBad.size,
      s"repair rewrote more than the divergent buckets: ${gens.toSeq.sorted}")

    // clean pass: zero divergence, zero commits
    val again = Repair.repair(store, "tgt", expected, "uuid")
    assert(again == RepairStats(8, 0, 0L, 0L), again)
    assert(store.snapshots("tgt").size == versionsBefore + 2,
      "a clean repair must not commit")
  }

  test("repair of a missing table degrades to one atomic rebuild") {
    val root = tmpDir("graft_repair_missing_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4)
    val expected = rows(0 until 50, "v1")
    val stats = Repair.repair(store, "none", expected, "uuid")
    assert(stats.upserted == 50L, stats)
    assert(store.read("none").get.orderBy("uuid").collect().toSeq ==
      expected.orderBy("uuid").collect().toSeq)
  }
}
