package graft.io

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** [[SnapshotBucketedStore.deleteRange]] — the TTL sweep: metadata-only
  * drops for provably-contained dirs, rewrites for straddlers and
  * null-carrying dirs, untouched disjoint dirs; result always equals
  * the naive filter. */
class DeleteRangeSpec extends SparkSpec {
  import spark.implicits._

  private implicit val s: SparkSession = spark

  private def rows(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag)).toDF("ts", "v")

  test("time-ordered log: contained dirs drop without rewrite, straddlers rewrite, result equals the naive filter") {
    val root = tmpDir("graft_dr_")
    val store = new SnapshotBucketedStore(root, 8, "parquet", Seq("ts"))
    (0 until 8).foreach(g => store.append("log", rows(g * 100 until (g + 1) * 100, s"g$g")))
    val before = store.read("log").get.as[(Long, String)].collect().toSeq
    val vOld = store.snapshots("log").max

    // [200, 449]: gens 2 and 3 contained, gen 4 straddles (400-449)
    val (dropped, rewritten, untouched) =
      store.deleteRange("log", "ts", 200L, 449L).get
    assert((dropped, rewritten, untouched) == (2, 1, 5),
      s"classification was ($dropped, $rewritten, $untouched)")
    val after = store.read("log").get.as[(Long, String)].collect().toSeq
    assert(after.sortBy(_._1) ==
      before.filterNot(r => r._1 >= 200L && r._1 <= 449L).sortBy(_._1))
    // superseded snapshot still time-travels complete
    assert(store.readAt("log", vOld).get.count() == before.size)
    // a second identical sweep is a no-op classification-wise: the
    // rewritten dir's fresh stats put it outside the range now
    val (d2, r2, u2) = store.deleteRange("log", "ts", 200L, 449L).get
    assert(d2 == 0 && r2 == 0, s"re-sweep touched dirs: ($d2, $r2, $u2)")
  }

  test("a contained dir carrying nulls demotes to rewrite and the null rows survive") {
    val root = tmpDir("graft_dr_null_")
    val store = new SnapshotBucketedStore(root, 8, "parquet", Seq("ts"))
    store.append("log", rows(0 until 100, "g0"))
    // generation 1 sits entirely in [100, 199] by stats — but two of
    // its rows are NULL (min/max can't see them)
    val withNulls = Seq[(Option[Long], String)](
      (Some(100L), "g1"), (Some(150L), "g1"), (Some(199L), "g1"),
      (None, "keep_a"), (None, "keep_b")).toDF("ts", "v")
    store.append("log", withNulls)
    val (dropped, rewritten, _) =
      store.deleteRange("log", "ts", 100L, 199L).get
    assert(dropped == 0 && rewritten == 1,
      s"null-carrying dir must demote: ($dropped, $rewritten)")
    val left = store.read("log").get.select($"v")
      .as[String].collect().toSeq
    assert(left.count(_ == "keep_a") == 1 && left.count(_ == "keep_b") == 1,
      s"null rows lost: $left")
    assert(!left.contains("g1"))
  }

  test("bucketed keyed table: a full-range sweep drops every dir metadata-only and the table keeps taking upserts") {
    val root = tmpDir("graft_dr_bkt_")
    val store = new SnapshotBucketedStore(root, 8, "parquet", Seq("m"))
    val df = (0 until 200).map(i => (i.toLong, i * 1.5)).toDF("uuid", "m")
    store.upsert("t", df, "uuid")
    val (dropped, rewritten, untouched) =
      store.deleteRange("t", "m", 0.0, 1000.0).get
    assert(rewritten == 0 && untouched == 0 && dropped > 0,
      s"full sweep must be metadata-only: ($dropped, $rewritten, $untouched)")
    assert(store.read("t").forall(_.count() == 0))
    store.upsert("t", df.limit(10), "uuid")
    assert(store.read("t").get.count() == 10)
  }

  test("a crash before the commit leaves the previous snapshot serving") {
    val root = tmpDir("graft_dr_crash_")
    final class CrashingStore(r: String)(implicit s: SparkSession)
        extends SnapshotBucketedStore(r, 8, "parquet", Seq("ts")) {
      var crashNext = false
      override protected def beforeCommit(): Unit =
        if (crashNext) { crashNext = false; throw new RuntimeException("injected") }
    }
    val store = new CrashingStore(root)
    (0 until 4).foreach(g => store.append("log", rows(g * 100 until (g + 1) * 100, s"g$g")))
    store.crashNext = true
    intercept[RuntimeException](store.deleteRange("log", "ts", 100L, 250L))
    assert(store.read("log").get.count() == 400, "crash must not lose rows")
    // and the retried sweep completes
    assert(store.deleteRange("log", "ts", 100L, 250L).isDefined)
    assert(store.read("log").get.filter($"ts" >= 100L && $"ts" <= 250L).count() == 0)
    assert(store.read("log").get.count() == 400 - 151)
  }
}
