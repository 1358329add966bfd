package graft.io

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [[Expectations]] — write-time rules splitting a batch into a keyed
  * upsert and a labeled quarantine, exactly-once under a shared
  * batch id. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private implicit val s: SparkSession = spark

  private val rules = Seq(
    "id_positive" -> (col("id") > 0),
    "name_present" -> (col("name").isNotNull && length(col("name")) > 0),
    "score_range" -> (col("score") >= 0 && col("score") <= 100))

  private def batch(rows: (Long, String, Integer)*): DataFrame =
    rows.toDF("id", "name", "score")

  test("check labels every failed rule in declared order; null operands fail closed") {
    val marked = Expectations.check(
      batch((1L, "a", 50), (-2L, "", 50), (3L, null, 200),
        (4L, "d", null.asInstanceOf[Integer])),
      rules)
      .select($"id", $"violated").as[(Long, Option[String])]
      .collect().toMap
    assert(marked(1L).isEmpty)
    assert(marked(-2L).contains("id_positive,name_present"))
    // null name fails name_present CLOSED (isNotNull && ... is false,
    // not null, here — and the null score proves the coalesce path)
    assert(marked(3L).contains("name_present,score_range"))
    assert(marked(4L).contains("score_range"))
  }

  test("upsertChecked splits clean/quarantine, keyed re-sends converge, replayed epochs refused on both tables") {
    val root = tmpDir("graft_exp_")
    val store = new SnapshotBucketedStore(root, 8, "parquet")

    Expectations.upsertChecked(store, "t", "id",
      batch((1L, "a", 50), (2L, "", 50), (3L, "c", 101)),
      rules, batchId = Some(1L))
    def clean() = store.read("t").map(_.select($"id", $"name", $"score")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq).getOrElse(Nil)
    def quar() = store.read("t__quarantine")
      .map(_.select($"id", $"violated").as[(Long, String)]
        .collect().sortBy(_._1).toSeq).getOrElse(Nil)
    assert(clean() == Seq((1L, "a", 50)))
    assert(quar() == Seq((2L, "name_present"), (3L, "score_range")))

    // replay of epoch 1: both tables untouched
    val (v1, q1) = (store.snapshots("t").size,
      store.snapshots("t__quarantine").size)
    Expectations.upsertChecked(store, "t", "id",
      batch((1L, "a", 50), (2L, "", 50), (3L, "c", 101)),
      rules, batchId = Some(1L))
    assert(store.snapshots("t").size == v1)
    assert(store.snapshots("t__quarantine").size == q1)
    assert(clean() == Seq((1L, "a", 50)))
    assert(quar() == Seq((2L, "name_present"), (3L, "score_range")))

    // epoch 2: a fixed row 2 lands clean (keyed convergence), a
    // revised row 1 updates in place, a fresh violation quarantines
    Expectations.upsertChecked(store, "t", "id",
      batch((1L, "a2", 60), (2L, "b", 70), (-9L, "x", 50)),
      rules, batchId = Some(2L))
    assert(clean() == Seq((1L, "a2", 60), (2L, "b", 70)))
    assert(quar() == Seq((-9L, "id_positive"), (2L, "name_present"),
      (3L, "score_range")))
  }

  test("a crash between the clean upsert and the quarantine append heals on replay without double-landing") {
    val root = tmpDir("graft_exp_crash_")
    val store = new SnapshotBucketedStore(root, 8, "parquet")
    Expectations.upsertChecked(store, "t", "id",
      batch((1L, "a", 50), (2L, "", 50)), rules, batchId = Some(1L))

    // simulate the crash: epoch 2's clean half committed, quarantine
    // half didn't (its mark still at 1)
    store.upsertWithBatch("t",
      batch((4L, "d", 40)), "id", 2L)
    assert(store.lastAppliedBatch("t").contains(2L))
    assert(store.lastAppliedBatch("t__quarantine").contains(1L))

    // the replay of epoch 2: clean half refused (mark already at 2),
    // quarantine half lands exactly once
    Expectations.upsertChecked(store, "t", "id",
      batch((4L, "d", 40), (5L, "", 50)), rules, batchId = Some(2L))
    assert(store.read("t").get.filter($"id" === 4L).count() == 1)
    val q = store.read("t__quarantine").get.filter($"id" === 5L).count()
    assert(q == 1, s"quarantine row landed $q times")
    assert(store.lastAppliedBatch("t__quarantine").contains(2L))
  }
}
