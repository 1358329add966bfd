package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

// top-level for encoder generation outside the suite
case class GovRow(id: Long, name: String, score: Int)

class ExpectationsIntakeSpec extends SparkSpec {

  test("streamed expectations ≡ batch split across drains; replays refused; fixes converge while quarantine keeps history") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val root = tmpDir("graft_expintake_")
    val store = new graft.io.SnapshotBucketedStore(s"$root/gov", 8, "parquet")
    val rules = Seq(
      "id_positive" -> (col("id") > 0),
      "name_present" -> (length(col("name")) > 0),
      "score_range" -> (col("score") >= 0 && col("score") <= 100))

    val input = MemoryStream[GovRow]
    def drain(): Unit = ExpectationsIntake.drainTo(input.toDF(), store,
      "t", "id", rules, s"$root/ckpt")

    input.addData(GovRow(1, "a", 50), GovRow(-2, "", 50), GovRow(3, "c", 200))
    drain()
    // drain 2: row 3 arrives FIXED (keyed convergence), plus a fresh
    // clean row and a fresh reject
    input.addData(GovRow(3, "c", 90), GovRow(4, "d", 10), GovRow(5, "", -1))
    drain()

    val clean = store.read("t").get.select($"id", $"name", $"score")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(clean == Seq((1L, "a", 50), (3L, "c", 90), (4L, "d", 10)))
    val quar = store.read("t__quarantine").get.select($"id", $"violated")
      .as[(Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    // epoch-1 reject of row 3 persists as audit even after the fix
    assert(quar == Seq((-2L, "id_positive,name_present"),
      (3L, "score_range"), (5L, "name_present,score_range")))

    // batch ≡ stream: the same rows through the batch operator into a
    // fresh store, one epoch per drain's content
    val store2 = new graft.io.SnapshotBucketedStore(s"$root/gov2", 8, "parquet")
    graft.io.Expectations.upsertChecked(store2, "t", "id",
      Seq((1L, "a", 50), (-2L, "", 50), (3L, "c", 200)).toDF("id", "name", "score"),
      rules, Some(0L))
    graft.io.Expectations.upsertChecked(store2, "t", "id",
      Seq((3L, "c", 90), (4L, "d", 10), (5L, "", -1)).toDF("id", "name", "score"),
      rules, Some(1L))
    val clean2 = store2.read("t").get.select($"id", $"name", $"score")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    val quar2 = store2.read("t__quarantine").get.select($"id", $"violated")
      .as[(Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(clean == clean2 && quar == quar2,
      "stream and batch must land identical tables")

    // a replayed epoch is refused on BOTH tables
    val (v, qv) = (store.snapshots("t").size,
      store.snapshots("t__quarantine").size)
    graft.io.Expectations.upsertChecked(store, "t", "id",
      Seq((9L, "x", 50), (-9L, "x", 50)).toDF("id", "name", "score"),
      rules, store.lastAppliedBatch("t"))
    assert(store.snapshots("t").size == v)
    assert(store.snapshots("t__quarantine").size == qv)
  }
}
