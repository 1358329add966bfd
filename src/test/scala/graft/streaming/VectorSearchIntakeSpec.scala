package graft.streaming

import graft.SparkSpec
import graft.llm.{Ivf, IvfModel}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class VectorSearchIntakeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed serving ≡ batch searchPqFrom across drains; replay refused; empty-hit rows written") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val root = tmpDir("graft_vserve_")
    val cents = IvfModel.df(spark)
    val store = new graft.io.SnapshotBucketedStore(s"$root/vs", numBuckets = 16,
      "parquet", statsColumns = Seq("cell"), keyColumns = Seq("id"),
      clusterColumn = Some("cell"))
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    Ivf.writeIndex(store, "vs", emb, "vec_id", "embedding", cents)

    // queries arrive as a stream, in two drains, with an at-least-once
    // replay of two drain-1 queries in drain 2
    val queries = emb.filter($"vec_id" % 10 === 0).as[VecRow]
      .collect().sortBy(_.vec_id)
    val (first, second) = queries.splitAt(queries.length / 2)
    val input = MemoryStream[VecRow]
    input.addData(first: _*)
    VectorSearchIntake.drainTo(input.toDF(), store, "vs", "res",
      s"$root/ckpt", cents, topK = 5, nprobe = 2)
    input.addData(second ++ first.take(2): _*)
    VectorSearchIntake.drainTo(input.toDF(), store, "vs", "res",
      s"$root/ckpt", cents, topK = 5, nprobe = 2)

    // stream ≡ batch: the served results ARE the batch search
    val streamed = VectorSearchIntake.results(store, "res")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val batch = Ivf.searchPqFrom(store, "vs", emb, "vec_id", "embedding",
        cents, topK = 5, nprobe = 2, queryPred = col("vec_id") % 10 === 0)
      .select("query_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(streamed.nonEmpty && streamed == batch,
      "streamed serving must equal the batch search bit-for-bit")
    // every drained query has its row, even if nothing matched
    assert(store.read("res").get.count() == queries.length)

    // exactly-once: a replayed epoch is refused untouched
    val verBefore = store.snapshots("res").max
    val mark = store.lastAppliedBatch("res").get
    assert(!VectorSearchIntake.applyBatch(store, "vs", "res",
      emb.limit(3), mark, cents, 5, 2, "vec_id", "embedding"),
      "a replayed epoch must be refused")
    assert(store.snapshots("res").max == verBefore)

    // index drift: re-sending a query AFTER a neighbor was deleted
    // replaces the whole row — no stale hits survive the upsert
    val q0 = streamed.head._1
    val victim = streamed.find(_._1 == q0).get._2
    store.delete("vs", "id", Seq(victim).toDF("id"))
    assert(VectorSearchIntake.applyBatch(store, "vs", "res",
      emb.filter($"vec_id" === q0), mark + 1, cents, 5, 2,
      "vec_id", "embedding"))
    val refreshed = VectorSearchIntake.results(store, "res")
      .filter($"query_id" === q0).select("neighbor_id").as[Long].collect().toSet
    assert(!refreshed.contains(victim), "stale hit served after index delete")

    // zero-candidate queries still write their (empty) row: empty the
    // index entirely, re-serve another query
    store.delete("vs", "id", emb.select($"vec_id".as("id")))
    val q1 = second.head.vec_id
    assert(VectorSearchIntake.applyBatch(store, "vs", "res",
      emb.filter($"vec_id" === q1), mark + 2, cents, 5, 2,
      "vec_id", "embedding"))
    val row = store.read("res").get.filter($"id" === q1)
      .select(size($"hits")).as[Int].collect().toSeq
    assert(row == Seq(0), s"empty-index serve must write an empty-hits row: $row")
  }
}
