package graft.streaming

import graft.SparkSpec
import graft.llm.TextIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

// top-level for encoder generation outside the suite
case class QRow(qid: Long, qtext: String)

class TextSearchIntakeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed BM25 serving ≡ batch bm25From; empty-hit rows; replay refused; deletes converge") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val root = tmpDir("graft_tserve_")
    val store = new graft.io.SnapshotBucketedStore(s"$root/tix", numBuckets = 16,
      "parquet", statsColumns = Seq("term"), keyColumns = Seq("term"),
      clusterColumn = Some("term"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    TextIndex.writeIndex(store, "t", docs)

    val qs = Seq(QRow(1, "hash join strategy"), QRow(2, "slow scan filter"),
      QRow(3, "vector index build"), QRow(4, "zzz unmatched terms"))
    val input = MemoryStream[QRow]
    input.addData(qs.take(2): _*)
    TextSearchIntake.drainTo(input.toDF(), store, "t", "res",
      s"$root/ckpt", topK = 5)
    // drain 2: the rest + an at-least-once replay of query 1
    input.addData(qs.drop(2) :+ qs.head: _*)
    TextSearchIntake.drainTo(input.toDF(), store, "t", "res",
      s"$root/ckpt", topK = 5)

    val streamed = TextSearchIntake.results(store, "res")
      .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val batch = TextIndex.bm25From(store, "t",
        qs.toDF(), k = 5)
      .select("qid", "rank", "doc_id", "score")
      .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(streamed.nonEmpty && streamed == batch,
      "streamed serving must equal the batch search bit-for-bit")
    // the unmatched-vocabulary query has its row, with zero hits
    assert(store.read("res").get.count() == 4)
    assert(store.read("res").get.filter($"id" === 4L)
      .select(size($"hits")).as[Int].head() == 0,
      "no-evidence queries must store an empty-hits row")

    // replayed epoch refused untouched
    val mark = store.lastAppliedBatch("res").get
    val vBefore = store.snapshots("res").max
    assert(!TextSearchIntake.applyBatch(store, "t", "res",
      qs.take(1).toDF(), mark, 5, "qid", "qtext"))
    assert(store.snapshots("res").max == vBefore)

    // index shrinks: delete a served doc, re-serve its query — the
    // whole-row replace drops the stale hit
    val q1hits = streamed.filter(_._1 == 1L)
    val victim = q1hits.head._3
    TextIndex.deleteDocs(store, "t", docs.filter($"doc_id" === victim))
    assert(TextSearchIntake.applyBatch(store, "t", "res",
      qs.take(1).toDF(), mark + 1, 5, "qid", "qtext"))
    val refreshed = TextSearchIntake.results(store, "res")
      .filter($"qid" === 1L).select("doc_id").as[Long].collect().toSet
    assert(!refreshed.contains(victim), "stale hit served after index delete")
  }
}
