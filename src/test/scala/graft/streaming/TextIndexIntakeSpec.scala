package graft.streaming

import graft.SparkSpec
import graft.llm.{Retrieval, TextIndex}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

// top-level for encoder generation outside the suite
case class DocRow(doc_id: Long, text: String)

class TextIndexIntakeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed index ≡ batch build across drains; per-table marks heal a split crash; replay refused") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val root = tmpDir("graft_tixs_")
    val store = new graft.io.SnapshotBucketedStore(s"$root/tix", numBuckets = 16,
      "parquet", statsColumns = Seq("term"), keyColumns = Seq("term"),
      clusterColumn = Some("term"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val queries = Seq((1, "hash join strategy"), (2, "slow scan filter"),
      (3, "vector index build")).toDF("qid", "qtext")
    val all = docs.as[DocRow].collect().sortBy(_.doc_id)
    val (first, second) = all.splitAt(all.length / 2)

    val input = MemoryStream[DocRow]
    input.addData(first: _*)
    TextIndexIntake.drainTo(input.toDF(), store, "t", s"$root/ckpt")
    // drain 2: the rest + an at-least-once replay of 5 drain-1 docs
    input.addData(second ++ first.take(5): _*)
    TextIndexIntake.drainTo(input.toDF(), store, "t", s"$root/ckpt")

    // stream ≡ batch: search through the maintained index replays the
    // inline form over the union of everything drained
    val inline = Retrieval.bm25TopK(docs, queries, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    val stored = TextIndex.bm25From(store, "t", queries, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(inline.nonEmpty && stored == inline)

    // exactly-once: a full replay is refused with no commit
    val mark = store.lastAppliedBatch("t_postings").get
    val vBefore = (store.snapshots("t_postings").max,
      store.snapshots("t_doclen").max)
    assert(!TextIndexIntake.applyBatch(store, "t", docs.limit(3), mark,
      "doc_id", "text"), "a fully-replayed epoch must be refused")
    assert((store.snapshots("t_postings").max,
      store.snapshots("t_doclen").max) == vBefore)

    // split crash: doclen advanced to epoch N, postings did not
    // (crash between the two commits) — the replay applies ONLY the
    // lagging postings table, and the pair converges
    val crashBatch = docs.limit(7)
    store.upsertWithBatch("t_doclen",
      TextIndex.docLengthsOf(crashBatch, "doc_id", "text"), "id", mark + 1)
    assert(TextIndexIntake.applyBatch(store, "t", crashBatch, mark + 1,
      "doc_id", "text"), "the lagging table must still apply")
    assert(store.lastAppliedBatch("t_postings").get == mark + 1)
    val healed = TextIndex.bm25From(store, "t", queries, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(healed == inline, "post-heal index must still equal the batch build")
  }
}
