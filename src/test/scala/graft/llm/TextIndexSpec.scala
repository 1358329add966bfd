package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val queries = Seq((1, "hash join strategy"),
    (2, "slow scan filter"), (3, "vector index build"),
    (4, "zzz unmatched terms")).toDF("qid", "qtext")

  private def newStore(root: String) =
    new graft.io.SnapshotBucketedStore(root, numBuckets = 16, "parquet",
      statsColumns = Seq("term"), keyColumns = Seq("term"),
      clusterColumn = Some("term"))(spark)

  test("stored BM25 ≡ inline across generations; term Blooms prune; idempotent re-send") {
    val store = newStore(tmpDir("graft_tix_") + "/tix")
    // TWO generations (append), so pruning and df-exactness must hold
    // across dirs, not within one commit
    val (a, b) = (docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 === 1))
    TextIndex.writeIndex(store, "t", a)
    TextIndex.writeIndex(store, "t", b)
    val inline = Retrieval.bm25TopK(docs, queries, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    val stored = TextIndex.bm25From(store, "t", queries, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(inline.nonEmpty && stored == inline,
      "stored-index BM25 must replay the inline ranking exactly")
    // membership pruning: the query's terms touch a strict subset of
    // dirs; a term the corpus never saw touches (almost) none
    val qt = Seq("hash", "join", "strategy")
    val (kept, total) = store.pruneEqAnyStats("t_postings", "term", qt).get
    assert(total >= 4 && kept < total,
      s"queried terms must prune some dirs: kept $kept/$total")
    val (keptNone, _) =
      store.pruneEqAnyStats("t_postings", "term", Seq("graftnosuchterm")).get
    assert(keptNone <= total / 2,
      s"an absent term should prune most dirs: kept $keptNone/$total")
    // at-least-once transport: re-sending unchanged docs converges
    val verBefore = store.snapshots("t_postings").max
    TextIndex.writeIndex(store, "t", a.limit(10))
    val resent = TextIndex.bm25From(store, "t", queries, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(resent == inline, "re-sent unchanged docs must not change rankings")
    assert(store.snapshots("t_postings").max > verBefore) // it DID commit
  }

  test("deleteDocs removes a doc from rankings; reindex rebuilds atomically; empty queries serve empty") {
    val store = newStore(tmpDir("graft_tixd_") + "/tix")
    TextIndex.writeIndex(store, "t", docs)
    val before = TextIndex.bm25From(store, "t", queries, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    val victim = before.head.getLong(2) // a served doc_id
    TextIndex.deleteDocs(store, "t", docs.filter($"doc_id" === victim))
    val after = TextIndex.bm25From(store, "t", queries, k = 5)
    assert(!after.select("doc_id").as[Long].collect().contains(victim),
      "deleted doc must not be served")
    // ...and its index rows are really gone, both tables
    assert(store.read("t_postings").get.filter($"id" === victim).count() == 0)
    assert(store.read("t_doclen").get.filter($"id" === victim).count() == 0)
    // the post-delete ranking ≡ inline over the post-delete corpus
    // (df/totals shrink with the doc — the index stays consistent)
    val inlineAfter = Retrieval.bm25TopK(
        docs.filter($"doc_id" =!= victim), queries, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(after.orderBy("qid", "rank").collect().toSeq == inlineAfter)
    // full rebuild restores the original index — and ≡ a fresh build
    TextIndex.reindex(store, "t", docs)
    val rebuilt = TextIndex.bm25From(store, "t", queries, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(rebuilt == before)
    // a query batch with no usable terms serves zero rows, not a crash
    val none = TextIndex.bm25From(store, "t",
      Seq((9, "")).toDF("qid", "qtext"), k = 5)
    assert(none.count() == 0)
  }
}
