package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def q(s: String) = Seq((1, s)).toDF("qid", "qtext")

  test("higher tf wins at equal length; shorter doc wins at equal tf") {
    val docs = Seq(
      (1L, "cat cat cat dog dog dog"), // tf(cat)=3, dl=6
      (2L, "cat cat dog dog dog dog"), // tf(cat)=2, dl=6
      (3L, "cat mouse"),               // tf(cat)=1, dl=2
      (4L, "cat mouse mouse mouse"),   // tf(cat)=1, dl=4
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25TopK(docs, q("cat"), k = 4)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(r.indexOf(1L) < r.indexOf(2L), s"tf order violated: $r")
    assert(r.indexOf(3L) < r.indexOf(4L), s"dl order violated: $r")
  }

  test("rarer query term contributes more than a ubiquitous one") {
    val docs = Seq(
      (1L, "rare filler filler filler"),
      (2L, "common filler filler filler"),
      (3L, "common stuff other words"),
      (4L, "common words again here"),
      (5L, "common and more common here"),
    ).toDF("doc_id", "text")
    // doc 1 matches only 'rare' (df=1); doc 3..5 match only 'common'
    // (df=4): at comparable tf/dl the rare match must outscore
    val r = Retrieval.bm25TopK(docs, q("rare common"), k = 5)
      .orderBy("rank").select("doc_id", "score").as[(Long, Long)].collect()
    assert(r.head._1 == 1L, s"rare-term doc must rank first: ${r.toSeq}")
  }

  test("k caps output; ties break on doc_id ascending") {
    val docs = Seq(
      (10L, "x y"), (11L, "x y"), (12L, "x y"), (13L, "x y"),
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25TopK(docs, q("x"), k = 3)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(r == Seq(10L, 11L, 12L), s"tie-break order: $r")
  }

  test("unmatched query vocabulary yields no rows") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    assert(Retrieval.bm25TopK(docs, q("gamma delta"), k = 5).count() == 0L)
  }

  test("scores are partition-count invariant and re-run identical") {
    val docs = (1L to 200L).map(i =>
      (i, s"term${i % 7} term${i % 3} filler word number${i % 11}"))
      .toDF("doc_id", "text")
    val qs = Seq((1, "term1 number4"), (2, "term2 filler")).toDF("qid", "qtext")
    val a = Retrieval.bm25TopK(docs, qs, k = 10)
      .orderBy("qid", "rank").collect().toSeq
    val b = Retrieval.bm25TopK(docs.repartition(13), qs, k = 10)
      .orderBy("qid", "rank").collect().toSeq
    assert(a == b)
  }

  test("multi-term scores are exact sums of single-term scores") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple apple date"),
      (3L, "banana date fig"),
    ).toDF("doc_id", "text")
    def scores(query: String) =
      Retrieval.bm25TopK(docs, q(query), k = 3)
        .select("doc_id", "score").as[(Long, Long)].collect().toMap
    val ab = scores("apple banana")
    val a = scores("apple")
    val b = scores("banana")
    for ((id, s) <- ab)
      assert(s == a.getOrElse(id, 0L) + b.getOrElse(id, 0L),
        s"doc $id: $s != ${a.getOrElse(id, 0L)} + ${b.getOrElse(id, 0L)}")
  }
}
