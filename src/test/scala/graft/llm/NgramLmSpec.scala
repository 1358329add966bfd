package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stupid Backoff trigram LM (X209): hand-computed fixture scores
  * exercise every tier of the backoff chain, the boundary rule
  * (doc-start positions score penalty-free at their highest
  * AVAILABLE order), the pruning threshold, and the conservative
  * unseen-unigram rule on a frozen serve; band filter and CCNet
  * tertiles ride the same scores.
  *
  * Fixture corpus (minCount = 2, penaltyBits = 2):
  *   doc1 "a b c", doc2 "a b c", doc3 "a b d"
  * T = 9, bl(T) = 4. Unigrams a:3 b:3 c:2 d:1 (unpruned).
  * Surviving bigrams: "a b":3, "b c":2 (pruned: "b d":1).
  * Surviving trigrams: "a b c":2 (pruned: "a b d":1).
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b c"), (2L, "a b c"), (3L, "a b d"),
  ).toDF("doc_id", "text")

  private def model = NgramLm.fit(corpus, minCount = 2)

  test("fit: pruning keeps unigrams, cuts sub-threshold higher orders; total exact") {
    val m = model
    assert(m.totalTokens == 9L)
    val byOrd = m.grams.groupBy("ord").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byOrd(1) == 4, s"4 distinct unigrams expected, got $byOrd") // a b c d
    assert(byOrd(2) == 2, "only 'a b' and 'b c' survive minCount=2")
    assert(byOrd(3) == 1, "only 'a b c' survives minCount=2")
    val minCnt = m.grams.filter(col("ord") >= 2).agg(min("cnt")).head.getLong(0)
    assert(minCnt >= 2, "pruned table must hold no sub-threshold row")
  }

  test("tokenScores: every tier + the boundary rule, hand-computed") {
    val ts = NgramLm.tokenScores(corpus, model).orderBy("id", "p")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // doc1 "a b c": p0 unigram tier avail=1 no penalty: bl(3)-bl(9) = -2
    //               p1 bigram tier ("a b",3 | "a",3): 2-2-0 = 0
    //               p2 trigram tier ("a b c",2 | "a b",3): 2-2 = 0
    assert(ts.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0, 1, -2), (1L, 1, 2, 0), (1L, 2, 3, 0)))
    // doc3 "a b d": p2 — trigram AND bigram pruned → unigram tier
    //               with full backoff: bl(1)-bl(9)-2·2 = -7
    assert(ts.filter(_._1 == 3L).toSeq == Seq(
      (3L, 0, 1, -2), (3L, 1, 2, 0), (3L, 2, 1, -7)))
  }

  test("docScores: sums and the one-division mean") {
    val ds = NgramLm.docScores(corpus, model).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(ds(0) == (1L, 3L, -2L, -2.0 / 3))
    assert(ds(1) == (2L, 3L, -2L, -2.0 / 3))
    assert(ds(2) == (3L, 3L, -9L, -3.0))
  }

  test("frozen serve: unseen unigram counts as 1 (rarest possible)") {
    val fresh = Seq((10L, "a b z q"), (11L, "a")).toDF("doc_id", "text")
    val ts = NgramLm.tokenScores(fresh, model).orderBy("id", "p")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(3)))
    // p2 "z": unseen → bl(1)-bl(9)-2·2 = -7; p3 "q": same (its bigram
    // is absent and its unigram unseen)
    assert(ts.filter(_._1 == 10L).map(_._3).toSeq == Seq(-2, 0, -7, -7))
    // single-token doc: avail=1, penalty-free unigram tier
    assert(ts.filter(_._1 == 11L).toSeq == Seq((11L, 0, -2)))
  }

  test("bandFilter keeps exactly the in-band docs") {
    val kept = NgramLm.bandFilter(corpus, model, lo = -1.0, hi = 0.0)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L), s"docs 1,2 (mean -2/3) in band; got $kept")
  }

  test("perplexityTertiles: head/middle/tail by exact tertile cutpoints") {
    val buckets = NgramLm.perplexityTertiles(corpus, model)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // means: doc1 -2/3, doc2 -2/3, doc3 -3; cutpoints at ranks 1,2 of
    // the ascending (mean, id) order → c1=-3, c2=-2/3
    assert(buckets == Map(1L -> "head", 2L -> "head", 3L -> "middle"))
  }
}
