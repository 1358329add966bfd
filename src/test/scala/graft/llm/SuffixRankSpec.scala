package graft.llm

import graft.SparkSpec

class SuffixRankSpec extends SparkSpec {
  import spark.implicits._

  /** JVM reference: lexicographic order over token sequences, proper
    * prefix first (the sentinel convention). */
  private val suffixOrdering: Ordering[Seq[String]] = new Ordering[Seq[String]] {
    def compare(x: Seq[String], y: Seq[String]): Int = {
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = x(i).compareTo(y(i))
        if (c != 0) return c
        i += 1
      }
      x.length.compareTo(y.length)
    }
  }

  test("suffix ranks order suffixes exactly like a JVM suffix sort") {
    val docs = Seq(
      (1L, "b a n a n a"),
      (2L, "a n a b"),
      (3L, "n a b a n"),
    ).toDF("doc_id", "text")
    val got = SuffixRank.suffixRanks(docs, "doc_id", "text")
      .as[(Long, Int, Long)].collect()
    val toks = Map(
      1L -> "b a n a n a".split(" ").toSeq,
      2L -> "a n a b".split(" ").toSeq,
      3L -> "n a b a n".split(" ").toSeq)
    val suffixes = toks.toSeq.flatMap { case (id, ts) =>
      ts.indices.map(p => ((id, p), ts.drop(p))) }
    assert(got.length == suffixes.length)
    // all ranks distinct and dense
    val ranks = got.map(_._3).sorted
    assert(ranks.toSeq == (1L to suffixes.length).toSeq)
    // the rank order equals the reference lexicographic suffix order.
    // Ties between IDENTICAL suffixes (same token tail in two docs)
    // may order either way — compare by suffix CONTENT, not identity.
    val bySuffixRank = got.sortBy(_._3).map { case (id, p, _) => toks(id).drop(p) }
    val reference = suffixes.map(_._2).sorted(suffixOrdering)
    assert(bySuffixRank.toSeq == reference.toSeq)
  }

  test("crossDocRepeats finds exactly the planted shared window, hash-free") {
    // docs 1 and 2 share the 4-token window "w x y z" once each;
    // doc 3 repeats a window internally but shares nothing cross-doc
    val docs = Seq(
      (1L, "p q w x y z r"),
      (2L, "w x y z s t u"),
      (3L, "m n m n m n m n"),
    ).toDF("doc_id", "text")
    val out = SuffixRank.crossDocRepeats(docs, "doc_id", "text", windowTokens = 4)
      .select("doc_id", "pos", "n_docs")
      .as[(Long, Int, Int)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq((1L, 2, 2), (2L, 0, 2)), s"got ${out.toSeq}")
  }

  test("windowTokens must be a power of two") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SuffixRank.crossDocRepeats(docs, "doc_id", "text", windowTokens = 5)
    }
  }
}
