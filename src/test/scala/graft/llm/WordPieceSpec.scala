package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {

  private def docs(texts: String*) = {
    val s = spark
    import s.implicits._
    texts.toDF("text")
  }

  test("likelihood argmax picks the rare-but-cohesive pair over the raw count max") {
    // "xy" ×30: pair (x,##y) cnt 30, u(x)=30, u(##y)=30 → score 30/900
    // "qr" ×8:  pair (q,##r) cnt 8,  u(q)=8,  u(##r)=8  → score 8/64
    // BPE's count argmax would take (x,##y); WordPiece's likelihood
    // score 1/8 > 1/30 takes (q,##r) — the defining difference.
    val text = (Seq.fill(30)("xy") ++ Seq.fill(8)("qr")).mkString(" ")
    val m = WordPiece.induceMerges(docs(text), "text", rounds = 1)
    assert(m.map(x => (x.lhs, x.rhs, x.merged, x.cnt, x.lhsCnt, x.rhsCnt)) ===
      Seq(("q", "##r", "qr", 8L, 8L, 8L)))
    val bpe = Bpe.induceMerges(docs(text), "text", rounds = 1)
    assert(bpe.head.lhs === "x") // the count argmax really is the other pair
  }

  test("## decomposition, tie-break, and continuation-fused symbols") {
    // "abc" ×5 → [a, ##b, ##c]: round-1 pairs (a,##b) and (##b,##c)
    // both cnt 5 with all unigrams 5 → equal scores → smallest pair
    // lexicographically is (##b,##c) ('#' < 'a') → fused "##bc" (the
    // marker survives on the left edge). Round 2 fuses (a,##bc) → "abc".
    val m = WordPiece.induceMerges(docs(Seq.fill(5)("abc").mkString(" ")),
      "text", rounds = 2)
    assert(m.map(x => (x.round, x.lhs, x.rhs, x.merged)) === Seq(
      (1, "##b", "##c", "##bc"),
      (2, "a", "##bc", "abc")))
  }

  test("vocab collects base symbols plus merges; encode serves greedily with [UNK]") {
    // scores round 1: (x,##y) 3/9 beats the 5/25 ties → "xy";
    // round 2: (a,##b) vs (##b,##c) tie → smallest pair → "##bc"
    val corpus = docs((Seq.fill(5)("abc") ++ Seq.fill(3)("xy")).mkString(" "))
    val merges = WordPiece.induceMerges(corpus, "text", rounds = 2)
    assert(merges.map(_.merged) === Seq("xy", "##bc"))
    val v = WordPiece.vocab(corpus, "text", merges)
    assert(v === Seq("##b", "##bc", "##c", "##y", "a", "x", "xy"))
    val s = spark
    import s.implicits._
    def enc(t: String): String =
      Seq(t).toDF("t").select(WordPiece.encode($"t", v).as("e")).head().getString(0)
    assert(enc("abc") === "a ##bc")        // longest continuation wins
    assert(enc("ab") === "a ##b")
    assert(enc("xy abc") === "xy a ##bc")  // whole-word piece wins
    // any uncovered POSITION voids the whole word (BERT rule): 'a' is
    // never a continuation and 'q' never a start in this corpus
    assert(enc("abcabc") === "[UNK]")
    assert(enc("xq") === "[UNK]")
    assert(enc("zz") === "[UNK]")          // unseen start char
    assert(enc("") === "")
    assert(enc("  abc  ") === "a ##bc")    // empty split tokens skipped
  }

  test("repartition invariance of the fit") {
    val base = docs(
      "the cat sat on the mat", "the bat and the cat", "mat mat cat",
      "on and on and on", "sat bat mat the")
    val a = WordPiece.induceMerges(base.repartition(1), "text", rounds = 4)
    val b = WordPiece.induceMerges(base.repartition(7), "text", rounds = 4)
    assert(a === b)
  }

  test("minCount dries the loop; empty corpus yields no merges") {
    assert(WordPiece.induceMerges(docs(""), "text", rounds = 3).isEmpty)
    // every pair occurs once; minCount=2 stops at round 0
    assert(WordPiece.induceMerges(docs("ab cd"), "text", rounds = 3,
      minCount = 2L).isEmpty)
  }

  test("'#'-bearing corpus: the bare '##' fuse is vocab-filtered and fit→encode stays total") {
    // the word "##" decomposes to [#, ###]; fusing that pair yields the
    // string "##" — the bare continuation marker, which WordPieceEncode
    // rejects as a piece. vocab() must drop it so the fit→encode
    // composition cannot crash on a legal corpus.
    val corpus = docs(Seq.fill(4)("##").mkString(" "))
    val merges = WordPiece.induceMerges(corpus, "text", rounds = 1)
    assert(merges.map(_.merged) === Seq("##"))
    val v = WordPiece.vocab(corpus, "text", merges)
    assert(!v.contains("##"))
    assert(v === Seq("#", "###"))
    val s = spark
    import s.implicits._
    val enc = Seq("##").toDF("t")
      .select(WordPiece.encode($"t", v).as("e")).head().getString(0)
    assert(enc === "# ###") // char pieces still cover the literal word
  }
}
