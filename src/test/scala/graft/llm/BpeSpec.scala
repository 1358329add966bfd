package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  private def docs(texts: String*) = {
    val s = spark
    import s.implicits._
    texts.toDF("text")
  }

  test("induceMerges replays the textbook example deterministically") {
    // corpus: "aaab" ×3, "ab" ×2 — freq-weighted pair counts round 1:
    //   (a,a): 2 per "aaab" × 3 = 6   (overlapping count)
    //   (a,b): 1×3 + 1×2 = 5
    // round 1 merges (a,a) → "aa"; "aaab" → [aa, a, b], "ab" → [a, b]
    // round 2 counts: (aa,a)=3, (a,b)=5 → merges (a,b) → "ab"
    // round 3: "aaab" → [aa, ab], "ab" → [ab]; (aa,ab)=3 → "aaab"
    val m = Bpe.induceMerges(
      docs("aaab aaab aaab ab ab"), "text", rounds = 3)
    assert(m.map(x => (x.round, x.lhs, x.rhs, x.merged, x.cnt)) === Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 5L),
      (3, "aa", "ab", "aaab", 3L)))
  }

  test("merge application is left-to-right non-overlapping on equal-symbol runs") {
    // "aaaa": (a,a) counts 3 overlapping; the merge rewrites to
    // (aa)(aa) — NOT (aa)(a)(a) or one greedy (aa) — and "aaa" keeps
    // its odd trailing a. Round 2's top pair is then (aa,aa) from
    // "aaaa" (freq 2) vs (aa,a) from "aaa" (freq 1).
    val m = Bpe.induceMerges(docs("aaaa aaaa aaa"), "text", rounds = 2)
    assert(m(0).merged === "aa" && m(0).cnt === 2 * 3 + 2)
    assert(m(1).lhs === "aa" && m(1).rhs === "aa" && m(1).cnt === 2L)
  }

  test("induction stops early when the corpus fuses completely") {
    // "ab" alone: round 1 merges (a,b); nothing is left to count
    val m = Bpe.induceMerges(docs("ab ab"), "text", rounds = 10)
    assert(m.size === 1 && m.head.merged === "ab")
  }

  test("minCount gates rare merges") {
    val m = Bpe.induceMerges(docs("ab cd cd"), "text", rounds = 10, minCount = 2L)
    // (c,d) appears twice, (a,b) once — only the former survives the gate
    assert(m.map(_.merged) === Seq("cd"))
  }

  test("merge sequence is invariant to input partitioning") {
    val d = docs(Seq.fill(7)("the theme thesis").mkString(" ")).repartition(5)
    val a = Bpe.induceMerges(d, "text", rounds = 4)
    val b = Bpe.induceMerges(d.coalesce(1), "text", rounds = 4)
    assert(a === b)
    // (t,h) and (h,e) both ride every word (21 each); the tie breaks
    // lexicographically on the LEFT symbol — h < t picks (h,e)
    assert(a.head.merged === "he")
  }

  test("batched argmax equals the sequential merge sequence at every batch size") {
    // mixed corpus with fused-symbol reuse, equal-run overlap cases,
    // and real-word structure — the surfaces where an unsafe batch
    // would diverge
    val corpus = docs(
      "aaab aaab aaab ab ab aaaa aaa",
      Seq.fill(4)("banana bandana cabana").mkString(" "),
      "low lower lowest newest newest widest")
    val seq = Bpe.induceMerges(corpus, "text", rounds = 12)
    for (b <- Seq(1, 3, 8, 32)) {
      val bat = Bpe.induceMergesBatched(corpus, "text", rounds = 12, batch = b)
      assert(bat === seq, s"batch=$b diverged")
    }
  }

  test("batched argmax survives adversarial interaction ties") {
    // round-1 counts: (a,b)=4, (b,c)=4, (x,y)=4, (c,d)=3 — the top
    // three tie, (b,c) interacts with (a,b), and a naive batch that
    // applied {(a,b),(x,y)} would have to prove no new pair outranks
    // (b,c) at the tie; the safe rule keeps only the head at a tie
    // with the first interactor's count, so the sequence must equal
    // sequential exactly
    val corpus = docs(
      Seq.fill(4)("abc").mkString(" "),
      Seq.fill(4)("xy").mkString(" "),
      Seq.fill(3)("cd").mkString(" "))
    val seq = Bpe.induceMerges(corpus, "text", rounds = 6)
    for (b <- Seq(2, 4, 16)) {
      val bat = Bpe.induceMergesBatched(corpus, "text", rounds = 6, batch = b)
      assert(bat === seq, s"batch=$b diverged")
    }
    // minCount gates identically
    val seqMin = Bpe.induceMerges(corpus, "text", rounds = 6, minCount = 4L)
    val batMin = Bpe.induceMergesBatched(corpus, "text", rounds = 6,
      minCount = 4L, batch = 4)
    assert(batMin === seqMin)
  }

  test("batched argmax respects the rounds budget across one batch") {
    // plenty of disjoint mergeable pairs; rounds=2 must stop at 2
    // merges even when the batch could safely take more
    val corpus = docs("ab ab cd cd ef ef gh gh")
    val bat = Bpe.induceMergesBatched(corpus, "text", rounds = 2, batch = 8)
    val seq = Bpe.induceMerges(corpus, "text", rounds = 2)
    assert(bat === seq && bat.length === 2)
  }

  test("byte-level induction equals char-level on printable ASCII (identity byte map)") {
    val corpus = docs("aaab aaab aaab ab ab", "the quick fox the fox")
    val byte = Bpe.induceMergesBytes(corpus, "text", rounds = 5)
    val chr = Bpe.induceMerges(corpus, "text", rounds = 5)
    assert(byte === chr, "printable ASCII bytes map to themselves")
  }

  test("byte-level induction fuses multi-byte scripts with zero OOV") {
    // "дом" = 6 UTF-8 bytes; char-level would see 3 exotic chars, the
    // byte map sees 6 known symbols from the 256-symbol base alphabet
    val corpus = docs(Seq.fill(4)("дом дым дом").mkString(" "))
    val merges = Bpe.induceMergesBytes(corpus, "text", rounds = 5)
    assert(merges.nonEmpty)
    // the top merged symbol decodes back to real UTF-8 — and the full
    // fusion of the most frequent word appears within 5 rounds
    assert(merges.exists(m => Bpe.byteDecode(m.merged) == "дом"),
      merges.map(m => Bpe.byteDecode(m.merged)).mkString(","))
    // batched-argmax equivalence holds on the byte table too
    val bat = Bpe.induceMergesBytesBatched(corpus, "text", rounds = 5, batch = 4)
    assert(bat === merges)
  }

  test("byte-level vocab tokenizes mixed-script text with no OOV tail") {
    val corpus = docs(Seq.fill(5)("данные クエリ data").mkString(" "))
    val vocab = Bpe.vocabFromMerges(
      Bpe.induceMergesBytes(corpus, "text", rounds = 12))
    val counted = corpus
      .select(
        TextOps.subwordCount(Bpe.byteEncodeWords(col("text")), vocab).as("n_sub"),
        TextOps.subwordCount(Bpe.byteEncodeWords(col("text")),
          Seq("graft_never_matches_")).as("n_byte"),
        TextOps.tokenCount(col("text")).as("n_ws"))
      .head()
    // per-byte fallback: 15 words x (12+9+4 bytes) when nothing merges
    assert(counted.getInt(1) === 5 * (12 + 9 + 4))
    // merges compress well below the byte count, never below 1/word
    assert(counted.getInt(0) < counted.getInt(1))
    assert(counted.getInt(0) >= counted.getInt(2))
  }

  test("induced vocab round-trips through the subword tokenizer") {
    val corpus = docs(Seq.fill(5)("banana bandana cabana").mkString(" "))
    val merges = Bpe.induceMerges(corpus, "text", rounds = 6)
    val vocab = Bpe.vocabFromMerges(merges)
    // longest-first so greedy longest-match consumes whole merges
    assert(vocab === vocab.sortBy(v => (-v.length, v)))
    // the induced vocab drives TextOps.subwordCount (the q37
    // tokenizer): counts must be <= the char count and >= the
    // whitespace token count, and a vocab covering more text tokenizes
    // to FEWER pieces than the empty (per-char fallback) vocab
    val counted = corpus
      .select(
        TextOps.subwordCount(col("text"), vocab).as("n_sub"),
        TextOps.subwordCount(col("text"), Seq("graft_never_matches_")).as("n_char"),
        TextOps.tokenCount(col("text")).as("n_ws"))
      .head()
    assert(counted.getInt(0) < counted.getInt(1))
    assert(counted.getInt(0) >= counted.getInt(2))
  }
}
