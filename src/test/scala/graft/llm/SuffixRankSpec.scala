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

  test("suffixRanks terminates on identical cross-doc suffixes and shares their rank") {
    // doc 1 and doc 2 are byte-identical; doc 3 merely shares the
    // final token. Pre-fix this spun forever: tied suffixes can never
    // reach #ranks == #suffixes, so the loop must stop at the
    // refinement fixpoint instead.
    val docs = Seq(
      (1L, "a b a"),
      (2L, "a b a"),
      (3L, "c a"),
    ).toDF("doc_id", "text")
    val got = SuffixRank.suffixRanks(docs, "doc_id", "text")
      .as[(Long, Int, Long)].collect()
    assert(got.length == 8)
    val toks = Map(
      1L -> Seq("a", "b", "a"), 2L -> Seq("a", "b", "a"), 3L -> Seq("c", "a"))
    val rankOf = got.map { case (id, p, r) => (toks(id).drop(p), r) }
    // identical suffix content ⟺ identical rank (both directions)
    rankOf.groupBy(_._1).foreach { case (s, rs) =>
      assert(rs.map(_._2).distinct.length == 1, s"suffix $s got ranks ${rs.map(_._2).toSeq}")
    }
    val distinctContents = rankOf.map(_._1).distinct
    val ranks = rankOf.map(_._2).distinct.sorted
    // dense over distinct CONTENTS, ordered lexicographically
    assert(ranks.toSeq == (1L to distinctContents.length).toSeq)
    val contentByRank = rankOf.distinct.sortBy(_._2).map(_._1)
    assert(contentByRank.toSeq == distinctContents.sorted(suffixOrdering).toSeq)
  }

  test("crossDocRepeats survives one window class shared by every doc (skew fixture)") {
    // 200 docs all containing the same hot 4-token boilerplate window:
    // the per-class doc count must be an aggregate joined back on the
    // class id, never a per-row occurrence list — O(M²) on this shape.
    val n = 200
    val docs = (1 to n).map(i => (i.toLong, s"u$i v$i hot1 hot2 hot3 hot4 w$i"))
      .toDF("doc_id", "text")
    val out = SuffixRank.crossDocRepeats(docs, "doc_id", "text", windowTokens = 4)
      .select("doc_id", "pos", "n_docs")
      .as[(Long, Int, Int)].collect()
    assert(out.length == n, s"expected one hot-window row per doc, got ${out.length}")
    assert(out.forall { case (_, pos, nd) => pos == 2 && nd == n }, s"got ${out.take(5).toSeq}")
    assert(out.map(_._1).distinct.length == n)
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

  test("maximalCrossDocRepeats matches a JVM brute-force reference") {
    val toks = Map(
      1L -> "the quick brown fox jumps over the lazy dog".split(" ").toSeq,
      2L -> "a quick brown fox jumps over a fence".split(" ").toSeq,
      3L -> "the lazy dog sleeps now".split(" ").toSeq,
      4L -> "the lazy dog sleeps now".split(" ").toSeq, // identical doc → full-length tie
    )
    val docs = toks.toSeq.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = SuffixRank.maximalCrossDocRepeats(docs, "doc_id", "text", minTokens = 2)
      .as[(Long, Int, Long, Int, Int)].collect().toSet
    // brute force: sort all suffixes by (content, doc, pos); adjacent
    // cross-doc pairs; LCP by token walk; left-maximality filter
    val sorted = toks.toSeq
      .flatMap { case (id, ts) => ts.indices.map(p => (id, p, ts.drop(p))) }
      .sortBy { case (id, p, s) => (s, id, p) }(
        Ordering.Tuple3(suffixOrdering, implicitly[Ordering[Long]], implicitly[Ordering[Int]]))
    val expected = sorted.sliding(2).collect {
      case Seq((ia, pa, sa), (ib, pb, sb)) if ia != ib =>
        val lcp = sa.zip(sb).takeWhile { case (x, y) => x == y }.size
        (ia, pa, ib, pb, lcp)
    }.filter(_._5 >= 2)
      .filter { case (ia, pa, ib, pb, _) =>
        pa == 0 || pb == 0 || toks(ia)(pa - 1) != toks(ib)(pb - 1)
      }.toSet
    assert(got == expected, s"\ngot      ${got.toSeq.sorted}\nexpected ${expected.toSeq.sorted}")
    // the planted repeats surface at full length
    assert(expected.exists { case (_, _, _, _, l) => l == 5 }) // "quick brown fox jumps over"
    assert(got.exists { case (ia, _, ib, _, l) =>
      Set(ia, ib) == Set(3L, 4L) && l == 5 }) // identical docs, whole text
  }

  test("maximalCrossDocRepeats reports full LCP for identical docs with no chaff") {
    // Two byte-identical docs of 12 distinct tokens and NOTHING else:
    // seed ranks already separate every within-doc suffix, so doubling
    // hits its refinement fixpoint after ONE round (levels 0 and 1
    // only). Pre-fix the LCP descent could accumulate at most
    // 2^0 + 2^1 = 3 tokens and the full-length duplicate was dropped
    // by minTokens=4; the fixpoint property (equal top-level ranks ⟹
    // suffixes identical to their ends) must saturate acc instead.
    val ts = "t01 t02 t03 t04 t05 t06 t07 t08 t09 t10 t11 t12".split(" ").toSeq
    val docs = Seq((1L, ts.mkString(" ")), (2L, ts.mkString(" ")))
      .toDF("doc_id", "text")
    val got = SuffixRank.maximalCrossDocRepeats(docs, "doc_id", "text", minTokens = 4)
      .as[(Long, Int, Long, Int, Int)].collect().toSet
    val toks = Map(1L -> ts, 2L -> ts)
    val sorted = toks.toSeq
      .flatMap { case (id, t) => t.indices.map(p => (id, p, t.drop(p))) }
      .sortBy { case (id, p, s) => (s, id, p) }(
        Ordering.Tuple3(suffixOrdering, implicitly[Ordering[Long]], implicitly[Ordering[Int]]))
    val expected = sorted.sliding(2).collect {
      case Seq((ia, pa, sa), (ib, pb, sb)) if ia != ib =>
        val lcp = sa.zip(sb).takeWhile { case (x, y) => x == y }.size
        (ia, pa, ib, pb, lcp)
    }.filter(_._5 >= 4)
      .filter { case (ia, pa, ib, pb, _) =>
        pa == 0 || pb == 0 || toks(ia)(pa - 1) != toks(ib)(pb - 1)
      }.toSet
    assert(got == expected, s"\ngot      ${got.toSeq.sorted}\nexpected ${expected.toSeq.sorted}")
    // the whole-document duplicate surfaces at its true length
    assert(got.exists(_._5 == 12), s"full-length LCP missing from ${got.toSeq.sorted}")
  }

  test("windowTokens must be a power of two") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SuffixRank.crossDocRepeats(docs, "doc_id", "text", windowTokens = 5)
    }
  }

  test("every suffix entry point returns empty on an empty corpus, no NPE") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text").filter($"doc_id" < 0)
    assert(SuffixRank.suffixRanks(docs, "doc_id", "text").collect().isEmpty)
    assert(SuffixRank.crossDocRepeats(docs, "doc_id", "text", 4).collect().isEmpty)
    assert(SuffixRank.maximalCrossDocRepeats(docs, "doc_id", "text", 2)
      .collect().isEmpty)
  }

  /** JVM brute force for maximalCrossDocRepeats: sort all suffixes by
    * (content, doc, pos), take adjacent cross-doc pairs, LCP by token
    * walk, then the minTokens and left-maximality filters. */
  private def bruteForce(
      toks: Map[Long, Seq[String]], minTokens: Int): Set[(Long, Int, Long, Int, Int)] = {
    val sorted = toks.toSeq
      .flatMap { case (id, ts) => ts.indices.map(p => (id, p, ts.drop(p))) }
      .sortBy { case (id, p, s) => (s, id, p) }(
        Ordering.Tuple3(suffixOrdering, implicitly[Ordering[Long]], implicitly[Ordering[Int]]))
    sorted.sliding(2).collect {
      case Seq((ia, pa, sa), (ib, pb, sb)) if ia != ib =>
        val lcp = sa.zip(sb).takeWhile { case (x, y) => x == y }.size
        (ia, pa, ib, pb, lcp)
    }.filter(_._5 >= minTokens)
      .filter { case (ia, pa, ib, pb, _) =>
        pa == 0 || pb == 0 || toks(ia)(pa - 1) != toks(ib)(pb - 1)
      }.toSet
  }

  test("the long-doc join path is pointwise equivalent to the window path") {
    // LongDocThreshold is the only switch between the per-doc window
    // and the shifted self-join formulations (seed included). Force
    // the join path by lowering it below the fixture's doc lengths and
    // assert every entry point returns EXACTLY the window path's
    // output — same ranks, same repeats, same classes.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox jumps over a fence"),
      (3L, "the lazy dog sleeps now"),
    ).toDF("doc_id", "text")
    val ranksW = SuffixRank.suffixRanks(docs, "doc_id", "text")
      .as[(Long, Int, Long)].collect().toSet
    val repeatsW = SuffixRank.maximalCrossDocRepeats(docs, "doc_id", "text", 2)
      .as[(Long, Int, Long, Int, Int)].collect().toSet
    val windowsW = SuffixRank.crossDocRepeats(docs, "doc_id", "text", 4)
      .as[(Long, Int, Long, Int)].collect().toSet
    val saved = SuffixRank.LongDocThreshold
    try {
      SuffixRank.LongDocThreshold = 2L // every doc is now "long"
      val ranksJ = SuffixRank.suffixRanks(docs, "doc_id", "text")
        .as[(Long, Int, Long)].collect().toSet
      val repeatsJ = SuffixRank.maximalCrossDocRepeats(docs, "doc_id", "text", 2)
        .as[(Long, Int, Long, Int, Int)].collect().toSet
      val windowsJ = SuffixRank.crossDocRepeats(docs, "doc_id", "text", 4)
        .as[(Long, Int, Long, Int)].collect().toSet
      assert(ranksJ == ranksW, "join-path suffix ranks diverged")
      assert(repeatsJ == repeatsW, "join-path maximal repeats diverged")
      assert(windowsJ == windowsW, "join-path window classes diverged")
    } finally SuffixRank.LongDocThreshold = saved
  }

  test("NUL-embedding tokens never collide with window boundaries in the seed") {
    // Doc 1's first token embeds a NUL ("a<NUL>b"); doc 2 splits the
    // same bytes at a different token boundary ("a", "b<NUL>c").
    // Unescaped, both docs' 2-token seed keys concatenate to IDENTICAL
    // bytes (the separator is NUL too) — a false shared window. The
    // escape must keep them distinct while still matching doc 3's
    // GENUINE shared window ("a<NUL>b", "c").
    val docs = Seq(
      (1L, "a\u0000b c p q"),
      (2L, "a b\u0000c r s"),
      (3L, "a\u0000b c x y"),
    ).toDF("doc_id", "text")
    val out = SuffixRank.crossDocRepeats(docs, "doc_id", "text", windowTokens = 2)
      .select("doc_id", "pos", "n_docs")
      .as[(Long, Int, Int)].collect().sortBy(r => (r._1, r._2))
    // only docs 1 and 3 share a window, at pos 0; doc 2 matches nothing
    assert(out.toSeq == Seq((1L, 0, 2), (3L, 0, 2)), s"got ${out.toSeq}")
  }

  test("gate boundary: non-power-of-two minTokens matches brute force") {
    // minTokens=3 gates on level g=1 (2^1 <= 3 < 2^2): repeats of
    // exactly 3 tokens must survive the gate, 2-token repeats must not
    // reach output
    val toks = Map(
      1L -> "one two three alpha beta gamma end".split(" ").toSeq,
      2L -> "x alpha beta gamma y one two z".split(" ").toSeq,
    )
    val docs = toks.toSeq.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = SuffixRank.maximalCrossDocRepeats(docs, "doc_id", "text", minTokens = 3)
      .as[(Long, Int, Long, Int, Int)].collect().toSet
    assert(got == bruteForce(toks, 3), s"got ${got.toSeq.sorted}")
    // the planted 3-token repeat is there; the 2-token one is not
    assert(got.exists(_._5 == 3))
    assert(got.forall(_._5 >= 3))
  }

  test("gate boundary: minTokens at and beyond the top window on identical docs") {
    // two identical 6-token docs: doubling fixpoints early, so
    // minTokens=6 lands g == topK — equal TOP ranks must still gate
    // correctly (identical suffixes pass, everything else diverges
    // inside the certified window)
    val ts = "s1 s2 s3 s4 s5 s6"
    val docs = Seq((1L, ts), (2L, ts)).toDF("doc_id", "text")
    val atLen = SuffixRank.maximalCrossDocRepeats(docs, "doc_id", "text", minTokens = 6)
      .as[(Long, Int, Long, Int, Int)].collect().toSet
    assert(atLen == Set((1L, 0, 2L, 0, 6), (2L, 0, 1L, 0, 6)).filter(atLen.contains) &&
      atLen.nonEmpty && atLen.forall(_._5 == 6),
      s"whole-doc duplicate must survive a minTokens at doc length: ${atLen.toSeq}")
    // beyond any possible repeat: empty, not an error
    val beyond = SuffixRank.maximalCrossDocRepeats(docs, "doc_id", "text", minTokens = 7)
      .as[(Long, Int, Long, Int, Int)].collect()
    assert(beyond.isEmpty, s"got ${beyond.toSeq}")
  }
}
