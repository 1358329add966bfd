package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-side Viterbi with the same contract: min
    * (cost, pieces, longest-last-piece-first). Written against the
    * SPEC, not the implementation — a second opinion for the DP. */
  private def refSegment(
      w: String, vocab: Map[String, Long], maxLen: Int): Seq[String] = {
    val unk = 66L
    val n = w.length
    val inf = Long.MaxValue / 4
    // best(i) = (cost, np, back)
    val best = Array.fill[(Long, Int, Int)](n + 1)((inf, 0, 0))
    best(0) = (0L, 0, 0)
    for (i <- 1 to n) {
      for (j <- math.max(0, i - maxLen) until i) {
        val piece = w.substring(j, i)
        val pcOpt = vocab.get(piece)
          .orElse(if (i - j == 1) Some(unk) else None)
        pcOpt.foreach { pc =>
          if (best(j)._1 < inf) {
            val cand = (best(j)._1 + pc, best(j)._2 + 1, j)
            val cur = best(i)
            val candKey = (cand._1, cand._2, cand._3)
            val curKey = (cur._1, cur._2, cur._3)
            if (Ordering[(Long, Int, Int)].lt(candKey, curKey)) best(i) = cand
          }
        }
      }
    }
    if (best(n)._1 >= inf) Seq.empty
    else {
      var pos = n
      val out = List.newBuilder[String]
      val acc = scala.collection.mutable.ListBuffer.empty[String]
      while (pos > 0) {
        val b = best(pos)._3
        acc.prepend(w.substring(b, pos))
        pos = b
      }
      acc.toSeq
    }
  }

  private def sparkSegment(
      words: Seq[String], vocab: Seq[(String, Long, Long)],
      maxLen: Int): Map[String, Seq[String]] = {
    val model = vocab.map { case (p, c, cost) => (p, c, cost) }
      .toDF("piece", "cnt", "cost")
    val df = words.toDF("text")
    UnigramLm.segment(df, model, "text", maxLen)
      .select(col("text"), col("pieces"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
  }

  test("viterbi picks the min-cost segmentation, not greedy longest-match") {
    // vocab: ab=5, abc=9, c=1 → "abc" best as [abc]=9 vs [ab,c]=6 → picks ab,c
    val vocab = Seq(("ab", 10L, 5L), ("abc", 2L, 9L), ("c", 50L, 1L),
      ("a", 30L, 3L), ("b", 30L, 3L))
    val got = sparkSegment(Seq("abc"), vocab, maxLen = 3)
    assert(got("abc") == Seq("ab", "c"), got.toString)
  }

  test("tie on cost prefers fewer pieces, then the longer last piece") {
    // "aa": [aa]=4 vs [a,a]=2+2=4 — tie on cost, [aa] has fewer pieces
    val vocab = Seq(("a", 10L, 2L), ("aa", 5L, 4L))
    assert(sparkSegment(Seq("aa"), vocab, maxLen = 2)("aa") == Seq("aa"))
  }

  test("unknown characters segment as themselves, total function") {
    val vocab = Seq(("a", 10L, 1L))
    val got = sparkSegment(Seq("axa"), vocab, maxLen = 3)
    assert(got("axa") == Seq("a", "x", "a"), got.toString)
  }

  test("DP agrees with the independent reference on random words/vocabs") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd"
    for (trial <- 1 to 25) {
      val pieces = (1 to 8).map { _ =>
        val len = 1 + rnd.nextInt(3)
        (1 to len).map(_ => alphabet(rnd.nextInt(4))).mkString
      }.distinct
      val chars = alphabet.map(_.toString)
      val vocab = (pieces ++ chars).distinct.map { p =>
        (p, 1L + rnd.nextInt(50).toLong, 1L + rnd.nextInt(9).toLong)
      }
      val vmap = vocab.map { case (p, _, c) => p -> c }.toMap
      val words = (1 to 6).map { _ =>
        (1 to (3 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(4))).mkString
      }.distinct
      val got = sparkSegment(words, vocab, maxLen = 3)
      // third arm: the Catalyst nested-aggregate DP the EM fit uses
      // (serve now runs the compiled UnigramSegment — the two must
      // stay bit-identical, and both must match the reference)
      val vm = UnigramLm.vocabMapLit(vocab.map { case (p, _, c) => (p, c) })
      val catalyst = words.toDF("w")
        .select(col("w"), UnigramLm.segmentExpr(col("w"), vm, 3).as("ps"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      words.foreach { w =>
        val want = refSegment(w, vmap, maxLen = 3)
        assert(got(w) == want,
          s"trial $trial word $w: spark=${got(w)} ref=$want vocab=$vmap")
        assert(catalyst(w) == want,
          s"trial $trial word $w: catalyst=${catalyst(w)} ref=$want")
        // any valid segmentation reassembles the word
        assert(got(w).mkString == w)
      }
    }
  }

  test("total_cost is the summed piece cost of the chosen segmentation") {
    val vocab = Seq(("a", 10L, 1L), ("aa", 5L, 4L), ("b", 3L, 2L))
    val model = vocab.toDF("piece", "cnt", "cost")
    val df = Seq("aa b", "axa", "").toDF("text")
    val got = UnigramLm.segment(df, model, "text", maxLen = 2)
      .select(col("text"), col("total_cost"), col("n_pieces"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // "aa" → [a,a] cost 2 beats [aa] cost 4; "b" costs 2 → total 4
    assert(got("aa b") == ((4L, 3)), got.toString)
    // unknown char x costs 66: 1 + 66 + 1
    assert(got("axa") == ((68L, 3)), got.toString)
    assert(got("") == ((0L, 0)), got.toString)
  }

  test("junk text costs more bits per piece than prose under a fitted model") {
    val docs = Seq(
      "the cat sat on the mat", "the cat ran", "a cat and the mat",
      "the the the cat cat mat",
    ).toDF("text")
    val model = UnigramLm.fit(docs, "text", vocabSize = 20, maxLen = 4,
      minSeedCount = 2L, iters = 2)
    val probe = Seq("the cat sat on the mat", "zqxv jwqk pfzz").toDF("text")
    val got = UnigramLm.segment(probe, model, "text", maxLen = 4)
      .select(col("text"), col("total_cost"), col("n_pieces"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val perPiece = got.map { case (t, c, n) => t -> c.toDouble / n }.toMap
    assert(perPiece("zqxv jwqk pfzz") > perPiece("the cat sat on the mat"),
      perPiece.toString)
  }

  test("seedVocab counts weighted overlapping substrings, chars unconditional") {
    val df = Seq("aba aba", "xy").toDF("text")
    val got = UnigramLm.seedVocab(df, "text", maxLen = 3, minCount = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "aba" word freq 2: substrings per occurrence: a(2),b(1),ab,ba,aba
    assert(got("aba") == 2L && got("ab") == 2L && got("a") == 4L)
    // chars survive even below minCount
    assert(got("x") == 1L && got("y") == 1L)
    // rare multi-char pieces are cut
    assert(!got.contains("xy"))
  }

  test("fit: vocab prunes to size, keeps chars, serves deterministically") {
    val docs = Seq(
      "the cat sat on the mat", "the cat ran", "a cat and the mat",
      "the the the cat cat mat",
    ).toDF("text")
    val m1 = UnigramLm.fit(docs, "text", vocabSize = 10, maxLen = 4,
      minSeedCount = 2L, iters = 2).collect()
    val m2 = UnigramLm.fit(docs.repartition(5), "text", vocabSize = 10,
      maxLen = 4, minSeedCount = 2L, iters = 2).collect()
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    val pieces = m1.map(_.getString(0)).toSet
    // every char of the corpus words is present (totality)
    val chars = "thecatsonmrnad".map(_.toString).toSet
    assert(chars.subsetOf(pieces), (chars -- pieces).toString)
    val multi = pieces.filter(_.length > 1)
    assert(multi.size <= 10)
    // frequent words should surface as whole pieces
    assert(pieces.contains("the") || pieces.contains("cat"), pieces.toString)
  }
}
