package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {

  import spark.implicits._

  // ---------------------------------------------------------------
  // Corpus.dedupLines
  // ---------------------------------------------------------------

  private val boiler = "this cookie banner repeats everywhere"

  test("dedupLines removes a cross-doc line from EVERY doc, keeps unique lines") {
    val docs = Seq(
      (1L, s"unique first line\n$boiler\nclosing thoughts one"),
      (2L, s"$boiler\nanother distinct body"),
      (3L, "totally unrelated document text"),
    ).toDF("doc_id", "text")
    val out = Corpus.dedupLines(docs, minDocs = 2, minLineChars = 10)
      .orderBy("doc_id")
      .as[(Long, String, Int)].collect()
    assert(out(0) == ((1L, "unique first line\nclosing thoughts one", 1)))
    assert(out(1) == ((2L, "another distinct body", 1)))
    assert(out(2) == ((3L, "totally unrelated document text", 0)))
  }

  test("dedupLines: doc made entirely of boilerplate rewrites to empty, not dropped") {
    val docs = Seq(
      (1L, s"$boiler\nkeep me around"),
      (2L, boiler),
      (3L, boiler),
    ).toDF("doc_id", "text")
    val out = Corpus.dedupLines(docs, minDocs = 2, minLineChars = 10)
      .orderBy("doc_id")
      .as[(Long, String, Int)].collect()
    assert(out.length == 3, "every input doc survives")
    assert(out(1) == ((2L, "", 1)))
    assert(out(2) == ((3L, "", 1)))
  }

  test("dedupLines: lines under minLineChars are never candidates") {
    val docs = Seq(
      (1L, "short\nlong enough body line one"),
      (2L, "short\nlong enough body line two"),
    ).toDF("doc_id", "text")
    val out = Corpus.dedupLines(docs, minDocs = 2, minLineChars = 10)
      .orderBy("doc_id")
      .as[(Long, String, Int)].collect()
    // "short" repeats across docs but is < 10 chars → kept everywhere
    assert(out(0) == ((1L, "short\nlong enough body line one", 0)))
    assert(out(1) == ((2L, "short\nlong enough body line two", 0)))
  }

  test("dedupLines: within-doc repetition does not make a line boilerplate") {
    val docs = Seq(
      (1L, s"$boiler\n$boiler"), // twice in ONE doc: df = 1
      (2L, "something else entirely here"),
    ).toDF("doc_id", "text")
    val out = Corpus.dedupLines(docs, minDocs = 2, minLineChars = 10)
      .orderBy("doc_id")
      .as[(Long, String, Int)].collect()
    assert(out(0) == ((1L, s"$boiler\n$boiler", 0)),
      "distinct-doc count, not occurrence count, gates removal")
  }

  test("dedupLines: minDocs threshold and custom separator") {
    val docs = Seq(
      (1L, s"$boiler|only in two docs not three"),
      (2L, s"$boiler|second doc distinct tail"),
      (3L, s"$boiler|third doc distinct tail"),
    ).toDF("doc_id", "text")
    val out = Corpus.dedupLines(docs, sep = "|", minDocs = 3, minLineChars = 10)
      .orderBy("doc_id")
      .as[(Long, String, Int)].collect()
    // boiler is in 3 docs (>= 3) → dropped; the pairwise-shared nothing
    assert(out(0) == ((1L, "only in two docs not three", 1)))
    assert(out(1) == ((2L, "second doc distinct tail", 1)))
    assert(out(2) == ((3L, "third doc distinct tail", 1)))
  }

  test("dedupLines: two distinct boilerplate lines in one doc both drop (set of positions)") {
    val b2 = "a second boilerplate line appears often"
    val docs = Seq(
      (1L, s"$boiler\nmiddle content stays put\n$b2"),
      (2L, boiler),
      (3L, b2),
      (4L, boiler),
      (5L, b2),
    ).toDF("doc_id", "text")
    val out = Corpus.dedupLines(docs, minDocs = 2, minLineChars = 10)
      .orderBy("doc_id")
      .as[(Long, String, Int)].collect()
    assert(out(0) == ((1L, "middle content stays put", 2)))
  }

  // ---------------------------------------------------------------
  // CorpusStats.repetitionProfile
  // ---------------------------------------------------------------

  test("repetitionProfile: hand-computed token and bigram stats") {
    val docs = Seq((1L, "a a b a")).toDF("doc_id", "text")
    val r = CorpusStats.repetitionProfile(docs).collect().head
    assert(r.getAs[Long]("n_tokens") == 4)
    assert(r.getAs[Long]("n_distinct") == 2)
    assert(r.getAs[Long]("top_token_cnt") == 3)
    // bigrams: (a a), (a b), (b a) — all distinct
    assert(r.getAs[Long]("n_bigrams") == 3)
    assert(r.getAs[Long]("n_distinct_bigrams") == 3)
    assert(r.getAs[Long]("top_bigram_cnt") == 1)
    assert(r.getAs[Double]("dup_token_frac") == 0.5)
    assert(r.getAs[Double]("top_token_frac") == 0.75)
    assert(r.getAs[Double]("dup_bigram_frac") == 0.0)
    assert(r.getAs[Double]("top_bigram_frac") == 1.0 / 3)
  }

  test("repetitionProfile: degenerate looping doc scores high on every signal") {
    val docs = Seq(
      (1L, "x x x x x"),
      (2L, "v w x y z"),
    ).toDF("doc_id", "text")
    val rows = CorpusStats.repetitionProfile(docs)
      .orderBy("doc_id").collect()
    val loop = rows(0)
    assert(loop.getAs[Double]("dup_token_frac") == 0.8)
    assert(loop.getAs[Double]("top_token_frac") == 1.0)
    assert(loop.getAs[Long]("top_bigram_cnt") == 4) // (x x) four times
    assert(loop.getAs[Double]("dup_bigram_frac") == 0.75)
    val clean = rows(1)
    assert(clean.getAs[Double]("dup_token_frac") == 0.0)
    assert(clean.getAs[Double]("top_token_frac") == 0.2)
    assert(clean.getAs[Double]("dup_bigram_frac") == 0.0)
  }

  test("repetitionProfile: single-token doc has zero bigrams, zero bigram fracs") {
    val docs = Seq((1L, "solo")).toDF("doc_id", "text")
    val r = CorpusStats.repetitionProfile(docs).collect().head
    assert(r.getAs[Long]("n_tokens") == 1)
    assert(r.getAs[Long]("n_bigrams") == 0)
    assert(r.getAs[Long]("top_bigram_cnt") == 0)
    assert(r.getAs[Double]("dup_bigram_frac") == 0.0)
    assert(r.getAs[Double]("top_bigram_frac") == 0.0)
  }

  // ---------------------------------------------------------------
  // CorpusStats.salientTerms
  // ---------------------------------------------------------------

  test("salientTerms ranks corpus-rare high-tf terms first") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana banana banana"),
    ).toDF("doc_id", "text")
    val out = CorpusStats.salientTerms(docs, k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "term", "tf", "df", "rank")
      .as[(Long, String, Long, Long, Int)].collect()
    // df: apple 1, banana 3, cherry 1
    // doc 1: apple 2/1 = 2.0 beats banana 1/3
    assert(out(0) == ((1L, "apple", 2L, 1L, 1)))
    assert(out(1) == ((1L, "banana", 1L, 3L, 2)))
    // doc 2: cherry 1/1 beats banana 1/3
    assert(out(2) == ((2L, "cherry", 1L, 1L, 1)))
    assert(out(3) == ((2L, "banana", 1L, 3L, 2)))
    // doc 3: only banana, 3/3 = 1.0
    assert(out(4) == ((3L, "banana", 3L, 3L, 1)))
    assert(out.length == 5)
  }

  test("salientTerms breaks score ties on term asc") {
    val docs = Seq((1L, "zed axe")).toDF("doc_id", "text")
    val out = CorpusStats.salientTerms(docs, k = 2)
      .orderBy("rank").select("term").as[String].collect()
    assert(out.toSeq == Seq("axe", "zed")) // both score 1/1
  }

  // ---------------------------------------------------------------
  // CorpusStats.bpePairCounts
  // ---------------------------------------------------------------

  test("bpePairCounts counts adjacent char pairs within tokens only") {
    val docs = Seq((1L, "abc ab"), (2L, "bc")).toDF("doc_id", "text")
    val out = CorpusStats.bpePairCounts(docs, k = 10)
      .as[(String, Long)].collect()
    // abc → ab, bc; ab → ab; bc → bc  ⇒ ab:2, bc:2 (no "c a" across the space)
    assert(out.toSeq == Seq(("ab", 2L), ("bc", 2L)), "ties order by pair asc")
  }

  test("bpePairCounts: 1-char tokens and empty docs contribute nothing") {
    val docs = Seq((1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    assert(CorpusStats.bpePairCounts(docs, k = 5).count() == 0)
  }

  test("bpePairCounts top-k is (count desc, pair asc) and respects k") {
    val docs = Seq((1L, "aaaa bb cc")).toDF("doc_id", "text")
    // aaaa → aa×3; bb → bb; cc → cc
    val out = CorpusStats.bpePairCounts(docs, k = 2)
      .as[(String, Long)].collect()
    assert(out.toSeq == Seq(("aa", 3L), ("bb", 1L)))
  }

  // ---------------------------------------------------------------
  // CorpusStats.surprisalProfile
  // ---------------------------------------------------------------

  test("surprisalProfile: bit-length frequency stats, hand-computed") {
    val docs = Seq(
      (1L, "common common common common rare"), // common cnt=4+2=6? see doc 2
      (2L, "common common unique"),
    ).toDF("doc_id", "text")
    // corpus counts: common=6 (bits 3: bin(6)=110), rare=1 (bits 1),
    // unique=1 (bits 1)
    val out = CorpusStats.surprisalProfile(docs, rareMax = 2L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Long, Double)].collect()
    // doc 1: 4 commons (4*3 bits) + rare (1 bit) = 13; n_rare=1
    assert(out(0) == ((1L, 5L, 13L, 13.0 / 5, 1L, 0.2)))
    // doc 2: 2 commons (6) + unique (1) = 7; n_rare=1
    assert(out(1) == ((2L, 3L, 7L, 7.0 / 3, 1L, 1.0 / 3)))
  }

  test("surprisalProfile: a rare-heavy doc scores lower mean_freq_bits than a common-heavy one") {
    val docs = Seq(
      (1L, "w w w w w w w w"),          // all cnt=8 → bits 4
      (2L, "a b c d e f g h"),          // all cnt=1 → bits 1
    ).toDF("doc_id", "text")
    val out = CorpusStats.surprisalProfile(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Long, Double)].collect()
    assert(out(0)._4 == 4.0 && out(0)._6 == 0.0)
    assert(out(1)._4 == 1.0 && out(1)._6 == 1.0)
  }

  // ---------------------------------------------------------------
  test("collocations rank glued pairs above loose ones; the floor kills rare pairs") {
    val s = spark
    import s.implicits._
    // "new york" only ever together; "the" pairs with many neighbors
    // (a loose, high-frequency word); "rare gem" appears once —
    // floored out despite its perfect lift
    val docs = (Seq.fill(5)("new york") ++ Seq(
      "the cat sat on the mat",
      "the dog sat on the rug",
      "the cat ran to the dog",
      "rare gem")).toDF("text")
    val out = CorpusStats.collocations(docs, "text", minCount = 2L, k = 10)
      .select("term_a", "term_b").as[(String, String)].collect().toSeq
    assert(out.contains(("new", "york")))
    assert(!out.contains(("rare", "gem")), "1-occurrence pair must be floored")
    // the glued pair outranks the loose high-frequency pair:
    // lift(new,york) = 9.0 vs lift(the,cat) = 7.5 on this corpus
    assert(out.indexOf(("new", "york")) < out.indexOf(("the", "cat")))
  }

  test("frequencySpectrum tallies types by occurrence count exactly") {
    val s = spark
    import s.implicits._
    // a×4, b×2, c×2, d,e,f ×1 → spectrum: 1→3 types, 2→2, 4→1
    val docs = Seq("a a b c d", "a a b c e f").toDF("text")
    val out = CorpusStats.frequencySpectrum(docs, "text")
      .orderBy("occurrences").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 3L), (2L, 2L), (4L, 1L)))
  }

  test("docSignals survives one-token and fully-duplicated docs (zero-bigram path)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "word"), (2L, "spam spam spam spam")).toDF("doc_id", "text")
    val out = CorpusStats.docSignals(docs).orderBy("doc_id").collect()
    val one = out(0)
    assert(one.getAs[Long]("n_tokens") === 1L)
    assert(one.getAs[Long]("n_bigrams") === 0L) // left join + coalesce, no null
    assert(one.getAs[Double]("dup_bigram_frac") === 0.0)
    val spam = out(1)
    assert(spam.getAs[Long]("n_distinct") === 1L)
    assert(spam.getAs[Double]("dup_token_frac") === 0.75)
    assert(spam.getAs[Double]("top_bigram_frac") === 1.0)
  }

  test("docSignals equals the standalone operators signal-for-signal (fusion agreement)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fused = CorpusStats.docSignals(docs).orderBy("doc_id").collect()
    val rep = CorpusStats.repetitionProfile(docs).orderBy("doc_id").collect()
    val sur = CorpusStats.surprisalProfile(docs).orderBy("doc_id").collect()
    val boi = CorpusStats.boilerplateDensity(docs).orderBy("doc_id").collect()
    assert(fused.length === rep.length && fused.length === sur.length)
    fused.indices.foreach { i =>
      val f = fused(i)
      // repetition family (incl. the exact double fractions)
      Seq("n_tokens", "n_distinct", "top_token_cnt", "n_bigrams",
        "n_distinct_bigrams", "top_bigram_cnt", "dup_token_frac",
        "top_token_frac", "dup_bigram_frac", "top_bigram_frac").foreach { c =>
        assert(f.getAs[Any](c) === rep(i).getAs[Any](c), s"row $i col $c")
      }
      // surprisal family: the count-weighted re-expression must be exact
      Seq("sum_freq_bits", "mean_freq_bits", "n_rare", "rare_frac").foreach { c =>
        assert(f.getAs[Any](c) === sur(i).getAs[Any](c), s"row $i col $c")
      }
      Seq("n_windows", "n_shared", "shared_frac").foreach { c =>
        assert(f.getAs[Any](c) === boi(i).getAs[Any](c), s"row $i col $c")
      }
    }
  }

  // CorpusStats.sourceOverlapMatrix / sourceOverlapFromPairs
  // ---------------------------------------------------------------

  test("sourceOverlapMatrix counts exact-dup pairs per unordered source pair") {
    val docs = Seq(
      (1L, "shared content one", "web"),
      (2L, "shared content one", "web"),   // within-web pair
      (3L, "shared content one", "books"), // web×books: 2×1 pairs
      (4L, "shared content two", "books"),
      (5L, "shared content two", "wiki"),  // books×wiki pair
      (6L, "unique text here", "web"),     // no pair
    ).toDF("doc_id", "text", "source")
    val out = CorpusStats.sourceOverlapMatrix(docs)
      .orderBy("src_a", "src_b")
      .as[(String, String, Long)].collect()
    assert(out.toSeq == Seq(
      ("books", "web", 2L),  // doc3 × {doc1, doc2}
      ("books", "wiki", 1L), // doc4 × doc5
      ("web", "web", 1L),    // C(2,2) within web
    ))
  }

  test("sourceOverlapMatrix never materializes pairs: a k-copy cluster is counted arithmetically") {
    // 100 identical docs in one source → C(100,2) pairs from ONE
    // (fp, src) row — the count, not 4950 rows
    val docs = (1 to 100).map(i => (i.toLong, "the same doc", "web"))
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.sourceOverlapMatrix(docs)
      .as[(String, String, Long)].collect()
    assert(out.toSeq == Seq(("web", "web", 4950L)))
  }

  test("sourceOverlapFromPairs attributes mined pairs to unordered source pairs") {
    val docs = Seq(
      (1L, "a", "web"), (2L, "b", "books"), (3L, "c", "web"), (4L, "d", "wiki"),
    ).toDF("doc_id", "text", "source")
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("id_a", "id_b")
    val out = CorpusStats.sourceOverlapFromPairs(pairs, docs)
      .orderBy("src_a", "src_b")
      .as[(String, String, Long)].collect()
    // (web,books) twice — once as a→b, once as b→a order: both normalize
    assert(out.toSeq == Seq(
      ("books", "web", 2L),
      ("web", "web", 1L),
      ("web", "wiki", 1L),
    ))
  }

  // ---------------------------------------------------------------
  // CorpusStats.boilerplateDensity
  // ---------------------------------------------------------------

  test("boilerplateDensity: planted shared run scores, clean docs score 0") {
    val boiler = "one two three four five six seven eight" // exactly 8 tokens
    val docs = Seq(
      (1L, s"$boiler alpha beta"),   // 3 windows, 1 shared
      (2L, s"pre1 pre2 $boiler"),    // 3 windows, 1 shared
      (3L, "a b c d e f g h i j"),   // 3 windows, 0 shared
      (4L, "too short"),             // < 8 tokens: 0 windows
    ).toDF("doc_id", "text")
    val out = CorpusStats.boilerplateDensity(docs, w = 8, minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, Int, Long, Double)].collect()
    assert(out(0) == ((1L, 3, 1L, 1.0 / 3)))
    assert(out(1) == ((2L, 3, 1L, 1.0 / 3)))
    assert(out(2) == ((3L, 3, 0L, 0.0)))
    assert(out(3) == ((4L, 0, 0L, 0.0)))
  }

  test("boilerplateDensity: within-doc repetition is not cross-doc sharing") {
    val run = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq(
      (1L, s"$run $run"), // the run repeats in ONE doc only
      (2L, "completely different words here making nine ten"),
    ).toDF("doc_id", "text")
    val out = CorpusStats.boilerplateDensity(docs, w = 8, minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, Int, Long, Double)].collect()
    assert(out(0)._3 == 0L, "distinct-doc frequency gates sharing, not occurrences")
  }

  // ---------------------------------------------------------------
  // CorpusStats.sourceSalientTerms
  // ---------------------------------------------------------------

  test("sourceSalientTerms ranks feed-characteristic terms by tf/sf") {
    val docs = Seq(
      (1L, "scala spark scala", "code"),
      (2L, "the spark the", "web"),
      (3L, "the the the", "web"),
    ).toDF("doc_id", "text", "source")
    val out = CorpusStats.sourceSalientTerms(docs, k = 2)
      .orderBy("source", "rank")
      .select("source", "term", "tf", "sf", "rank")
      .as[(String, String, Long, Long, Int)].collect()
    // sf: scala→1 source, spark→2, the→1 (web only)
    // code: scala 2/1=2.0 then spark 1/2=0.5
    assert(out(0) == (("code", "scala", 2L, 1L, 1)))
    assert(out(1) == (("code", "spark", 1L, 2L, 2)))
    // web: the 5/1=5.0 then spark 1/2=0.5
    assert(out(2) == (("web", "the", 5L, 1L, 1)))
    assert(out(3) == (("web", "spark", 1L, 2L, 2)))
  }
}
