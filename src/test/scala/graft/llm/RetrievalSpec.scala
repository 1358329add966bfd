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

  test("rrfFuse: agreement beats single-ranker wins on the planted lexical-/semantic-miss fixture") {
    // the canonical RRF situation: doc 100 is rank 2 in BOTH rankers;
    // doc 200 is the lexical ranker's top pick but a SEMANTIC MISS
    // (absent from the vector list); doc 300 is the vector ranker's
    // top pick but a LEXICAL MISS (absent from BM25). Each single
    // ranker puts its one-sided favorite first; fusion must put the
    // agreed doc first: 2·(10⁶ div 62) = 32256 > 10⁶ div 61 = 16393.
    val lex = Seq((1, 1, 200L), (1, 2, 100L), (1, 3, 250L))
      .toDF("qid", "rank", "doc_id")
    val sem = Seq((1, 1, 300L), (1, 2, 100L), (1, 3, 350L))
      .toDF("qid", "rank", "doc_id")
    val fused = Retrieval.rrfFuse(Seq(lex, sem), k = 5)
      .as[(Int, Int, Long, Long)].collect().sortBy(_._2).toSeq
    assert(fused.head._3 == 100L,
      s"the both-rankers doc must fuse to rank 1: $fused")
    assert(fused.head._4 == 2 * (1000000L / 62),
      s"fused score must be the exact integer chain: $fused")
    // one-sided docs follow, ordered by their single contribution,
    // ties on doc_id ascending
    assert(fused.map(_._3) == Seq(100L, 200L, 300L, 250L, 350L), fused)
    assert(fused(1)._4 == 1000000L / 61 && fused(2)._4 == 1000000L / 61)
  }

  test("vectorTopK: cosine order, no-overlap drop, tie-break on id") {
    val dv = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.8, 0.6, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0)),   // orthogonal to the query → dropped
      (4L, Seq(0.8, 0.6, 0.0)),   // exact tie with 2 → id order
    ).toDF("doc_id", "vec")
    val qv = Seq((9L, Seq(1.0, 0.0, 0.0))).toDF("qid", "vec")
    val got = Retrieval.vectorTopK(dv, qv, k = 4)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2).toSeq
    assert(got.map(_._3) == Seq(1L, 2L, 4L), got)
    assert(got.head._4 == 1.0)
  }

  test("vectorTopKAnn: probe-monotone recall vs the exhaustive ranker, scores bit-equal") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dims = 64
    val dv = Vectorize.tfidfVectors(docs, "doc_id", "text", dims)
      .withColumnRenamed("id", "doc_id")
    val qv = dv.filter($"doc_id" % 37 === 0)
      .withColumnsRenamed(Map("doc_id" -> "qid"))
    val full = Retrieval.vectorTopK(dv, qv, k = 5)
      .as[(Long, Int, Long, Double)].collect()
    val fullPairs = full.map(r => (r._1, r._3)).toSet
    val allScores = Retrieval.vectorTopK(dv, qv, k = 10000)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    def recallAt(probes: Int): Double = {
      val got = Retrieval.vectorTopKAnn(dv, qv, k = 5, dims = dims,
          numPlanes = 4, probes = probes)
        .as[(Long, Int, Long, Double)].collect()
      got.foreach { case (q, _, d, s) =>
        assert(allScores((q, d)) == s, s"pair ($q,$d) score drifted")
      }
      (got.map(r => (r._1, r._3)).toSet & fullPairs).size.toDouble /
        fullPairs.size
    }
    val r0 = recallAt(0); val r1 = recallAt(1); val r2 = recallAt(2)
    assert(r0 <= r1 && r1 <= r2, s"recall not monotone: $r0 $r1 $r2")
    assert(r2 > 0.5, s"2-flip probing over 4 planes recalls only $r2")
  }

  test("hybridTopK end-to-end: lexical misses retrieve through the vector side and agreement leads") {
    val docs = Seq(
      (1L, "solar panel efficiency degrades under partial shading conditions"),
      (2L, "wind turbine blade inspection uses drone imagery analysis"),
      (3L, "solar inverter firmware schedules panel cleaning cycles"),
      (4L, "medieval falconry hood training methods"),
    ).toDF("doc_id", "text")
    // dims = 32 on purpose: with ~25 occupied buckets, even the
    // out-of-vocabulary query collides into SOME occupied bucket —
    // the hashing-trick graceful-degradation behavior the test pins
    val queries = Seq(
      (1, "solar panel cleaning"),
      (2, "qqq zzz www")) // no exact term hits anywhere → BM25 empty
      .toDF("qid", "qtext")
    val fused = Retrieval.hybridTopK(docs, queries, k = 4, dims = 32,
      poolK = 4)
    val rows = fused.as[(Int, Int, Long, Long)].collect()
    val byQ = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // q1: docs 1 and 3 carry the query terms; 4 is unrelated
    assert(byQ(1).take(2).toSet == Set(1L, 3L), byQ.toString)
    // q2 is a total lexical miss — BM25 contributes nothing — yet the
    // hashed-vector side still ranks docs through bucket collisions:
    // the hybrid returns SOMETHING where pure BM25 returns nothing
    assert(Retrieval.bm25TopK(docs, queries.filter($"qid" === 2), 4)
      .isEmpty, "fixture broke: q2 must be a BM25 miss")
    assert(byQ.contains(2) && byQ(2).nonEmpty,
      s"vector side must cover the lexical miss: $byQ")
    // the fusion is exactly RRF of its two constituent lists
    val lex = Retrieval.bm25TopK(docs, queries, 4)
      .select($"qid", $"rank", $"doc_id")
    val tf = Vectorize.termFrequencies(docs, "doc_id", "text", 32)
    val dv = Vectorize.tfidfVectors(docs, "doc_id", "text", 32)
      .withColumnRenamed("id", "doc_id")
    val qv = Vectorize.embed(queries, "qid", "qtext",
        Vectorize.docFrequencies(tf), Vectorize.corpusSize(docs), 32)
      .withColumnRenamed("id", "qid")
    val sem = Retrieval.vectorTopK(dv, qv, 4)
      .select($"qid", $"rank", $"doc_id")
    val manual = Retrieval.rrfFuse(Seq(lex, sem), k = 4)
      .as[(Int, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(rows.sortBy(r => (r._1, r._2)).toSeq == manual)
  }

  test("hybridTopKAnn is exactly RRF of bm25 and the ANN vector ranker; full probing ≡ hybridTopK") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" % 3 === 0).select($"doc_id", $"text")
    val queries = Seq((1, "hash join strategy"), (2, "slow scan filter"))
      .toDF("qid", "qtext")
    val dims = 64; val planes = 4
    val got = Retrieval.hybridTopKAnn(docs, queries, k = 5, dims = dims,
        poolK = 5, numPlanes = planes, probes = 1)
      .as[(Int, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // decomposition: the fusion must be exactly RRF(bm25, vectorTopKAnn)
    val lex = Retrieval.bm25TopK(docs, queries, 5)
      .select($"qid", $"rank", $"doc_id")
    val tf = Vectorize.termFrequencies(docs, "doc_id", "text", dims)
    val dv = Vectorize.tfidfVectors(docs, "doc_id", "text", dims)
      .withColumnRenamed("id", "doc_id")
    val qv = Vectorize.embed(queries, "qid", "qtext",
        Vectorize.docFrequencies(tf), Vectorize.corpusSize(docs), dims)
      .withColumnRenamed("id", "qid")
    val sem = Retrieval.vectorTopKAnn(dv, qv, 5, dims, planes, probes = 1)
      .select($"qid", $"rank", $"doc_id")
    val manual = Retrieval.rrfFuse(Seq(lex, sem), k = 5)
      .as[(Int, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == manual, s"ANN hybrid must decompose exactly:\n$got\n$manual")
    // exhaustive probing (all 2^planes masks) recovers the exhaustive
    // hybrid bit-for-bit — the recall ceiling the probes knob walks to
    val full = Retrieval.hybridTopK(docs, queries, k = 5, dims = dims, poolK = 5)
      .as[(Int, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val annFull = Retrieval.hybridTopKAnn(docs, queries, k = 5, dims = dims,
        poolK = 5, numPlanes = planes, probes = planes)
      .as[(Int, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(annFull == full, "all-bit probing must equal the exhaustive hybrid")
  }
}
