package graft.llm

import graft.SparkSpec

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog near the old river bank " +
      "while rain falls softly on green hills and wind moves through tall trees"

  test("clean composes exact dedup, near-dup drop, and quality filter") {
    val df = Seq(
      (1L, good),                          // keeper
      (2L, good),                          // exact dup of 1 → dropped
      (3L, good.replace("lazy", "sleepy")), // near-dup of 1 → dropped (id 3 > 1)
      (4L, "too short"),                   // quality: < 10 tokens → dropped
      (5L, "a completely different long document about query engines " +
        "with columnar execution shuffles partitions joins and codegen"), // keeper
    ).toDF("doc_id", "text")
    val kept = Corpus.clean(df).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 5L), kept.mkString(","))
  }

  // Transitive chain by token-shift where the chain MIDDLE carries the
  // HIGHEST id: doc 3 overlaps docs 1 and 2 heavily
  // (J≈(60-11)/(60+11)≈0.69 ≥ 0.5), docs 1 and 2 only weakly
  // (J≈(60-22)/(60+22)≈0.46 < 0.5). Greedy drop-every-id_b drops only
  // {3} — doc 2 survives because its one near-dup neighbor has a
  // HIGHER id (local min ≠ component min). Connected components sees
  // one cluster {1,2,3} and keeps only the min — the divergence the
  // CC variant exists for.
  test("cleanCC drops a whole transitive chain, clean keeps local minima") {
    def toks(from: Int, until: Int) = (from until until).map(i => s"word$i").mkString(" ")
    val df = Seq(
      (1L, toks(0, 62)),   // chain end A
      (2L, toks(22, 84)),  // chain end C
      (3L, toks(11, 73)),  // chain middle B, highest id
    ).toDF("doc_id", "text")
    // bands=16 (r=2) so J≈0.69 pairs are near-certain LSH candidates;
    // the 1-2 candidate (if generated) fails verification at 0.46
    val pairs = Dedup.nearDupPairs(df, "doc_id", "text", bands = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 3L), (2L, 3L)), s"fixture pairs: $pairs")
    val greedy = Corpus.clean(df, bands = 16).select("doc_id").as[Long].collect().sorted
    val cc = Corpus.cleanCC(df, bands = 16).select("doc_id").as[Long].collect().sorted
    assert(greedy.toSeq == Seq(1L, 2L), s"greedy kept ${greedy.toSeq}")
    assert(cc.toSeq == Seq(1L), s"cc kept ${cc.toSeq}")
  }

  test("clean on real docs matches the subtractive expectation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val total = docs.count()
    val drops = Dedup.nearDupDrops(Dedup.nearDupPairs(docs, "doc_id", "text")).count()
    val kept = Corpus.clean(docs).count()
    // all sf0.001 texts are distinct, so exact dedup drops nothing;
    // kept = total - nearDupDrops - qualityRejects
    assert(kept <= total - drops)
    assert(kept > total / 2, s"cleaning should not gut the corpus: $kept of $total")
  }

  // --- span removal -------------------------------------------------

  /** 11-token boilerplate planted in three otherwise-distinct docs —
    * the fixture the operator exists for: whole-doc dedup must KEEP
    * the boilerplate (the docs are not near-dups), span removal must
    * EXCISE it from every doc but the first. */
  private val boiler =
    "this content is licensed under the creative commons attribution share license"
  private val planted = Seq(
    (1L, s"alpha beta gamma delta epsilon zeta eta theta $boiler end one"),
    (2L, s"iota kappa lambda mu nu xi omicron pi rho $boiler fin two"),
    (3L, s"$boiler sigma tau upsilon phi chi psi omega digamma koppa sampi"),
  )

  test("whole-doc dedup keeps planted boilerplate; dedupSpans excises it keep-first") {
    val df = planted.toDF("doc_id", "text")
    // the docs are distinct and below the near-dup threshold: clean
    // keeps all three, boilerplate intact in every copy
    val cleaned = Corpus.clean(df).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned.keySet == Set(1L, 2L, 3L), s"clean dropped docs: ${cleaned.keySet}")
    assert(cleaned.values.forall(_.contains(boiler)),
      "whole-doc dedup must leave shared spans in place — that's the gap")

    val rewritten = Corpus.dedupSpans(df, minTokens = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // keep-first: doc 1 keeps its copy, docs 2 and 3 lose theirs
    assert(rewritten(1L) == planted(0)._2, "smallest doc id must keep the span")
    assert(rewritten(2L) == "iota kappa lambda mu nu xi omicron pi rho fin two")
    assert(rewritten(3L) == "sigma tau upsilon phi chi psi omega digamma koppa sampi")
    // nothing else was touched: removing the boilerplate tokens is the
    // ONLY delta on every rewritten doc
    assert(!rewritten(2L).contains("licensed") && !rewritten(3L).contains("licensed"))
  }

  test("removeSpans unions overlapping spans and keeps fully-excised docs as empty rows") {
    val df = Seq((1L, "a b c d e f"), (2L, "x y z")).toDF("doc_id", "text")
    // synthetic repeat table: doc 1 loses [1,4) and the overlapping
    // [3,6) — the union is [1,6); doc 2 loses everything
    val repeats = Seq(
      (1L, 1, 0L, 0, 3),
      (1L, 3, 0L, 0, 3),
      (2L, 0, 0L, 0, 3),
    ).toDF("doc_id", "pos", "match_doc", "match_pos", "lcp")
    val out = Corpus.removeSpans(df, repeats)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a", s"overlap union failed: '${out(1L)}'")
    assert(out(2L) == "", "fully-excised doc must survive as an empty row")
    assert(out.size == 2)
  }

  test("dedupSpans: one round is greedy per-pair; rounds=2 reaches exact keep-first") {
    // 8-token boilerplate whose CONTINUATIONS order the three
    // occurrences (2, 3, 1) in suffix order: BOTH adjacent pairs mark
    // doc 3, so a single round leaves docs 1 and 2 each holding a copy
    // — the documented greedy residue. A second round re-mines the
    // rewritten corpus and finishes the job; min doc id never loses.
    val b = "c1 c2 c3 c4 c5 c6 c7 c8"
    val df = Seq(
      (1L, s"$b zz"),
      (2L, s"$b aa"),
      (3L, s"$b mm"),
    ).toDF("doc_id", "text")
    val one = Corpus.dedupSpans(df, minTokens = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(one == Map(1L -> s"$b zz", 2L -> s"$b aa", 3L -> "mm"),
      s"single-round per-pair semantics: $one")
    val two = Corpus.dedupSpans(df, minTokens = 8, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(two == Map(1L -> s"$b zz", 2L -> "aa", 3L -> "mm"),
      s"fixpoint must keep ONLY the min-doc-id copy: $two")
    // extra rounds early-exit once the re-mine comes back empty
    val three = Corpus.dedupSpans(df, minTokens = 8, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(three == two)
  }

  test("removeSpans ignores non-positive lcp rows instead of deleting backwards") {
    // sequence(start, start + lcp - 1) counts DOWN for lcp <= 0 —
    // a zero-lcp row in a user-filtered repeat table must be a no-op,
    // not a deletion of the two tokens at start and start-1
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val repeats = Seq((1L, 2, 0L, 0, 0), (1L, 2, 0L, 0, -3))
      .toDF("doc_id", "pos", "match_doc", "match_pos", "lcp")
    val out = Corpus.removeSpans(df, repeats)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a b c d", s"non-positive lcp must not excise: $out")
  }

  test("dedupSpans leaves a repeat-free corpus byte-identical") {
    val df = Seq(
      (1L, "completely unrelated first document content"),
      (2L, "another text sharing nothing with anything"),
    ).toDF("doc_id", "text")
    val out = Corpus.dedupSpans(df, minTokens = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> df.collect()(0).getString(1), 2L -> df.collect()(1).getString(1)))
  }
  test("cleanFates: every doc gets exactly one fate, and `kept` IS the clean output") {
    val df = Seq(
      (1L, good),                           // kept
      (2L, good),                           // exact_dup of 1
      (3L, good.replace("lazy", "sleepy")), // near_dup of 1
      (4L, "too short"),                    // quality
      (5L, "a completely different long document about query engines " +
        "with columnar execution shuffles partitions joins and codegen"), // kept
    ).toDF("doc_id", "text")
    val fates = Corpus.cleanFates(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fates == Map(
      1L -> "kept", 2L -> "exact_dup", 3L -> "near_dup",
      4L -> "quality", 5L -> "kept"), fates.toString)
    // the report and the pipeline agree doc-for-doc
    val cleanIds = Corpus.clean(df).select("doc_id").as[Long].collect().toSet
    assert(fates.filter(_._2 == "kept").keySet == cleanIds)
    // and the fates partition the corpus
    assert(fates.size == 5)
  }

  test("cleanFates with the model gate mirrors clean(minScore) and names low_score") {
    val df = Seq(
      (1L, good),
      (2L, good),                                                 // exact_dup
      (3L, "a completely different long document about query engines " +
        "with columnar execution shuffles partitions joins and codegen"),
      (6L, (Seq.fill(30)("buy now").mkString(" "))),              // passes rules, fails score
    ).toDF("doc_id", "text")
    val fates = Corpus.cleanFates(df, minScore = Some(0.0)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fates(2L) == "exact_dup" && fates(6L) == "low_score", fates.toString)
    val cleanIds = Corpus.clean(df, minScore = Some(0.0))
      .select("doc_id").as[Long].collect().toSet
    assert(fates.filter(_._2 == "kept").keySet == cleanIds,
      s"$fates vs clean=$cleanIds")
  }
}
