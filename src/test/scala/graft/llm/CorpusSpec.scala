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
}
