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
