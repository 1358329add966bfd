package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (X215): the Schleimer 2003 guarantee (a
  * shared run of ≥ w+k−1 tokens always collides), the ~2/(w+1)
  * density claim (the selection is genuinely sparser than full
  * shingles), short-doc edges, and the bucket cap. */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog near the old river bank " +
      "while rain falls softly on green hills and wind moves through tall trees"

  test("guarantee: a planted shared run of w+k-1 tokens collides") {
    // k=3, w=4 → any shared run of 6 tokens must share a fingerprint
    val run = "alpha beta gamma delta epsilon zeta"
    val docA = s"unrelated prefix words here $run and then some tail"
    val docB = s"totally different opening $run closing words differ fully"
    val df = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val pairs = Dedup.winnowedPairs(df, "doc_id", "text",
      k = 3, w = 4, minShared = 1)
    assert(pairs.count() == 1, "the guarantee run must produce a pair")
  }

  test("density: winnowed set is much sparser than the full gram set") {
    val df = Seq((1L, base + " " + base.reverse)).toDF("doc_id", "text")
    val sizes = df.select(
      size(TextOps.winnowHashes(col("text"), 3, 8)).as("wn"),
      size(TextOps.windowHashesPositional(col("text"), 3)).as("full"))
      .head()
    val (wn, full) = (sizes.getInt(0), sizes.getInt(1))
    // expected density ~2/(w+1) = 2/9; allow slack ×2 for distinctness
    assert(wn.toDouble / full < 0.5, s"winnowed $wn of $full is not sparse")
    assert(wn > 0)
  }

  test("short docs: under k tokens → empty; under w windows → global min") {
    val df = Seq(
      (1L, "a b"),           // 2 tokens < k=3 → no grams
      (2L, "a b c d"),       // 2 grams < w=4 → one fingerprint
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      size(TextOps.winnowHashes(col("text"), 3, 4)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1), got)
  }

  test("bucket cap drops a boilerplate fingerprint flood wholesale") {
    // 30 identical docs → every fingerprint's bucket is 30 wide;
    // cap at 10 must drop them all wholesale
    val docs = (1L to 30L).map(i => (i, base))
      .toDF("doc_id", "text")
    val uncapped = Dedup.winnowedPairs(docs, "doc_id", "text",
      k = 3, w = 4, minShared = 1, maxBucketWidth = 100)
    val capped = Dedup.winnowedPairs(docs, "doc_id", "text",
      k = 3, w = 4, minShared = 1, maxBucketWidth = 10)
    assert(uncapped.count() > 0)
    assert(capped.count() == 0,
      "capped flood must not generate quadratic candidates")
  }

  test("exact duplicates share every fingerprint; minShared filters weak pairs") {
    val df = Seq((1L, base), (2L, base), (3L, "wholly other text " * 5))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowedPairs(df, "doc_id", "text",
      k = 3, w = 4, minShared = 2).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    val nf = df.filter($"doc_id" === 1L)
      .select(size(TextOps.winnowHashes(col("text"), 3, 4))).head.getInt(0)
    assert(r.getLong(2) == nf.toLong, "exact dups share the full set")
  }
}
