package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** fitCorpusStats + docSignalsFrozen — the train/serve split. */
class FrozenSignalsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank again"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"),
    (4L, "spam spam spam spam spam spam spam spam spam spam spam spam spam spam"),
  ).toDF("doc_id", "text")

  test("fed its own corpus statistics, the frozen path reproduces docSignals exactly") {
    val (freq, shared) = CorpusStats.fitCorpusStats(docs, "doc_id", "text")
    val frozen = CorpusStats.docSignalsFrozen(docs, freq, shared, "doc_id", "text")
    val live = CorpusStats.docSignals(docs, "doc_id", "text")
    assert(frozen.columns.toSeq == live.columns.toSeq)
    val f = frozen.orderBy("doc_id").collect().map(_.toSeq)
    val l = live.orderBy("doc_id").collect().map(_.toSeq)
    assert(f.toSeq == l.toSeq, "self-frozen must equal the live signals bit-for-bit")
  }

  test("tokens the reference never saw read as rarest-possible; foreign windows are unshared") {
    // reference shares nothing with the scored docs
    val ref = Seq(
      (100L, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"),
      (101L, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"),
    ).toDF("doc_id", "text")
    val (freq, shared) = CorpusStats.fitCorpusStats(ref, "doc_id", "text")
    val sig = CorpusStats.docSignalsFrozen(docs, freq, shared, "doc_id", "text")
      .select("doc_id", "n_tokens", "sum_freq_bits", "rare_frac", "shared_frac")
      .as[(Long, Long, Long, Double, Double)].collect()
    sig.foreach { case (id, nTok, bits, rare, sharedFrac) =>
      // unseen → cnt 0 → length(bin(0)) = 1 bit per occurrence
      assert(bits == nTok, s"doc $id: $bits bits for $nTok tokens")
      assert(rare == 1.0, s"doc $id: every token should be rare, got $rare")
      assert(sharedFrac == 0.0, s"doc $id: no window can be shared, got $sharedFrac")
    }
  }

  test("frozen scoring ranks junk below prose under a foreign reference too") {
    val ref = docs.filter(col("doc_id") =!= 4L)
    val (freq, shared) = CorpusStats.fitCorpusStats(ref, "doc_id", "text")
    val scores = CorpusStats.qualityScore(
        CorpusStats.docSignalsFrozen(docs, freq, shared, "doc_id", "text"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(scores(4L) < scores(1L), s"spam must score below prose: $scores")
    assert(scores(4L) < scores(3L), s"spam must score below word-list: $scores")
  }
}
