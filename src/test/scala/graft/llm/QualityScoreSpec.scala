package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-weight quality scorer over the docSignals matrix
  * (CorpusStats.qualityScore / scoreFilter / Corpus.clean minScore
  * hook). The cross-engine IEEE chain is oracle-checked by q94; this
  * pins the arithmetic, the sigmoid relationship, and the filter
  * plumbing. */
class QualityScoreSpec extends SparkSpec {

  // a repetitive junk doc (one token over and over), a boilerplate-y
  // doc pair sharing a long window, and clean prose
  private val junk = ("spam " * 40).trim
  private val good1 = "the market opened higher as investors weighed fresh " +
    "economic data against persistent concerns about rate policy direction"
  private val good2 = "researchers described a new catalyst that converts " +
    "carbon dioxide into useful fuels with record efficiency in lab tests"

  private def docs = {
    val s = spark
    import s.implicits._
    Seq((1L, junk), (2L, good1), (3L, good2)).toDF("doc_id", "text")
  }

  test("qualityScore folds bias + weighted signals in declared order") {
    val s = spark
    import s.implicits._
    val sig = Seq((1L, 0.5, 0.25)).toDF("doc_id", "a", "b")
    val scored = CorpusStats.qualityScore(sig,
      weights = Seq("a" -> 2.0, "b" -> -4.0), bias = 1.0)
    val z = scored.select("score").head().getDouble(0)
    assert(z === (1.0 + 0.5 * 2.0 + 0.25 * -4.0)) // = 1.0
    // score column collision is rejected
    intercept[IllegalArgumentException] {
      CorpusStats.qualityScore(scored, Seq("a" -> 1.0), 0.0)
    }
  }

  test("default weights rank junk below prose and the filter drops it") {
    val scored = CorpusStats.qualityScore(
      CorpusStats.docSignals(docs, "doc_id", "text"))
    val byId = scored.select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId(1L) < byId(2L) && byId(1L) < byId(3L))
    assert(byId(1L) < CorpusStats.DefaultQualityThreshold)
    assert(byId(2L) >= CorpusStats.DefaultQualityThreshold)
    val kept = CorpusStats.scoreFilter(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L))
  }

  test("sigmoid is the logistic of the linear score and preserves order") {
    val s = spark
    import s.implicits._
    val z = Seq(-2.0, 0.0, 3.5).toDF("z")
      .select(col("z"), CorpusStats.sigmoid(col("z")).as("p"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    z.foreach { case (zv, p) =>
      assert(math.abs(p - 1.0 / (1.0 + math.exp(-zv))) < 1e-15)
    }
    assert(z.map(_._2).toSeq === z.map(_._2).sortBy(identity).toSeq)
  }

  test("Corpus.clean minScore hook filters survivors; None is the old pipeline") {
    val s = spark
    import s.implicits._
    // pad with enough prose docs that clean's quality windows pass
    val corpus = docs.unionByName(Seq(
      (4L, good1 + " extended with further detail on trading volumes today"),
      (5L, "a fully distinct report on municipal infrastructure spending " +
        "plans across several regions this fiscal year")).toDF("doc_id", "text"))
    val plain = Corpus.clean(corpus, "doc_id", "text")
    val hooked = Corpus.clean(corpus, "doc_id", "text",
      minScore = Some(CorpusStats.DefaultQualityThreshold))
    val plainIds = plain.select("doc_id").collect().map(_.getLong(0)).toSet
    val hookedIds = hooked.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hookedIds.subsetOf(plainIds))
    // the junk doc passes Gopher windows (uniform word length) but
    // cannot pass the repetition-aware score
    assert(!hookedIds.contains(1L))
    // None reproduces the unhooked output exactly
    val none = Corpus.clean(corpus, "doc_id", "text", minScore = None)
    assert(none.collect().toSeq === plain.collect().toSeq)
  }
}
