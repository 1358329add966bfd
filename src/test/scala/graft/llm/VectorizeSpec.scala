package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorizeSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("dense vectors are unit-length, total, and identical for identical token multisets") {
    val df = docs(
      1L -> "quantum flux capacitor resonance",
      2L -> "capacitor quantum resonance flux", // same multiset, reordered
      3L -> "medieval falconry treatise",
      4L -> "")                                 // token-free doc
    val v = Vectorize.tfidfVectors(df, "doc_id", "text", dims = 64)
      .as[(Long, Seq[Double])].collect().toMap
    assert(v.keySet === Set(1L, 2L, 3L, 4L))
    // bag-of-words: order cannot matter
    assert(v(1L) === v(2L))
    assert(v(1L) !== v(3L))
    // zero vector for the empty doc — total output, no vanishing rows
    assert(v(4L).forall(_ == 0.0) && v(4L).length == 64)
    // L2 normalization: unit norm for any doc with a surviving bucket
    def nrm(x: Seq[Double]) = math.sqrt(x.map(c => c * c).sum)
    assert(math.abs(nrm(v(1L)) - 1.0) < 1e-12)
    assert(math.abs(nrm(v(3L)) - 1.0) < 1e-12)
  }

  test("idf suppresses ubiquitous terms: shared-stopword docs stay dissimilar") {
    // every doc carries "the"; only 1 and 2 share content words. With
    // plain tf (no idf) doc 3 would correlate with everything through
    // the stopword; the idf surrogate must keep cos(1,3) well under
    // cos(1,2).
    val df = docs(
      1L -> "the plasma reactor vented the coolant",
      2L -> "the reactor plasma coolant leak",
      3L -> "the gardener pruned the roses",
      4L -> "the violin section tuned the strings",
      5L -> "the archive catalogued the scrolls")
    val v = Vectorize.tfidfVectors(df, "doc_id", "text", dims = 256)
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val c12 = cos(v(1L), v(2L)); val c13 = cos(v(1L), v(3L))
    // shared CONTENT words (df=2) outweigh the shared stopword (df=5)
    // by an order of magnitude; absolute levels reflect the df=2
    // idf discount vs each doc's unique words
    assert(c12 > 0.35, s"content overlap: $c12")
    assert(c13 < 0.05, s"stopword-only overlap: $c13")
    assert(c12 > 5 * c13, s"contrast: $c12 vs $c13")
  }

  test("q68-style semantic dedup end-to-end on engine-derived vectors") {
    // paraphrase pairs share token multisets up to small edits; the
    // full loop is corpus → tfidf vectors → LSH block → blocked cosine
    // pairs → CC → keepers, with NO fixture embeddings anywhere.
    val shared = "galactic survey charts nebula drift velocities across " +
      "the outer spiral arm sectors during extended observation campaigns"
    val df = docs(
      1L -> shared,
      2L -> (shared + " today"), // near-dup of 1: one extra word
      3L -> "sourdough fermentation requires patient temperature control",
      4L -> "sourdough fermentation requires patient temperature control",  // exact dup of 3
      5L -> "tidal generators convert estuary currents into power",
      6L -> "medieval falconry treatises describe hood training")
    val dims = 256
    val vecs = Vectorize.tfidfVectors(df, "doc_id", "text", dims)
      .withColumn("block",
        Similarity.lshBuckets(col("vec"), dims, numPlanes = 1))
    // the 1-plane split is real blocking: doc 6 occupies the other
    // bucket (more planes put the 1/2 near-dup pair astride plane 1 —
    // exactly the recall loss multi-probe exists for; the blocked
    // dedup contract here is "pairs sharing a block dedup")
    val keep = Dedup.semanticKeepers(vecs, "id", "vec", "block",
        threshold = 0.8)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(keep(1L) === ((1L, true)))
    assert(keep(2L) === ((1L, false)), s"near-dup must fold into 1: $keep")
    assert(keep(3L) === ((3L, true)))
    assert(keep(4L) === ((3L, false)), s"exact dup must fold into 3: $keep")
    assert(keep(5L)._2 && keep(6L)._2, s"singletons keep: $keep")
  }

  test("frozen-model embed: query text retrieves its document via the corpus idf") {
    val corpus = docs(
      1L -> "the plasma reactor vented the coolant during the night shift",
      2L -> "the gardener pruned the roses beside the old greenhouse wall",
      3L -> "the violin section tuned the strings before the evening concert",
      4L -> "the archive catalogued the scrolls recovered from the monastery")
    val dims = 256
    val tf = Vectorize.termFrequencies(corpus, "doc_id", "text", dims)
    val model = Vectorize.docFrequencies(tf)
    val n = Vectorize.corpusSize(corpus)
    val corpusVecs = Vectorize.tfidfVectors(corpus, "doc_id", "text", dims)
    val queries = Seq(
      (101L, "reactor coolant plasma"),
      (102L, "roses greenhouse gardener"),
      (103L, "concert violin strings")).toDF("doc_id", "text")
    val qVecs = Vectorize.embed(queries, "doc_id", "text", model, n, dims)
    val top = Similarity.bruteForceTopK(
        corpusVecs.withColumnRenamed("id", "doc_id"),
        qVecs.withColumnRenamed("id", "doc_id"),
        "doc_id", "vec", k = 1)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toMap
    assert(top === Map(101L -> 1L, 102L -> 2L, 103L -> 3L), top.toString)
  }

  test("sparse form is partition-invariant and matches the dense components") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(d: org.apache.spark.sql.DataFrame) =
      Vectorize.tfidfSparse(d, "doc_id", "text", dims = 64)
        .as[(Long, Int, Long, Long, Long, Double)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    val a = run(base.repartition(7))
    assert(a == run(base.repartition(2)))
    // dense agrees with sparse pointwise (zero elsewhere)
    val dense = Vectorize.tfidfVectors(base, "doc_id", "text", dims = 64)
      .as[(Long, Seq[Double])].collect().toMap
    val byDoc = a.groupBy(_._1)
    byDoc.foreach { case (id, rows) =>
      val m = rows.map(r => r._2 -> r._6).toMap
      (0 until 64).foreach { j =>
        assert(dense(id)(j) == m.getOrElse(j, 0.0), s"doc $id dim $j")
      }
    }
  }
}
