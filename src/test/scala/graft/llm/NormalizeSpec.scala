package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unicode normalization preprocessor (TextOps.normalize +
  * graft.expr.UnicodeNormalize) and its threading through the dedup
  * entry points. The NFC half is oracle-checked end to end by q93;
  * this spec pins the NFKC compatibility foldings DuckDB cannot
  * mirror, the step order, and the operator threading. */
class NormalizeSpec extends SparkSpec {

  private def norm1(s: String, mode: TextOps.NormMode): String = {
    val sp = spark
    import sp.implicits._
    Seq(s).toDF("t").select(TextOps.normalize(col("t"), mode).as("n"))
      .head().getString(0)
  }

  test("NFKC folds full-width, ligature, and NBSP compatibility variants") {
    val m = TextOps.Normalize() // NFKC + caseFold + collapseWs
    // full-width Ａｂｃ (U+FF21, U+FF42, U+FF43) → abc
    assert(norm1("Ａｂｃ", m) === "abc")
    // ﬁ ligature (U+FB01) → fi; ß is NOT folded by NFKC (stays ß)
    assert(norm1("conﬁg", m) === "config")
    // NBSP (U+00A0) is compatibility-mapped to space and collapses
    assert(norm1("a  b", m) === "a b")
    // circled digit ① (U+2460) → 1
    assert(norm1("①", m) === "1")
  }

  test("NFC composes combining marks; case-fold and ws-collapse are separable") {
    val nfc = TextOps.Normalize(form = "NFC")
    // decomposed e + U+0301 composes to é; uppercase folds; runs collapse
    assert(norm1("CAFÉ  　x", nfc) === "café x")
    // caseFold off keeps case, still composes
    assert(norm1("CAFÉ", TextOps.Normalize("NFC", caseFold = false)) ===
      "CAFÉ")
    // collapseWs off keeps the exotic spaces
    assert(norm1("a b", TextOps.Normalize("NFC", collapseWs = false)) ===
      "a b")
    // NormNone is the identity
    assert(norm1("A É", TextOps.NormNone) === "A É")
  }

  test("normalize matches java.text.Normalizer ground truth on mixed text") {
    val sp = spark
    import sp.implicits._
    val samples = Seq(
      "Ｈｅｌｌｏ　ｗｏｒｌｄ", "näive café", "ﬂow chart",
      "plain ascii stays", "", "  spaced  out  ")
    val got = samples.toDF("t")
      .select(TextOps.normalize(col("t"), TextOps.Normalize()).as("n"))
      .collect().map(_.getString(0)).toSeq
    val want = samples.map { s =>
      java.text.Normalizer
        .normalize(s, java.text.Normalizer.Form.NFKC)
        .toLowerCase
        .replaceAll(TextOps.UnicodeWsClass + "+", " ").trim
    }
    assert(got === want)
  }

  test("nearDupPairs with norm catches a width/case variant pair raw mode misses") {
    val sp = spark
    import sp.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    // same content, upper-cased with NBSP separators — raw shingles
    // share nothing, normalized shingles are identical
    val variant = base.toUpperCase.replace(' ', ' ')
    val docs = Seq((1L, base), (2L, variant),
      (3L, "a completely different document about spark physical plans"))
      .toDF("doc_id", "text")
    val raw = Dedup.nearDupPairs(docs, "doc_id", "text", n = 3,
      numHashes = 16, bands = 4, threshold = 0.5)
    assert(raw.count() === 0L)
    val normed = Dedup.nearDupPairs(docs, "doc_id", "text", n = 3,
      numHashes = 16, bands = 4, threshold = 0.5,
      norm = TextOps.Normalize())
    val pairs = normed.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
    assert(normed.head().getDouble(2) === 1.0) // identical after norm
  }

  test("dedupLines with norm drops a width-variant boilerplate line, rewrite keeps raw bytes") {
    val sp = spark
    import sp.implicits._
    val boiler = "subscribe to our newsletter today"
    val boilerWide = "SUBSCRIBE TO OUR NEWSLETTER TODAY"
    val docs = Seq(
      (1L, s"real content line one\n$boiler\nmore real content here"),
      (2L, s"other document body text\n$boilerWide\nclosing unique remarks"))
      .toDF("doc_id", "text")
    // raw mode: the hashes differ, nothing reaches minDocs=2
    val raw = Corpus.dedupLines(docs, "doc_id", "text")
    assert(raw.filter(col("n_dropped") > 0).count() === 0L)
    // normalized matching: both variants hash equal and drop — and the
    // SURVIVING lines are byte-identical to the input (rewrite is raw)
    val normed = Corpus.dedupLines(docs, "doc_id", "text",
        norm = TextOps.Normalize())
      .orderBy("doc_id").collect()
    assert(normed.map(_.getInt(2)).toSeq === Seq(1, 1))
    assert(normed(0).getString(1) ===
      "real content line one\nmore real content here")
    assert(normed(1).getString(1) ===
      "other document body text\nclosing unique remarks")
  }

  test("exactKeepers with norm groups variants; ASCII short-circuit returns input") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "same doc"), (2L, "SAME DOC"), (3L, "different"))
      .toDF("doc_id", "text")
    val raw = Dedup.exactKeepers(docs, "doc_id", "text")
    assert(raw.count() === 3L)
    val normed = Dedup.exactKeepers(docs, "doc_id", "text",
      norm = TextOps.Normalize())
    val groups = normed.select("doc_id", "dup_count")
      .as[(Long, Long)].collect().toMap
    assert(groups === Map(1L -> 2L, 3L -> 1L))
    // the interpreted path (compute) agrees with what the codegen'd
    // DataFrame runs above produced
    val e = graft.expr.UnicodeNormalize(
      org.apache.spark.sql.GraftBridge.toExpr(lit("x")), "NFC")
    assert(e.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("CAFE\u0301"))
      .toString === "CAF\u00c9")
    // ASCII short-circuit: the SAME UTF8String object comes back
    val ascii = org.apache.spark.unsafe.types.UTF8String.fromString("plain")
    assert(e.compute(ascii) eq ascii)
  }

  test("invalid form is rejected at construction") {
    intercept[IllegalArgumentException] {
      TextOps.normalize(col("t"), TextOps.Normalize(form = "NFX"))
    }
  }
}
