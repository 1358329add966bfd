package graft.llm

import java.util.zip.Deflater

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the compression-ratio quality signal (graft.expr.DeflateLen —
  * the CCNet/RefinedWeb degenerate-text heuristic). DEFLATE has no
  * DuckDB mirror, so like the multimodal codecs this signal is
  * fixture-pinned here instead of oracled: the expression must equal
  * a direct driver-side Deflater call byte-for-byte, repeated text
  * must compress far below varied text, and the q119-family fit must
  * be able to separate classes on the signal alone. */
class CompressionSignalSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: same fixed parameters (level 6, raw). */
  private def refDeflateLen(s: String): Int = {
    val d = new Deflater(6, true)
    d.setInput(s.getBytes("UTF-8"))
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }

  private val prose = Seq(
    "the quick brown fox jumps over a lazy dog near the river bank",
    "spark plans declarative queries and catalyst optimizes the joins",
    "every partition holds a slice of the corpus sorted by document id",
    "quality filtering removes degenerate pages before tokenization",
    "language models train on deduplicated text mixed across sources",
    "streaming intake gates each micro batch with the frozen model",
  )
  private val spam = Seq(
    "buy buy buy buy buy buy buy buy buy buy buy buy buy buy buy buy",
    "spam spam spam spam spam spam spam spam spam spam spam spam spam",
    "zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz",
    "click here click here click here click here click here click here",
    "win win win win win win win win win win win win win win win win",
    "aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa",
  )

  test("deflateLen equals the direct Deflater reference, stable under repartition") {
    val docs = (prose ++ spam ++ Seq("")).toDF("text")
    val got = docs.repartition(5)
      .select(col("text"), TextOps.deflateLen(col("text")).as("dl"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    (prose ++ spam ++ Seq("")).foreach { t =>
      assert(got(t) == refDeflateLen(t), s"'$t': ${got(t)} vs ${refDeflateLen(t)}")
    }
  }

  test("repeated text compresses far below varied text") {
    val docs = (prose ++ spam).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val sig = CorpusStats.docSignals(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_bytes"), col("deflate_len"),
        col("compression_ratio"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getDouble(3)))).toMap
    val proseRatios = prose.indices.map(i => sig(i.toLong)._3)
    val spamRatios = spam.indices.map(i => sig((prose.length + i).toLong)._3)
    assert(proseRatios.min > 0.5, proseRatios.toString)
    assert(spamRatios.max < 0.45, spamRatios.toString)
    assert(spamRatios.max < proseRatios.min)
    // the ratio is exactly deflate_len / n_bytes
    sig.values.foreach { case (nb, dl, r) =>
      assert(r == dl.toDouble / math.max(nb, 1L).toDouble)
    }
  }

  test("a q119-family fit on compression_ratio alone separates spam from prose") {
    val docs = (prose.map((_, 1L)) ++ spam.map((_, 0L))).zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "y")
    val sig = CorpusStats.docSignals(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("y")), Seq("doc_id"))
    val f = QualityFit.fit(sig, Seq("compression_ratio"), "y")
    // higher compression ratio (less compressible) → prose label 1
    assert(f.nums(1) > 0, f.toString)
    val kept = QualityFit.scoreDetScaled(sig, f, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    prose.indices.foreach(i => assert(kept(i.toLong), s"prose $i dropped"))
    spam.indices.foreach(i =>
      assert(!kept((prose.length + i).toLong), s"spam $i kept"))
  }
}
