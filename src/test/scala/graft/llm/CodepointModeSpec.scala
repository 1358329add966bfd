package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The non-segmented-script path: whitespace tokenization degenerates
  * on CJK text (one token per line), codepoint mode does not. */
class CodepointModeSpec extends SparkSpec {

  // two near-identical Han strings (one character differs) and one
  // unrelated — none contains a single space
  private val han1 = "深度学习模型在大规模语料上训练之后获得了通用的表示能力"
  private val han2 = "深度学习模型在大规模语料上训练之后获得了强大的表示能力"
  private val han3 = "今天的天气晴朗适合在公园里散步和骑车锻炼身体放松心情"

  private def cjkDocs = {
    val s = spark
    import s.implicits._
    Seq((1L, han1), (2L, han2), (3L, han3)).toDF("doc_id", "text")
  }

  test("segment: Whitespace is the identity, Codepoint space-joins non-whitespace codepoints") {
    val s = spark
    import s.implicits._
    val df = Seq("深度 学习\nab", "", "   ").toDF("t").select(
      TextOps.segment(col("t"), TextOps.Whitespace).as("ws"),
      TextOps.segment(col("t"), TextOps.Codepoint).as("cp"))
    val rows = df.collect()
    assert(rows(0).getString(0) === "深度 学习\nab")
    assert(rows(0).getString(1) === "深 度 学 习 a b")
    // empty and all-whitespace text segment to the empty string
    assert(rows(1).getString(1) === "" && rows(2).getString(1) === "")
  }

  test("segment strips U+3000 ideographic space like ASCII whitespace") {
    val s = spark
    import s.implicits._
    // the CJK space must not survive as a content codepoint — it
    // would pollute char-gram dedup/repetition signals (and the q80
    // oracle strips the identical RE2 class)
    val df = Seq("深度　学习", "　", "a　　 b").toDF("t")
    val segs = df.select(TextOps.segment(col("t"), TextOps.Codepoint))
      .collect().map(_.getString(0))
    assert(segs(0) === "深 度 学 习")
    assert(segs(1) === "")
    assert(segs(2) === "a b")
  }

  test("segment counts supplementary-plane codepoints as single tokens") {
    val s = spark
    import s.implicits._
    // 😀 (U+1F600) and 𝕏 (U+1D54F) are surrogate PAIRS in UTF-16; a
    // code-unit walk would split them in half — Spark's length/substr
    // are codepoint-based, so each stays one token
    val df = Seq("😀a𝕏 b").toDF("t")
    val seg = df.select(TextOps.segment(col("t"), TextOps.Codepoint).as("s"))
      .head().getString(0)
    assert(seg === "😀 a 𝕏 b")
    val n = df.select(size(TextOps.tokens(col("t"), TextOps.Codepoint)))
      .head().getInt(0)
    assert(n === 4)
  }

  test("tokens(mode) yields one token per codepoint on unsegmented text") {
    val n = cjkDocs
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"), TextOps.Codepoint)).as("n"))
      .orderBy(col("doc_id")).collect().map(_.getInt(1))
    assert(n.toSeq === Seq(han1.length, han2.length, han3.length))
    val w = cjkDocs.select(size(TextOps.tokens(col("text"), TextOps.Whitespace)).as("n"))
      .collect().map(_.getInt(0))
    assert(w.toSeq === Seq(1, 1, 1)) // the degenerate form
  }

  test("repetition profile is non-degenerate in codepoint mode on CJK text") {
    // whitespace mode: every doc is ONE token — zero dup fraction,
    // zero bigrams; the degeneracy the mode switch exists to fix
    val ws = CorpusStats.repetitionProfile(cjkDocs).orderBy(col("doc_id")).collect()
    assert(ws.forall(r => r.getAs[Long]("n_tokens") === 1L))
    assert(ws.forall(r => r.getAs[Long]("n_bigrams") === 0L))
    val cp = CorpusStats.repetitionProfile(cjkDocs, mode = TextOps.Codepoint)
      .orderBy(col("doc_id")).collect()
    val r1 = cp(0)
    assert(r1.getAs[Long]("n_tokens") === han1.length.toLong)
    assert(r1.getAs[Long]("n_distinct") === han1.toSeq.distinct.size.toLong)
    assert(r1.getAs[Double]("dup_token_frac") > 0.0) // 模/大/学… repeat
    assert(r1.getAs[Long]("n_bigrams") === (han1.length - 1).toLong)
  }

  test("codepoint-mode near-dup mining finds the CJK near-duplicate pair") {
    // whitespace mode: a 1-token doc has no 3-gram shingles at all —
    // the miner is silently blind
    val ws = Dedup.nearDupPairs(cjkDocs, "doc_id", "text")
    assert(ws.count() === 0L)
    // codepoint mode: char-3-gram minhash finds exactly (1, 2)
    val cp = Dedup.nearDupPairs(cjkDocs, "doc_id", "text",
      mode = TextOps.Codepoint)
    val pairs = cp.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }
}
