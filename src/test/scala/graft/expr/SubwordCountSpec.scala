package graft.expr

import graft.SparkSpec
import graft.llm.TextOps
import org.apache.spark.sql.functions._

class SubwordCountSpec extends SparkSpec {
  import spark.implicits._

  private def count(text: String, vocab: Seq[String] = TextOps.SubwordVocab): Int =
    Seq(text).toDF("t")
      .select(TextOps.subwordCount(col("t"), vocab).as("n"))
      .head().getInt(0)

  test("greedy longest-match-first with per-char fallback") {
    val vocab = Seq("un", "ness", "ing", "the", "at")
    // un|h|a|p|p|i|ness
    assert(count("unhappiness", vocab) == 7)
    // the|at|e|r — greedy takes 'the' over 'at' at position 0
    assert(count("theater", vocab) == 4)
    // no match anywhere: one token per character
    assert(count("xyz", vocab) == 3)
  }

  test("whole-text form: words sum, whitespace free, case folded") {
    val vocab = Seq("the", "ing")
    assert(count("THE thing", vocab) == 1 + 3) // "the" + t|h|ing
    assert(count("", vocab) == 0)
    assert(count("   ", vocab) == 0)
  }

  test("longest entry wins over an equally-anchored shorter one") {
    // 'ation' (5) must beat 'at' (2) at the same cursor
    assert(count("ation", Seq("at", "ation")) == 1)
    assert(count("ation", Seq("at")) == 1 + 3)
  }

  test("SQL registration: graft_subword_count / graft_shingle_hashes") {
    // via GraftExtensions (SparkSpec session enables it)
    val n = spark.sql("SELECT graft_subword_count('the thing') AS n").head().getInt(0)
    assert(n == count("the thing")) // same expression, SQL surface
    val sh = spark.sql("SELECT graft_shingle_hashes('a b c d', 3) AS sh")
      .head().getSeq[Long](0)
    assert(sh.length == 2) // two 3-gram windows over four tokens
  }

  test("matches a JVM reference implementation on corpus-like text") {
    val vocab = TextOps.SubwordVocab
    val byFirst = vocab.groupBy(_.head).map { case (c, es) => c -> es.sortBy(-_.length) }
    def ref(text: String): Int =
      text.trim.split("\\s+").filter(_.nonEmpty).map { w0 =>
        val w = w0.toLowerCase(java.util.Locale.ROOT)
        var pos = 0; var n = 0
        while (pos < w.length) {
          val hit = byFirst.getOrElse(w.charAt(pos), Nil).find(e => w.startsWith(e, pos))
          pos += hit.map(_.length).getOrElse(1); n += 1
        }
        n
      }.sum
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "internationalization and localization testing",
      "Pre-processing UNDERSTANDS mixed CASE tokens 123 !?",
    )
    texts.foreach(t => assert(count(t) == ref(t), s"mismatch on: $t"))
  }
}
