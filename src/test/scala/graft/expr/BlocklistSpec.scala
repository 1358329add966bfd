package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Aho–Corasick blocklist screening (X219): the compiled automaton's
  * hits equal the naive per-term contains scan on every fixture —
  * overlapping/nested occurrences, terms that are prefixes/suffixes
  * of each other, unicode, repeated occurrences deduplicated — and
  * the output array is sorted, distinct, and codegen-stable. */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def naive(text: String, terms: Seq[String]): Seq[String] =
    terms.filter(text.contains).sorted

  private val classic = Seq("he", "she", "his", "hers")

  test("compiled hits equal the naive contains scan (classic fixture)") {
    val texts = Seq("ushers", "he said", "shhe", "hi", "", "hershey",
      "xxhisxx", "s h e", "hehehe", "hershis")
    val got = texts.toDF("text")
      .select(col("text"),
        BlocklistHits.blocklistHits(col("text"), classic).as("hits"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap
    texts.foreach { t =>
      assert(got(t) == naive(t, classic), s"text '$t'")
    }
    // the load-bearing case: 'ushers' contains she, he, AND hers —
    // nested + overlapping occurrences all surface
    assert(got("ushers") == Seq("he", "hers", "she"))
  }

  test("repeats dedup; order is binary; empty text empty; null null") {
    val df = Seq[(java.lang.Integer, String)](
      (1, "abab zz abab"), (2, ""), (3, null))
      .toDF("id", "text")
      .select(col("id"),
        BlocklistHits.blocklistHits(col("text"), Seq("zz", "ab", "ba")).as("hits"))
    val rows = df.collect().map(r =>
      r.getInt(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(rows(1) == Seq("ab", "ba", "zz")) // each occurs 2–3×, reported once, sorted
    assert(rows(2) == Seq.empty)
    assert(rows(3) == null)
  }

  test("unicode terms match on code units; no case folding") {
    val terms = Seq("über", "Straße", "naïve")
    val got = Seq("die STRASSE ist über der straße, naïvely")
      .toDF("text")
      .select(BlocklistHits.blocklistHits(col("text"), terms))
      .head().getSeq[String](0)
    // 'Straße' does NOT hit 'straße'/'STRASSE' — no folding, by contract
    assert(got == Seq("naïve", "über"))
  }

  test("random cross-check vs naive over generated texts and terms") {
    val rnd = new scala.util.Random(17)
    val alphabet = "abcd"
    val terms = (0 until 40).map { _ =>
      (0 until (1 + rnd.nextInt(4)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.distinct
    val texts = (0 until 200).map { _ =>
      (0 until rnd.nextInt(60))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val got = texts.toDF("text")
      .select(col("text"),
        BlocklistHits.blocklistHits(col("text"), terms).as("hits"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1))
    got.foreach { case (t, hits) =>
      assert(hits == naive(t, terms), s"text '$t'")
    }
  }

  test("screening decision composes: size(hits) > 0 filters") {
    val df = Seq("clean text here", "contains badword inside", "fine")
      .toDF("text")
    val kept = df.filter(size(
        BlocklistHits.blocklistHits(col("text"), Seq("badword", "worse"))) === 0)
      .as[String].collect().toSeq
    assert(kept == Seq("clean text here", "fine"))
  }

  private def naiveRedact(text: String, terms: Seq[String], mask: Char): String = {
    val covered = new Array[Boolean](text.length)
    terms.foreach { t =>
      var from = 0
      var at = text.indexOf(t, from)
      while (at >= 0) {
        (at until at + t.length).foreach(covered(_) = true)
        from = at + 1 // overlapping occurrences too
        at = text.indexOf(t, from)
      }
    }
    text.zipWithIndex.map { case (c, i) => if (covered(i)) mask else c }.mkString
  }

  test("redaction masks the interval union; overlaps merge; lengths preserved") {
    val terms = Seq("scan slow", "slow fast", "bad")
    val texts = Seq(
      "a scan slow fast path", // two overlapping phrase hits merge
      "badbadbad", // adjacent + repeated
      "clean text", "", "embadded") // 'bad' inside a word
    val got = texts.toDF("text")
      .select(col("text"),
        BlocklistHits.blocklistRedact(col("text"), terms).as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    texts.foreach { t =>
      assert(got(t) == naiveRedact(t, terms, '*'), s"text '$t'")
      assert(got(t).length == t.length, "code-unit length must be preserved")
    }
    assert(got("a scan slow fast path") == "a ************** path")
    assert(got("clean text") == "clean text")
  }

  test("redaction random cross-check; custom mask; null passes through") {
    val rnd = new scala.util.Random(23)
    val alphabet = "abc "
    val terms = Seq("ab", "bc a", "ca", "b b")
    val texts = (0 until 150).map(_ =>
      (0 until rnd.nextInt(50)).map(_ => alphabet(rnd.nextInt(4))).mkString)
    val got = texts.toDF("text")
      .select(col("text"),
        BlocklistHits.blocklistRedact(col("text"), terms, mask = '#').as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    got.foreach { case (t, r) =>
      assert(r == naiveRedact(t, terms, '#'), s"text '$t'")
    }
    val n = Seq[(Int, String)]((1, null)).toDF("id", "text")
      .select(BlocklistHits.blocklistRedact(col("text"), terms))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("constructor contracts refuse loudly") {
    intercept[IllegalArgumentException] {
      BlocklistHits.blocklistHits(col("text"), Nil)
    }
    intercept[IllegalArgumentException] {
      BlocklistHits.blocklistHits(col("text"), Seq("a", ""))
    }
    intercept[IllegalArgumentException] {
      BlocklistHits.blocklistHits(col("text"), Seq("a", "a"))
    }
  }
}
