package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String)(implicit
      e: org.apache.spark.sql.Encoder[T]): T =
    Seq(text).toDF("text").select(c.as("v")).as[T].head()

  test("tokenCount handles multi-space runs") {
    assert(one[Int](TextOps.tokenCount(col("text")), "a  b   c") == 3)
  }

  test("shingles: n-grams, distinct, empty below width") {
    val sh = one[Seq[String]](
      TextOps.shingles(TextOps.tokens(col("text")), 3), "a b c d")
    assert(sh == Seq("a b c", "b c d"))
    val short = one[Seq[String]](
      TextOps.shingles(TextOps.tokens(col("text")), 3), "a b")
    assert(short.isEmpty)
    val rep = one[Seq[String]](
      TextOps.shingles(TextOps.tokens(col("text")), 2), "x y x y x y")
    assert(rep == Seq("x y", "y x")) // distinct
  }

  test("bpeishCount splits alpha runs, digit runs, punctuation") {
    assert(one[Int](TextOps.bpeishCount(col("text")), "ab12 cd, e!") == 6)
  }

  test("fingerprint: equal text equal hash, different text different") {
    val df = Seq(("a b c", "a b c"), ("a b c", "a b d")).toDF("x", "y")
    val eq = df.select(
      (TextOps.fingerprint(col("x")) === TextOps.fingerprint(col("y"))).as("e"))
      .as[Boolean].collect()
    assert(eq.toSeq == Seq(true, false))
  }

  test("headFingerprint collides on shared prefixes only") {
    val df = Seq(
      ("one two three four five six", "one two three four nine ten"),
      ("one two three four five six", "zzz two three four five six"),
    ).toDF("x", "y")
    val eq = df.select(
      (TextOps.headFingerprint(col("x"), 4) === TextOps.headFingerprint(col("y"), 4)).as("e"))
      .as[Boolean].collect()
    assert(eq.toSeq == Seq(true, false))
  }

  test("langGuess picks the language with densest stopwords") {
    assert(one[String](TextOps.langGuess(TextOps.tokens(col("text"))),
      "the cat sat of the mat and it is that") == "en")
    assert(one[String](TextOps.langGuess(TextOps.tokens(col("text"))),
      "el gato y la casa de los que en un") == "es")
    assert(one[String](TextOps.langGuess(TextOps.tokens(col("text"))),
      "xyzzy plugh qwerty") == "und")
  }

  test("qualityKeep: gopher-style windows") {
    val good = ("the quick brown fox " * 5).trim
    assert(one[Boolean](TextOps.qualityKeep(col("text")), good))
    assert(!one[Boolean](TextOps.qualityKeep(col("text")), "too short"))
    val junk = Seq.fill(20)("!!@@##$$%%").mkString(" ") // no alpha
    assert(!one[Boolean](TextOps.qualityKeep(col("text")), junk))
  }

  test("compiled ShingleHashes equals the HOF reference form on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select(
      TextOps.shingleHashes(col("text"), 3).as("fast"),
      TextOps.shingleHashesHof(col("text"), 3).as("hof"))
    assert(both.filter(col("fast") =!= col("hof")).count() == 0)
    // edge cases: short + empty + multi-space
    val edge = Seq("a b", "", "x  y z", "a b c d").toDF("text").select(
      TextOps.shingleHashes(col("text"), 3).as("fast"),
      TextOps.shingleHashesHof(col("text"), 3).as("hof"))
    edge.collect().foreach(r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString))
  }

  test("hash60 is non-negative and stable") {
    val h = one[Long](TextOps.hash60(col("text")), "abc")
    assert(h > 0)
    assert(h == one[Long](TextOps.hash60(col("text")), "abc"))
  }

  test("JsonOps extracts and explodes props") {
    val df = Seq((1L, """{"k": 7, "m": "x"}""")).toDF("id", "props")
    assert(df.select(JsonOps.extractPath(col("props"), "$.k").cast("long"))
      .as[Long].head() == 7L)
    val entries = JsonOps.explodeEntries(df, "props", Seq("id"))
      .as[(Long, String, String)].collect().toSet
    assert(entries == Set((1L, "k", "7"), (1L, "m", "x")))
  }

  test("redactPii scrubs emails, phones, IPs; leaves prose and small numbers") {
    import spark.implicits._
    def red(t: String): String =
      Seq(t).toDF("t").select(TextOps.redactPii($"t").as("r")).head().getString(0)
    assert(red("contact bob.smith+x@corp.example.co for access") ==
      "contact [EMAIL] for access")
    assert(red("call +1 (555) 123-4567 today") == "call [PHONE] today")
    assert(red("node at 192.168.0.17 is down") == "node at [IP] is down")
    assert(red("order 8274619305 shipped") == "order [PHONE] shipped") // long ids redact by intent
    assert(red("we sold 42 units in 2024") == "we sold 42 units in 2024")
    assert(red("version 3.14.15 unchanged") == "version 3.14.15 unchanged")
    // auditable: placeholder count equals redaction count
    val mixed = "a@b.io then 10.0.0.1 then +44 20 7946 0958 end"
    assert(red(mixed) == "[EMAIL] then [IP] then [PHONE] end")
    // boundary groups are CONSUMED (no lookaround — the RE2-mirrorable
    // form, q132): the single ';' between two phones is consumed (and
    // re-emitted) by the first match, hiding the second from pass one;
    // the second pass catches it
    assert(red("ids 8274619305;9305827461 end") == "ids [PHONE];[PHONE] end")
    assert(red("+15551234567 starts the line") == "[PHONE] starts the line")
    assert(red("ends with +15551234567") == "ends with [PHONE]")
  }

  test("sentences: terminator runs split, terminators stay, edges behave") {
    import spark.implicits._
    def sents(t: String): Seq[String] =
      Seq(t).toDF("t").select(TextOps.sentences($"t").as("r"))
        .head().getSeq[String](0)
    assert(sents("Hello world. How are you? Fine! Done.") ==
      Seq("Hello world.", "How are you?", "Fine!", "Done."))
    // a terminator RUN is one boundary; the run stays with its sentence
    assert(sents("What?! Really. yes") == Seq("What?!", "Really.", "yes"))
    // no trailing whitespace → no split (mid-token dots never split)
    assert(sents("v1.2.3 is out") == Seq("v1.2.3 is out"))
    // the documented rule-based trade: abbreviations split
    assert(sents("Dr. Smith left") == Seq("Dr.", "Smith left"))
    // pre-existing newlines are sentence breaks (the coherent contract)
    assert(sents("one\ntwo. three") == Seq("one", "two.", "three"))
    assert(sents("") == Seq())
  }

  test("stripMarkup: blocks/comments/tags go, entities decode, prose survives") {
    import spark.implicits._
    def strip(t: String): String =
      Seq(t).toDF("t").select(TextOps.stripMarkup($"t").as("r")).head().getString(0)
    // script/style CONTENT is dropped (it is code, not text) — even
    // content full of <, > and && that would confuse the tag pass
    assert(strip("<p>a</p><script>var x = 1 < 2 && 2 > 1;</script><p>b</p>") == "a b")
    assert(strip("x<style>p { color: red; }</style>y") == "x y")
    assert(strip("keep<!-- secret\nnote -->this") == "keep this")
    // tags become spaces; attributes vanish with their tag
    assert(strip("<div class=\"x\">hello<br/>world</div>") == "hello world")
    // a lone '<' in prose is NOT a tag
    assert(strip("<b>if</b> a < b then") == "if a < b then")
    // entity subset decodes, &amp; LAST: &amp;lt; single-decodes
    assert(strip("a&nbsp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39; A&amp;B &amp;lt;") ==
      "a b <tag> \"q\" 's' A&B &lt;")
    // the documented tag-soup trade: an unquoted '>' inside an
    // attribute ends the tag early (regex-grade extraction)
    assert(strip("<img alt=a > b>x") == "b>x")
    // whitespace (incl. newlines/tabs) collapses; edges trim
    assert(strip("  <p>\n a\t\tb </p>\r\n") == "a b")
  }

  test("markupRatio: tag-heavy pages score high, prose scores 0, empty scores 0") {
    import spark.implicits._
    def ratio(t: String): Double =
      Seq(t).toDF("t").select(TextOps.markupRatio($"t").as("r")).head().getDouble(0)
    assert(ratio("just prose here") == 0.0)
    assert(ratio("") == 0.0)
    val heavy = "<html><head><script>var a=1;</script></head><body><p>hi</p></body></html>"
    assert(ratio(heavy) > 0.9)
    // encode→wrap→strip round-trip pins that decode inverts encode
    val txt = "A&B < C \"quoted\" 'single'"
    val enc = txt.replace("&", "&amp;").replace("<", "&lt;")
    def stripS(t: String): String =
      Seq(t).toDF("t").select(TextOps.stripMarkup($"t").as("r")).head().getString(0)
    assert(stripS(s"<p>$enc</p>") == txt)
  }

  test("compiled ShingleHash60s equals hash60 over string shingles on real docs") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    val compiled = docs.select($"doc_id",
        TextOps.shingleHash60s(col("text"), 3).as("x"))
      .as[(Long, Seq[Long])].collect().toMap
    val reference = docs.select($"doc_id",
        transform(TextOps.shingles(TextOps.tokens(col("text")), 3), s => TextOps.hash60(s)).as("x"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(compiled == reference)
  }

  test("chunkDocs: overlapping windows cover every token, tails included") {
    import org.apache.spark.sql.functions.col
    // 10-token doc, chunk 4 / stride 2 → starts 0,2,4,6 (6+4 covers
    // the tail); 3-token doc → one short chunk; chunk==stride → a
    // disjoint partition of the tokens
    val docs = Seq(
      (1L, (0 until 10).map(i => s"t$i").mkString(" ")),
      (2L, "a b c"),
    ).toDF("doc_id", "text")
    val got = TextOps.chunkDocs(docs, "doc_id", "text", chunkTokens = 4, strideTokens = 2)
      .orderBy(col("doc_id"), col("chunk_id"))
      .as[(Long, Int, Int, String, Int)].collect()
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3)).toSeq == Seq((0, 0), (1, 2), (2, 4), (3, 6)))
    assert(d1.map(_._4).toSeq == Seq(
      "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9"))
    assert(d1.forall(_._5 == 4))
    val d2 = got.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 0, 0, "a b c", 3)), s"short doc: ${d2.toSeq}")
    // overlap invariant: consecutive chunks share chunk−stride tokens
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(a._4.split(" ").drop(2).toSeq == b._4.split(" ").take(2).toSeq)
    }
    // disjoint mode reassembles the doc exactly
    val flat = TextOps.chunkDocs(docs, "doc_id", "text", chunkTokens = 4, strideTokens = 4)
      .orderBy(col("doc_id"), col("chunk_id"))
      .as[(Long, Int, Int, String, Int)].collect()
    assert(flat.filter(_._1 == 1L).map(_._4).mkString(" ") ==
      (0 until 10).map(i => s"t$i").mkString(" "))
  }
}
