package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangIdSpec extends SparkSpec {
  import spark.implicits._

  // small natural-text seed corpus, a few sentences per language —
  // the char-shape evidence (word-boundary n-grams, suffixes) is what
  // the rank profiles learn
  private val seeds = Seq(
    ("en", "the old man walked slowly through the quiet village and watched the evening light"),
    ("en", "children were playing in the garden while their mother prepared dinner for everyone"),
    ("en", "it is often said that history repeats itself when nobody remembers the past"),
    ("es", "el viejo caminaba lentamente por el pueblo tranquilo mirando la luz de la tarde"),
    ("es", "los ninos jugaban en el jardin mientras su madre preparaba la cena para todos"),
    ("es", "se dice que la historia se repite cuando nadie recuerda lo que paso antes"),
    ("fr", "le vieil homme marchait lentement dans le village tranquille en regardant la lumiere du soir"),
    ("fr", "les enfants jouaient dans le jardin pendant que leur mere preparait le diner pour tous"),
    ("fr", "on dit souvent que l histoire se repete quand personne ne se souvient du passe"),
    ("de", "der alte mann ging langsam durch das stille dorf und betrachtete das abendlicht"),
    ("de", "die kinder spielten im garten wahrend ihre mutter das abendessen fur alle vorbereitete"),
    ("de", "man sagt oft dass sich die geschichte wiederholt wenn sich niemand an die vergangenheit erinnert"),
  ).toDF("lang", "text")

  private def predictions(docs: org.apache.spark.sql.DataFrame) = {
    val profile = LangId.fit(seeds, "lang", "text")
    LangId.predict(docs, profile, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("held-out sentences classify to their language") {
    val docs = Seq(
      (1L, "the weather this morning was cold but the children walked to school anyway"),
      (2L, "la madre miraba por la ventana mientras los viejos hablaban en la plaza"),
      (3L, "les oiseaux chantaient dans les arbres pendant que le soleil se levait"),
      (4L, "das wetter war heute morgen kalt aber die kinder gingen trotzdem zur schule"),
    ).toDF("doc_id", "text")
    assert(predictions(docs) == Map(1L -> "en", 2L -> "es", 3L -> "fr", 4L -> "de"))
  }

  test("predictWithMargin: mixed-language text goes und, clean text stays confident") {
    val profile = LangId.fit(seeds, "lang", "text")
    val docs = Seq(
      // clean German — large margin to every other language
      (1L, "das wetter war heute morgen kalt aber die kinder gingen trotzdem zur schule"),
      // half-French half-Spanish — the argmax picks SOMETHING, but the
      // runner-up explains it almost as well: exactly what und is for
      (2L, "les enfants jouaient dans le jardin los ninos jugaban en el jardin"),
    ).toDF("doc_id", "text")
    val got = LangId.predictWithMargin(docs, profile, "doc_id", "text",
        minMargin = 400L)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(4)))).toMap
    val (lang1, best1, m1) = got(1L)
    assert(lang1 == "de" && best1 == "de" && m1 >= 400L, got.toString)
    val (lang2, best2, m2) = got(2L)
    assert(lang2 == "und", got.toString)           // the margin gate fired
    assert(Set("fr", "es").contains(best2), got.toString) // audit keeps argmax
    assert(m2 < 400L, got.toString)
    // threshold 0 = plain argmax: the gate itself is the only difference
    val ungated = LangId.predictWithMargin(docs, profile, "doc_id", "text",
        minMargin = 0L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ungated(2L) == best2, ungated.toString)
  }

  test("model classifies where the stopword heuristic misclassifies or goes blind") {
    // French heavy on "de la": es and fr stopword lists both score 4/10,
    // and langGuess's fixed precedence picks es — a real misclassification
    val frText = "on se souvient de la belle saison de la moisson"
    // Spanish with no listed stopword at all: the heuristic says "und"
    val esText = "vamos rapidamente hacia aquella montana lejana sin miedo alguno"
    val heur = Seq((1L, frText), (2L, esText)).toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.langGuess(TextOps.tokens(col("text"))).as("g"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(heur(1L) == "es", s"fixture drift: heuristic now says ${heur(1L)}")
    assert(heur(2L) == "und", s"fixture drift: heuristic now says ${heur(2L)}")

    val docs = Seq((1L, frText), (2L, esText)).toDF("doc_id", "text")
    val got = predictions(docs)
    assert(got(1L) == "fr", s"model must recover the heuristic's es/fr tie: $got")
    assert(got(2L) == "es", s"model must see char shapes the stopword list can't: $got")
  }

  test("letterless docs are und with null distance; every input id comes back") {
    val docs = Seq((1L, "12345 67890 !!!"), (2L, ""), (3L, "the quiet village evening")).toDF("doc_id", "text")
    val profile = LangId.fit(seeds, "lang", "text")
    val out = LangId.predict(docs, profile, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out(0)._2 == "und" && out(0)._3.isEmpty)
    assert(out(1)._2 == "und" && out(1)._3.isEmpty)
    assert(out(2)._2 == "en" && out(2)._3.nonEmpty)
  }

  test("profiles are deterministic: rank ties break on n-gram order, repartition-invariant") {
    val p1 = LangId.fit(seeds, "lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val p2 = LangId.fit(seeds.repartition(7), "lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(p1 == p2)
    // space-padded boundary n-grams are present (the Cavnar–Trenkle trick)
    assert(p1.exists { case (l, g, _) => l == "en" && g == " th" })
  }
}
