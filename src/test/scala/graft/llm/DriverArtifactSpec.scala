package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The driver-materialization bound on caller-provided model
  * artifacts (DriverArtifact.collectBounded): loads within the bound
  * behave exactly as before; loads past it refuse LOUDLY with the
  * bound in the message — never a silent driver OOM or a bloated
  * task closure. */
class DriverArtifactSpec extends SparkSpec {

  test("collectBounded passes through within the bound") {
    import spark.implicits._
    val rows = DriverArtifact.collectBounded(
      (1 to 10).toDF("x"), max = 10, what = "test artifact")
    assert(rows.length == 10)
  }

  test("collectBounded refuses past the bound, naming bound and artifact") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      DriverArtifact.collectBounded(
        (1 to 11).toDF("x"), max = 10, what = "test artifact")
    }
    assert(e.getMessage.contains("10"), e.getMessage)
    assert(e.getMessage.contains("test artifact"), e.getMessage)
  }

  test("loadVocab reads a real vocab file, dedups, and enforces its bound") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vocab_")
    val f = dir.resolve("vocab.txt")
    java.nio.file.Files.write(f,
      "the\ning\n\nthe\n##er\n".getBytes("UTF-8"))
    val v = TextOps.loadVocab(spark, f.toString)
    assert(v.sorted == Seq("##er", "ing", "the"))
    // an over-limit "vocab" (really a corpus) refuses with the bound
    val big = dir.resolve("corpus.txt")
    java.nio.file.Files.write(big,
      (1 to 51).map(i => s"tok$i").mkString("\n").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      TextOps.loadVocab(spark, big.toString, maxEntries = 50)
    }
    assert(e.getMessage.contains("50"), e.getMessage)
    assert(e.getMessage.contains("corpus.txt"), e.getMessage)
  }

  test("UnigramLm.segment refuses an over-limit model table") {
    import spark.implicits._
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val model = (1 to 6).map(i => (s"p$i", 1L, 3L))
      .toDF("piece", "cnt", "cost")
    val e = intercept[IllegalArgumentException] {
      UnigramLm.segment(docs, model, maxVocab = 5).collect()
    }
    assert(e.getMessage.contains("5"), e.getMessage)
    assert(e.getMessage.contains("unigram-LM model table"), e.getMessage)
  }
}
