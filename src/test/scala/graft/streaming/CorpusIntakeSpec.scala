package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class CorpusIntakeSpec extends SparkSpec {

  private case class Doc(doc_id: Long, ts: Long, text: String)

  private val B = 1600000000000L // keep event times above the initial watermark
  private val good =
    "the quick brown fox jumps over the lazy dog near the old river bank " +
      "while rain falls softly on green hills and wind moves through tall trees"

  test("intake dedups content, scrubs PII, gates quality, lands in the snapshot store") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("graft_intake_")
    implicit val s = spark
    val store = new graft.io.SnapshotBucketedStore(s"$root/corpus", numBuckets = 4)
    val input = MemoryStream[Doc]

    val docs = input.toDF().withColumn("ts", timestamp_millis(col("ts")))
    input.addData(
      Doc(1L, B, good),
      Doc(2L, B + 1000, good),                       // exact content dup → dropped on intake
      Doc(3L, B + 2000, s"$good contact admin@site.example.org now"),
      Doc(4L, B + 3000, "too short"),                // quality gate
    )
    CorpusIntake.drainTo(docs, store, "corpus", s"$root/ckpt")

    val out = store.read("corpus").get.select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 3L), out.map(_._1).mkString(","))
    assert(out(1)._2.contains("[EMAIL]") && !out(1)._2.contains("@"), out(1)._2)

    // second drain: replayed content (at-least-once transport) within
    // the watermark is dropped; genuinely new content lands
    input.addData(
      Doc(5L, B + 4000, good),                       // same content resent → dropped
      Doc(6L, B + 5000, good.replace("fox", "wolf")))
    CorpusIntake.drainTo(docs, store, "corpus", s"$root/ckpt")
    val ids = store.read("corpus").get.select("doc_id")
      .as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 3L, 6L), ids.mkString(","))
  }
}
