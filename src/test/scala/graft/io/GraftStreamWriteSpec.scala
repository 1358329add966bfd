package graft.io

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** The exactly-once streaming SQL sink (X246):
  * `df.writeStream.toTable("cat.t")` onto catalog tables — epoch ids
  * become the store's batch marks, so replays land zero rows; keyed
  * tables upsert per epoch; complete mode maps to the batch-marked
  * replace. */
class GraftStreamWriteSpec extends SparkSpec {
  import spark.implicits._

  private def register(root: String): String = {
    val name = "lakesw" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  private def count(t: String): Long =
    spark.sql(s"SELECT COUNT(*) FROM $t").head().getLong(0)

  test("writeStream.toTable appends exactly once; an epoch replay lands zero rows") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("gsw_append_")
    val cat = register(root)
    spark.sql(s"CREATE TABLE $cat.ev (id BIGINT, v BIGINT)")
    val in = MemoryStream[(Long, Long)]
    val df = in.toDF().toDF("id", "v")
    def drain(ckpt: String): Unit =
      df.writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).toTable(s"$cat.ev")
        .awaitTermination()

    in.addData((1L, 10L), (2L, 20L))
    drain(s"$root/ckpt")
    assert(count(s"$cat.ev") == 2)
    in.addData((3L, 30L))
    drain(s"$root/ckpt")
    assert(count(s"$cat.ev") == 3)
    assert(spark.sql(s"SELECT id FROM $cat.ev ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L))

    // a FRESH checkpoint re-delivers every block as epoch 0 — the
    // at-least-once transport shape; the store's batch mark (already
    // past 0) makes the replayed epoch land ZERO rows. (Corollary of
    // the same contract: the mark is per-TABLE — one exactly-once
    // writer per table, as everywhere else in the store.)
    drain(s"$root/ckpt_replay")
    assert(count(s"$cat.ev") == 3, "replayed epochs must land zero rows")
  }

  test("keyed table: each epoch is an exactly-once keyed upsert (keep-last)") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("gsw_keyed_")
    val cat = register(root)
    spark.sql(s"CREATE TABLE $cat.ku (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES('key'='id', 'buckets'='4', 'insert'='upsert')")
    val in = MemoryStream[(Long, Long)]
    val df = in.toDF().toDF("id", "v")
    def drain(ckpt: String): Unit =
      df.writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).toTable(s"$cat.ku")
        .awaitTermination()

    in.addData((1L, 1L), (2L, 2L))
    drain(s"$root/ckpt")
    in.addData((1L, 100L), (3L, 3L)) // revises key 1, adds key 3
    drain(s"$root/ckpt")
    val got = spark.sql(s"SELECT id, v FROM $cat.ku ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 100L), (2L, 2L), (3L, 3L)))
    // replay: the full re-delivery lands zero changes
    drain(s"$root/ckpt_replay")
    assert(spark.sql(s"SELECT id, v FROM $cat.ku ORDER BY id")
      .as[(Long, Long)].collect().toSeq == got)

    // a keyed table that did NOT opt into insert='upsert' refuses the
    // streaming append — same contract as batch INSERT INTO
    spark.sql(s"CREATE TABLE $cat.kr (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES('key'='id', 'buckets'='4')")
    val e = intercept[Exception] {
      df.writeStream.option("checkpointLocation", s"$root/ckpt_r")
        .trigger(Trigger.AvailableNow()).toTable(s"$cat.kr")
        .awaitTermination()
    }
    def rootCause(t: Throwable): Throwable =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq.last
    assert(rootCause(e).getMessage.contains("upsert"), e.getMessage)
  }

  test("update mode: a stateful aggregation keyed-upserts its changed keys per epoch") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("gsw_update_")
    val cat = register(root)
    spark.sql(s"CREATE TABLE $cat.cnt (id BIGINT, n BIGINT) " +
      "TBLPROPERTIES('key'='id', 'buckets'='4', 'insert'='upsert')")
    val in = MemoryStream[(Long, Long)]
    val df = in.toDF().toDF("id", "v")
      .groupBy("id").agg(org.apache.spark.sql.functions.count("v").as("n"))
    def drain(): Unit =
      df.writeStream.option("checkpointLocation", s"$root/ckpt")
        .outputMode("update")
        .trigger(Trigger.AvailableNow()).toTable(s"$cat.cnt")
        .awaitTermination()

    in.addData((1L, 1L), (1L, 2L), (2L, 1L))
    drain()
    assert(spark.sql(s"SELECT id, n FROM $cat.cnt ORDER BY id")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 2L), (2L, 1L)))
    // second epoch changes ONLY keys 2 and 3 — key 1's row must be the
    // UNTOUCHED original (update mode ships changed keys; the keyed
    // upsert replaces exactly them)
    in.addData((2L, 2L), (3L, 1L))
    drain()
    assert(spark.sql(s"SELECT id, n FROM $cat.cnt ORDER BY id")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 2L), (2L, 2L), (3L, 1L)))

    // update mode on a PLAIN table keeps Spark's own refusal — the
    // update-as-append marker is keyed-upsert-only (appending changed
    // rows would silently duplicate)
    spark.sql(s"CREATE TABLE $cat.plain (id BIGINT, n BIGINT)")
    val e = intercept[Exception] {
      df.writeStream.option("checkpointLocation", s"$root/ckpt_p")
        .outputMode("update")
        .trigger(Trigger.AvailableNow()).toTable(s"$cat.plain")
        .awaitTermination()
    }
    assert(e.getMessage.toLowerCase.contains("update"), e.getMessage)
  }

  test("complete mode: each epoch atomically replaces with the recomputation") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("gsw_complete_")
    val cat = register(root)
    spark.sql(s"CREATE TABLE $cat.agg (id BIGINT, n BIGINT)")
    val in = MemoryStream[(Long, Long)]
    val df = in.toDF().toDF("id", "v")
      .groupBy("id").agg(org.apache.spark.sql.functions.count("v").as("n"))
    def drain(): Unit =
      df.writeStream.option("checkpointLocation", s"$root/ckpt")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).toTable(s"$cat.agg")
        .awaitTermination()

    in.addData((1L, 1L), (1L, 2L), (2L, 1L))
    drain()
    assert(spark.sql(s"SELECT id, n FROM $cat.agg ORDER BY id")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 2L), (2L, 1L)))
    in.addData((2L, 2L), (3L, 1L))
    drain()
    assert(spark.sql(s"SELECT id, n FROM $cat.agg ORDER BY id")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 2L), (2L, 2L), (3L, 1L)),
      "complete mode must install the full recomputation")
  }
}
