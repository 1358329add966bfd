package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The `graft` DataSource (X224): format("graft") round-trips through
  * the store's commit families, SQL reaches tables via USING graft,
  * reads prune dirs from pushed filters (Bloom for equality, min/max
  * for ranges) while Spark re-applies the exact predicate, and
  * SaveMode contracts hold. */
class GraftSourceSpec extends SparkSpec {
  import spark.implicits._

  private def rows(r: Range, tag: String = "x") =
    r.map(i => (i.toLong, i * 2L, tag)).toDF("uuid", "v", "tag")

  test("write/read round-trip: append+key is upsert, overwrite replaces") {
    val root = tmpDir("graft_src_")
    rows(0 until 100).write.format("graft")
      .option("root", root).option("table", "t").option("key", "uuid")
      .mode("append").save()
    rows(50 until 150, tag = "y").write.format("graft")
      .option("root", root).option("table", "t").option("key", "uuid")
      .mode("append").save()
    val read = spark.read.format("graft")
      .option("root", root).option("table", "t").load()
    val m = read.select("uuid", "tag").as[(Long, String)].collect().toMap
    assert(m.size == 150)
    assert(m(10L) == "x" && m(75L) == "y" && m(149L) == "y") // keep-last
    // overwrite = atomic replace
    rows(0 until 5, tag = "z").write.format("graft")
      .option("root", root).option("table", "t").option("key", "uuid")
      .mode("overwrite").save()
    assert(spark.read.format("graft").option("root", root)
      .option("table", "t").load().count() == 5)
  }

  test("SQL surface: USING graft view, WHERE prunes via stats/Blooms") {
    val root = tmpDir("graft_src_sql_")
    implicit val s = spark
    // a store with stats + Blooms, generations roughly sorted on v
    val store = new SnapshotBucketedStore(root, numBuckets = 4,
      statsColumns = Seq("v"), keyColumns = Seq("uuid"))
    (0 until 8).foreach { g =>
      store.append("t", rows(g * 100 until (g + 1) * 100))
    }
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW graft_t
         |USING graft OPTIONS (root '$root', `table` 't')""".stripMargin)
    // range predicate: answers exactly, and the scan pruned dirs
    val got = spark.sql(
      "SELECT uuid, v FROM graft_t WHERE v >= 100 AND v <= 198 ORDER BY uuid")
      .as[(Long, Long)].collect().toSeq
    assert(got == (50L until 100L).map(i => i -> i * 2))
    val (kept, total) = GraftSource.lastPrune.get
    assert(total == 8 && kept <= 2, s"range must prune: $kept/$total")
    // equality predicate: Bloom pruning path
    val one = spark.sql("SELECT tag FROM graft_t WHERE uuid = 420")
      .as[String].collect().toSeq
    assert(one == Seq("x"))
    val (keptEq, totalEq) = GraftSource.lastPrune.get
    assert(totalEq == 8 && keptEq <= 2, s"eq must prune: $keptEq/$totalEq")
    // IN-list predicate: multi-probe Bloom pruning path
    val two = spark.sql(
      "SELECT uuid FROM graft_t WHERE uuid IN (5, 505) ORDER BY uuid")
      .as[Long].collect().toSeq
    assert(two == Seq(5L, 505L))
    val (keptIn, totalIn) = GraftSource.lastPrune.get
    assert(totalIn == 8 && keptIn <= 4, s"IN must prune: $keptIn/$totalIn")
    // column pruning reaches the scan: a COUNT(*) still counts rows
    assert(spark.sql("SELECT COUNT(*) FROM graft_t").head().getLong(0) == 800L)
  }

  test("streaming sink: writeStream.format(graft) is exactly-once keyed") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val root = tmpDir("graft_src_stream_")
    val input = MemoryStream[(Long, Long, String)]
    val docs = input.toDF().toDF("uuid", "v", "tag")
    def drain(): Unit = {
      val q = docs.writeStream.format("graft")
        .option("checkpointLocation", s"$root/ckpt")
        .option("root", root).option("table", "t").option("key", "uuid")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    input.addData((1L, 10L, "a"), (2L, 20L, "a"))
    drain()
    input.addData((2L, 21L, "b"), (3L, 30L, "b")) // revises key 2
    drain()
    val m = spark.read.format("graft").option("root", root)
      .option("table", "t").load()
      .select("uuid", "v", "tag").as[(Long, Long, String)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m == Map(1L -> ((10L, "a")), 2L -> ((21L, "b")), 3L -> ((30L, "b"))))
    // a third drain with no new data commits nothing new
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 64)
    val versionsBefore = store.snapshots("t")
    drain()
    assert(store.snapshots("t") == versionsBefore,
      "an empty drain must not commit a generation")
  }

  test("streaming source: readStream tails the append log incrementally") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tmpDir("graft_src_tail_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4)
    store.append("t", rows(0 until 100))
    store.append("t", rows(100 until 150))
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("root", root).option("table", "t").load()
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = b.select("uuid", "v").as[(Long, Long)].collect()
          seen.synchronized { seen ++= got }: Unit
        }
        .start()
      q.awaitTermination()
    }
    drain() // initial load: both generations
    assert(seen.map(_._1).sorted == (0L until 150L))
    store.append("t", rows(150 until 170))
    drain() // incremental: ONLY the new generation's rows
    assert(seen.size == 170, s"expected 170 total, got ${seen.size} (re-read?)")
    assert(seen.map(_._1).sorted == (0L until 170L))
    drain() // no new data: nothing arrives
    assert(seen.size == 170)
  }

  test("keyed CDC source: readStream with key tails added/changed/removed per trigger") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tmpDir("graft_src_cdc_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4)
    store.upsert("t", rows(0 until 50), "uuid") // v0
    val seen = scala.collection.mutable.ArrayBuffer[(Long, String, Option[Long])]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("root", root).option("table", "t").option("key", "uuid").load()
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = b.select("uuid", "change", "v")
            .collect().map(r => (r.getLong(0), r.getString(1),
              if (r.isNullAt(2)) None else Some(r.getLong(2))))
          seen.synchronized { seen ++= got }: Unit
        }
        .start()
      q.awaitTermination()
    }
    drain() // initial load: everything `added`
    assert(seen.size == 50 && seen.forall(_._2 == "added"))
    assert(seen.map(_._1).sorted == (0L until 50L))
    seen.clear()
    // a revision wave + new keys + a keyed delete, across TWO commits
    store.upsert("t", rows(10 until 12, tag = "y")
      .unionByName(rows(50 until 55)), "uuid") // v1
    store.delete("t", "uuid", Seq(3L).toDF("uuid")) // v2
    drain() // ONE trigger ships the fused change set v0 → v2
    val byId = seen.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(10L) == (("changed", Some(20L))) &&
      byId(11L) == (("changed", Some(22L))), byId.toString)
    assert((50L until 55L).forall(i => byId(i) == (("added", Some(i * 2)))))
    assert(byId(3L)._1 == "removed" && byId(3L)._2.isEmpty)
    assert(seen.size == 8, s"untouched keys must not re-ship: $seen")
    seen.clear()
    drain() // no new commits: nothing arrives
    assert(seen.isEmpty)
    // a LAZY delete is CDC-visible too (tombstone-aware touch test)
    store.deleteLazy("t", "uuid", Seq(7L).toDF("uuid"))
    drain()
    assert(seen.toList == List((7L, "removed", None)), seen.toString)
  }

  test("lake-to-lake: source → transform → sink, all standard API") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tmpDir("graft_src_chain_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4)
    store.append("raw", rows(0 until 100))
    def pump(): Unit = {
      // the whole pipeline is declarative: tail raw, filter+project,
      // keyed exactly-once upsert into clean — zero custom glue
      val q = spark.readStream.format("graft")
        .option("root", root).option("table", "raw").load()
        .filter(col("v") % 4 === 0)
        .withColumn("tag", upper(col("tag")))
        .writeStream.format("graft")
        .option("checkpointLocation", s"$root/ckpt")
        .option("root", root).option("table", "clean").option("key", "uuid")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    pump()
    store.append("raw", rows(100 until 160))
    pump()
    val clean = store.read("clean").get
      .select("uuid", "tag").as[(Long, String)].collect().toMap
    // v = uuid*2, v%4==0 ⇔ uuid even; both generations flowed through
    assert(clean.keySet == (0L until 160L by 2).toSet)
    assert(clean.values.forall(_ == "X"))
  }

  test("SaveMode contracts: errorifexists refuses, ignore leaves intact") {
    val root = tmpDir("graft_src_mode_")
    rows(0 until 10).write.format("graft")
      .option("root", root).option("table", "t")
      .mode("errorifexists").save()
    intercept[IllegalArgumentException] {
      rows(0 until 10).write.format("graft")
        .option("root", root).option("table", "t")
        .mode("errorifexists").save()
    }
    rows(90 until 95).write.format("graft")
      .option("root", root).option("table", "t").mode("ignore").save()
    assert(spark.read.format("graft").option("root", root)
      .option("table", "t").load().count() == 10)
    // missing options refuse loudly
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("root", root).load()
    }
    // missing table refuses loudly at read
    intercept[java.util.NoSuchElementException] {
      spark.read.format("graft").option("root", root)
        .option("table", "ghost").load().schema
    }
  }
}
