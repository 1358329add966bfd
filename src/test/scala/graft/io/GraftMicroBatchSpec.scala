package graft.io

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** The DSv2 streaming SOURCE (X252): `spark.readStream.table("cat.t")`
  * tails an append-log catalog table — manifest versions as offsets,
  * initial load then exactly the new generations per drain, one
  * partition per data file decoded executor-side; checkpoints
  * survive restarts; keyed/pinned/non-parquet refuse with guidance. */
class GraftMicroBatchSpec extends SparkSpec {
  import spark.implicits._

  private def register(root: String): String = {
    val name = "lakemb" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  private def rows(r: Range, tag: String = "x") =
    r.map(i => (i.toLong, i * 2L, tag)).toDF("uuid", "v", "tag")

  test("readStream.table: initial load, then exactly the new appends per drain") {
    val root = tmpDir("gmb_tail_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4)
    store.append("src", rows(0 until 40))
    store.append("src", rows(40 until 70))
    val cat = register(root)
    val sinkDir = tmpDir("gmb_sink_")
    val ckpt = tmpDir("gmb_ckpt_")

    def drain(): Unit =
      spark.readStream.table(s"$cat.src").writeStream
        .format("parquet").option("path", sinkDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()

    drain() // initial load: the whole table at the then-latest version
    assert(spark.read.parquet(sinkDir).count() == 70)

    store.append("src", rows(70 until 100, tag = "late"))
    drain() // second drain ships EXACTLY the new generation
    val out = spark.read.parquet(sinkDir)
    assert(out.count() == 100, "no re-delivery of the initial load")
    assert(out.select("uuid").as[Long].collect().toSet == (0L until 100L).toSet)

    drain() // nothing new → nothing shipped
    assert(spark.read.parquet(sinkDir).count() == 100)
  }

  test("streamed copy ≡ the batch read (values, all columns)") {
    val root = tmpDir("gmb_eq_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4)
    (0 until 5).foreach(g => store.append("src", rows(g * 20 until (g + 1) * 20,
      tag = s"g$g")))
    val cat = register(root)
    val sinkDir = tmpDir("gmb_eq_sink_")

    spark.readStream.table(s"$cat.src").writeStream
      .format("parquet").option("path", sinkDir)
      .option("checkpointLocation", tmpDir("gmb_eq_ckpt_"))
      .trigger(Trigger.AvailableNow()).start().awaitTermination()

    val streamed = spark.read.parquet(sinkDir)
      .orderBy("uuid").collect().map(_.toSeq).toSeq
    val batch = spark.table(s"$cat.src")
      .orderBy("uuid").collect().map(_.toSeq).toSeq
    assert(streamed == batch, "streamed rows must be bit-equal to the batch read")
  }

  test("SQL source chains into the SQL sink: lake-to-lake with one line each way") {
    val root = tmpDir("gmb_chain_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4)
    store.append("a", rows(0 until 30))
    val cat = register(root)
    spark.sql(s"CREATE TABLE $cat.b (uuid BIGINT, v BIGINT, tag STRING)")
    val ckpt = tmpDir("gmb_chain_ckpt_")

    def pump(): Unit =
      spark.readStream.table(s"$cat.a").writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).toTable(s"$cat.b")
        .awaitTermination()

    pump()
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.b").head.getLong(0) == 30L)
    store.append("a", rows(30 until 45))
    pump()
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.b").head.getLong(0) == 45L)
    // exactly-once both ends: re-pumping with nothing new lands nothing
    pump()
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.b").head.getLong(0) == 45L)
  }

  test("maxVersionsPerTrigger drains a backfill in bounded version steps") {
    val root = tmpDir("gmb_rate_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4)
    (0 until 6).foreach(g => store.append("src", rows(g * 10 until (g + 1) * 10)))
    val cat = register(root)
    val sinkDir = tmpDir("gmb_rate_sink_")
    val ckpt = tmpDir("gmb_rate_ckpt_")

    spark.readStream.option("maxVersionsPerTrigger", "2").table(s"$cat.src")
      .writeStream.format("parquet").option("path", sinkDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()

    assert(spark.read.parquet(sinkDir).count() == 60,
      "the cap bounds batch size, never total delivery")
    // six versions at <= 2 per trigger: at least 3 committed batches
    val batches = new java.io.File(s"$ckpt/offsets").listFiles()
      .count(f => f.getName.matches("[0-9]+"))
    assert(batches >= 3, s"expected bounded steps, got $batches batches")
  }

  test("the rate cap clamps to the oldest retained version on a vacuumed table") {
    val root = tmpDir("gmb_floor_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4)
    (0 until 6).foreach(g => store.append("src", rows(g * 10 until (g + 1) * 10)))
    store.vacuum("src", retainSnapshots = 2) // only the last two versions remain
    val cat = register(root)
    val sinkDir = tmpDir("gmb_floor_sink_")

    // a naive cap would point the first batch at a vacuumed version;
    // the floor sends the initial load to the oldest RETAINED snapshot
    spark.readStream.option("maxVersionsPerTrigger", "2").table(s"$cat.src")
      .writeStream.format("parquet").option("path", sinkDir)
      .option("checkpointLocation", tmpDir("gmb_floor_ckpt_"))
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    assert(spark.read.parquet(sinkDir).count() == 60,
      "initial load at the retained floor, then bounded steps to latest")
  }

  test("a widened log table streams with old generations null-filled") {
    val root = tmpDir("gmb_widen_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4)
    store.append("w", Seq((1L, "a")).toDF("uuid", "tag"))
    store.append("w", Seq((2L, "b", 9L)).toDF("uuid", "tag", "extra"))
    val cat = register(root)
    val sink = tmpDir("gmb_widen_sink_")
    spark.readStream.table(s"$cat.w").writeStream
      .format("parquet").option("path", sink)
      .option("checkpointLocation", tmpDir("gmb_widen_ckpt_"))
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val out = spark.read.parquet(sink).orderBy("uuid")
      .collect().map(_.toSeq).toSeq
    // the requested-schema clip null-fills columns a generation
    // predates — same semantics as the batch read's footer merge
    assert(out == Seq(Seq(1L, "a", null), Seq(2L, "b", 9L)), out)
  }

  test("keyed tables and pinned reads refuse with guidance") {
    val root = tmpDir("gmb_refuse_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4,
      keyColumns = Seq("uuid"))
    store.upsert("k", rows(0 until 10), "uuid")
    val cat = register(root)

    val e = intercept[Exception] {
      spark.readStream.table(s"$cat.k").writeStream
        .format("noop").option("checkpointLocation", tmpDir("gmb_rckpt_"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("keyed CDC streams through")),
      chain(e).mkString("\n"))
  }
}
