package graft.streaming

import graft.SparkSpec
import graft.llm.{Ivf, IvfModel}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

// top-level so Spark can generate its encoder outside the suite scope
case class VecRow(vec_id: Long, embedding: Seq[Double])

class VectorIndexIntakeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed index ≡ batch indexRows across drains; stored search ≡ inline; exactly-once") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val root = tmpDir("graft_vidx_")
    val cents = IvfModel.df(spark)
    val store = new graft.io.SnapshotBucketedStore(s"$root/vs", numBuckets = 16,
      "parquet", statsColumns = Seq("cell"), keyColumns = Seq("id"),
      clusterColumn = Some("cell"))
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val all = emb.as[VecRow].collect().sortBy(_.vec_id)
    val (first, second) = all.splitAt(all.length / 2)

    val input = MemoryStream[VecRow]
    input.addData(first: _*)
    VectorIndexIntake.drainTo(input.toDF(), store, "vs", s"$root/ckpt", cents)
    // drain 2: the rest, PLUS a replay of a few drain-1 vectors
    // (at-least-once transport) — keyed upsert converges them
    input.addData(second ++ first.take(3): _*)
    VectorIndexIntake.drainTo(input.toDF(), store, "vs", s"$root/ckpt", cents)

    // stream ≡ batch: the maintained table IS indexRows over the union
    val streamed = store.read("vs").get.select("id", "cell", "code")
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    val batch = Ivf.indexRows(emb, "vec_id", "embedding", cents)
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(streamed == batch, "streamed index must equal the batch build bit-for-bit")

    // search through the maintained index ≡ the inline recompute
    val pred = col("vec_id") % 10 === 0
    val inline = Ivf.searchPq(emb, "vec_id", "embedding", cents,
        topK = 5, nprobe = 2, queryPred = pred)
      .orderBy("query_id", "rank").collect().toSeq
    val stored = Ivf.searchPqFrom(store, "vs", emb, "vec_id", "embedding",
        cents, topK = 5, nprobe = 2, queryPred = pred)
      .orderBy("query_id", "rank").collect().toSeq
    assert(inline.nonEmpty && stored == inline)

    // exactly-once: replaying an already-applied epoch is a no-op —
    // applyBatch (the foreachBatch body) refuses and changes nothing
    val verBefore = store.snapshots("vs").max
    val mark = store.lastAppliedBatch("vs").get
    assert(!VectorIndexIntake.applyBatch(store, "vs",
      emb.limit(5), mark, cents, "vec_id", "embedding"),
      "a replayed epoch must be refused")
    assert(store.snapshots("vs").max == verBefore, "replay must not commit")
    assert(store.read("vs").get.select("id", "cell", "code")
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq == batch)
  }

  test("streaming dup labels through the index ≡ batch CC over the union of ADC edges") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val root = tmpDir("graft_vdup_")
    val cents = IvfModel.df(spark)
    val store = new graft.io.SnapshotBucketedStore(s"$root/vs", numBuckets = 16,
      "parquet", statsColumns = Seq("cell"), keyColumns = Seq("id"),
      clusterColumn = Some("cell"))
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val all = emb.as[VecRow].collect().sortBy(_.vec_id)
    val byId = all.map(v => v.vec_id -> v.embedding).toMap
    // measured ADC scale on this data: identical vectors score their
    // reconstruction cosine ∈ [0.506, 0.761]; non-dup pairs ≤ 0.451
    val thr = 0.48
    val (first, second) = all.splitAt(all.length / 2)
    // planted exact duplicates SPANNING drains (same vector, new id):
    // copies of two drain-1 vectors arrive in drain 2, and a second
    // copy of one of them in drain 3 — a cross-drain 3-chain
    val dupA = first.head.vec_id; val dupB = first(3).vec_id
    val input = MemoryStream[VecRow]
    input.addData(first: _*)
    VectorIndexIntake.drainTo(input.toDF(), store, "vs", s"$root/ckpt", cents,
      maintainDupLabels = true, dupThreshold = thr)
    input.addData(second ++ Seq(
      VecRow(90001L, byId(dupA)), VecRow(90002L, byId(dupB))): _*)
    VectorIndexIntake.drainTo(input.toDF(), store, "vs", s"$root/ckpt", cents,
      maintainDupLabels = true, dupThreshold = thr)
    input.addData(VecRow(90003L, byId(dupA)))
    VectorIndexIntake.drainTo(input.toDF(), store, "vs", s"$root/ckpt", cents,
      maintainDupLabels = true, dupThreshold = thr)

    val labels = store.read("vs_dup_labels").get
      .as[(Long, Long)].collect().toMap
    // the cross-drain chains merged: {dupA, 90001, 90003} one
    // component rooted at the min id, {dupB, 90002} another
    assert(labels(90001L) == labels(dupA) && labels(90003L) == labels(dupA),
      s"3-chain must share a component: $labels")
    assert(labels(90002L) == labels(dupB))
    assert(labels(dupA) != labels(dupB), "distinct vectors must not merge")

    // stream ≡ batch: the label table equals batch CC over the ADC
    // edges of the FULL index probed by the FULL corpus
    val fullIndex = store.read("vs").get
    val corpus = emb.unionByName(Seq(
      (90001L, byId(dupA)), (90002L, byId(dupB)), (90003L, byId(dupA)))
      .toDF("vec_id", "embedding"))
    val edges = graft.llm.Ivf.adcPairsAbove(fullIndex, corpus,
      "vec_id", "embedding", cents, nprobe = 1, threshold = thr)
    val batchCc = graft.llm.Dedup.connectedComponentsConverged(edges)
      .as[(Long, Long)].collect().toMap
    assert(labels == batchCc,
      s"streamed labels must equal batch CC: ${labels.size} vs ${batchCc.size}")

    // replayed epoch refused untouched
    val mark = store.lastAppliedBatch("vs_dup_labels").get
    assert(!VectorIndexIntake.updateDupLabels(store, "vs",
      emb.limit(3), mark, cents, "vec_id", "embedding", thr))
    assert(store.read("vs_dup_labels").get.as[(Long, Long)].collect().toMap == labels)
  }
}
