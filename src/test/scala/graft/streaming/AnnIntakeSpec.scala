package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

// top-level so Spark can generate its encoder outside the suite scope
case class AnnDoc(doc_id: Long, text: String)

class AnnIntakeSpec extends SparkSpec {

  private val base =
    "the quick brown fox jumps over the lazy dog near the riverbank today"

  test("streaming ANN state recovers planted near-dups ACROSS drains, exactly-once") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val root = tmpDir("graft_ann_")
    val store = new graft.io.SnapshotBucketedStore(s"$root/ann", numBuckets = 4)
    val input = MemoryStream[AnnDoc]

    // drain 1: the original + unrelated chaff
    input.addData(
      AnnDoc(1L, base),
      AnnDoc(2L, "completely different words about ships and harbors and tides rolling in"),
      AnnDoc(3L, "yet another unrelated document mentioning mountains valleys and glaciers melting"))
    AnnIntake.drainTo(input.toDF(), store, "ann", s"$root/ckpt")

    // drain 2: a near-copy of doc 1 (one token changed) — the pair
    // SPANS drains, so no within-batch dedup could have seen it
    input.addData(
      AnnDoc(102L, base.replace("lazy", "sleepy")),
      AnnDoc(103L, "more chaff text regarding different topics entirely like cooking pasta"))
    AnnIntake.drainTo(input.toDF(), store, "ann", s"$root/ckpt")

    val pairs = AnnIntake.nearDupPairsEstimated(store, "ann", threshold = 0.5).get
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 102L)),
      s"expected exactly the cross-drain planted pair, got ${pairs.toSeq}")
    assert(pairs.head._3 > 0.5 && pairs.head._3 <= 1.0)

    // exactly-once: a crash-replay of the last epoch must not change
    // the state (same batch id → both appends recognized and skipped)
    val sigsBefore = store.read("ann").get.count()
    val bucketsBefore = store.read("ann_buckets").get.count()
    assert(!store.appendIfNew("ann",
      AnnIntake.signatures(Seq(AnnDoc(102L, base)).toDF(), "doc_id", "text", 3, 32), 1L))
    assert(store.read("ann").get.count() == sigsBefore)
    assert(store.read("ann_buckets").get.count() == bucketsBefore)

    // identical doc re-sent in a LATER epoch (at-least-once transport):
    // memberships dedupe on read, so it cannot self-pair into noise
    input.addData(AnnDoc(1L, base))
    AnnIntake.drainTo(input.toDF(), store, "ann", s"$root/ckpt")
    val again = AnnIntake.nearDupPairsEstimated(store, "ann", threshold = 0.5).get
      .as[(Long, Long, Double)].collect()
    assert(again.map(p => (p._1, p._2)).toSet == Set((1L, 102L)), s"got ${again.toSeq}")

    // compaction applies to both tables and changes nothing
    assert(store.compactLogs("ann"))
    assert(store.compactLogs("ann_buckets"))
    val afterCompact = AnnIntake.nearDupPairsEstimated(store, "ann", threshold = 0.5).get
      .as[(Long, Long, Double)].collect()
    assert(afterCompact.map(p => (p._1, p._2)).toSet == Set((1L, 102L)))
  }

  test("incremental label maintenance ≡ batch CC across drains, incl. a cross-drain cluster merge") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val root = tmpDir("graft_ann_lbl_")
    val store = new graft.io.SnapshotBucketedStore(s"$root/ann", numBuckets = 4)
    val input = MemoryStream[AnnDoc]
    val thr = 0.5
    // cluster X, cluster Y = a 2-token variant family of X (distant
    // enough that no direct X–Y pair ever bucket-collides — probed),
    // and a 1-token bridge sharing one substitution with each side:
    // est-jaccard ≈ 0.9 within clusters, ≈ 0.72–0.81 bridge→both
    val baseX = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val baseY = baseX.replace("gamma", "three").replace("xi", "fourteen")
    val bridge = baseX.replace("gamma", "three")

    def drain(docs: AnnDoc*): Unit = {
      input.addData(docs: _*)
      AnnIntake.drainTo(input.toDF(), store, "ann", s"$root/ckpt",
        maintainLabels = true, threshold = thr)
    }
    def streamLabels: Map[Long, Long] =
      store.read("ann_labels").get.as[(Long, Long)].collect().toMap
    def batchLabels: Map[Long, Long] =
      graft.llm.Dedup.connectedComponentsConverged(
          AnnIntake.nearDupPairsEstimated(store, "ann", threshold = thr).get
            .select("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap

    // drain 1: cluster X forms within one drain
    drain(AnnDoc(10L, baseX), AnnDoc(11L, baseX.replace("upsilon", "upsilonn")),
      AnnDoc(90L, "totally unrelated chaff regarding cooking bread loaves overnight with yeast and patience"))
    assert(streamLabels == batchLabels && streamLabels.values.toSet == Set(10L))
    // drain 2: cluster Y forms ACROSS state (21 pairs with 20)
    drain(AnnDoc(20L, baseY))
    drain(AnnDoc(21L, baseY.replace("upsilon", "upsilonn")))
    assert(streamLabels == batchLabels,
      s"stream $streamLabels vs batch $batchLabels")
    assert(streamLabels(20L) == 20L && streamLabels(21L) == 20L)
    assert(streamLabels(10L) == 10L && streamLabels(11L) == 10L)
    // drain 4: the bridge doc merges clusters X and Y — both frozen
    // components contract into one root, min id over ALL members
    drain(AnnDoc(30L, bridge))
    val merged = streamLabels
    assert(merged == batchLabels, s"stream $merged vs batch $batchLabels")
    assert(Set(10L, 11L, 20L, 21L, 30L).forall(merged(_) == 10L),
      s"cross-drain merge must unify to min id: $merged")
    assert(!merged.contains(90L), "edge-free chaff stays unlabeled")

    // exactly-once: replaying the last epoch's label update is a no-op
    val mark = store.lastAppliedBatch("ann_labels").get
    val bucketsNow = store.read("ann_buckets").get
    assert(!AnnIntake.updateLabels(store, "ann", bucketsNow.limit(0), mark,
      threshold = thr))
    assert(streamLabels == merged)
  }

  test("estimated verification agrees with the batch miner's exact verdict on the same corpus") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val root = tmpDir("graft_ann_eq_")
    val store = new graft.io.SnapshotBucketedStore(s"$root/ann", numBuckets = 4)
    val input = MemoryStream[AnnDoc]
    val docs = Seq(
      AnnDoc(1L, base),
      AnnDoc(2L, base.replace("quick", "rapid")),
      AnnDoc(3L, "entirely different content about astronomy telescopes and distant galaxies tonight"),
    )
    input.addData(docs: _*)
    AnnIntake.drainTo(input.toDF(), store, "ann", s"$root/ckpt")
    val streamed = AnnIntake.nearDupPairsEstimated(store, "ann", threshold = 0.5).get
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = graft.llm.Dedup.nearDupPairs(docs.toDF(), "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(streamed == exact, s"streamed $streamed vs exact $exact")
  }

  test("exact-verify window: in-stream verdicts ≡ the batch miner bit-for-bit") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val root = tmpDir("graft_ann_ew_")
    // stamp is a stats column so the window sweep drops whole
    // generations metadata-only
    val store = new graft.io.SnapshotBucketedStore(s"$root/ann",
      numBuckets = 4, statsColumns = Seq("stamp"))
    val input = MemoryStream[AnnDoc]
    val chaff2 = "entirely different content about astronomy telescopes and distant galaxies tonight"
    val d1 = Seq(AnnDoc(1L, base),
      AnnDoc(2L, "words about ships and harbors and tides rolling in slowly this evening"),
      AnnDoc(3L, chaff2))
    val d2 = Seq(AnnDoc(102L, base.replace("lazy", "sleepy")), // cross-drain 1↔102
      AnnDoc(105L, base.replace("quick", "rapid"))) // cross 1↔105, within 102↔105
    val d3 = Seq(AnnDoc(201L, chaff2.replace("tonight", "today"))) // cross 3↔201
    input.addData(d1: _*)
    AnnIntake.drainTo(input.toDF(), store, "ann", s"$root/ckpt", exactWindow = 5)
    input.addData(d2: _*)
    AnnIntake.drainTo(input.toDF(), store, "ann", s"$root/ckpt", exactWindow = 5)
    input.addData(d3: _*)
    AnnIntake.drainTo(input.toDF(), store, "ann", s"$root/ckpt", exactWindow = 5)

    val streamed = AnnIntake.verifiedPairs(store, "ann").get
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    val batch = graft.llm.Dedup.nearDupPairs(
        (d1 ++ d2 ++ d3).toDF(), "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    // the window covered every arrival, so the in-stream decisions —
    // pairs AND their exact jaccard values — equal the batch pass
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
    // the two-edits-apart 102↔105 pair falls below 0.5 in BOTH
    // engines — only the single-edit pairs verify
    assert(streamed.map(p => (p._1, p._2)) ==
      Set((1L, 102L), (1L, 105L), (3L, 201L)),
      s"planted pairs must verify: $streamed")
  }

  test("exact-verify window: state stays bounded, expired pairs fall to the batch pass") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val root = tmpDir("graft_ann_bw_")
    val store = new graft.io.SnapshotBucketedStore(s"$root/ann",
      numBuckets = 4, statsColumns = Seq("stamp"))
    val input = MemoryStream[AnnDoc]
    input.addData(AnnDoc(1L, base),
      AnnDoc(2L, "ships and harbors and tides rolling in slowly this quiet evening today"))
    AnnIntake.drainTo(input.toDF(), store, "ann", s"$root/ckpt", exactWindow = 1)
    input.addData(AnnDoc(9L, "totally unrelated filler about orchards apples cider presses and autumn"))
    AnnIntake.drainTo(input.toDF(), store, "ann", s"$root/ckpt", exactWindow = 1)
    input.addData(AnnDoc(102L, base.replace("lazy", "sleepy")),
      AnnDoc(103L, base.replace("lazy", "sleepy").replace("quick", "rapid")))
    AnnIntake.drainTo(input.toDF(), store, "ann", s"$root/ckpt", exactWindow = 1)
    // BOUNDED: only the newest drain's gram generation survives the sweep
    val stamps = store.read("ann_grams").get
      .select("stamp").distinct().as[Long].collect().toSet
    assert(stamps.size == 1, s"window=1 must retain one drain, got $stamps")
    // within-window pair verified exactly; the cross-window 1↔102 pair
    // expired before meeting — the documented fall-to-batch residue
    val got = AnnIntake.verifiedPairs(store, "ann").get
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((102L, 103L)), s"got $got")
    // the estimate tier still sees the cross-window candidate, so the
    // periodic batch pass knows where to look
    val est = AnnIntake.nearDupPairsEstimated(store, "ann", threshold = 0.5).get
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(est.contains((1L, 102L)), s"estimate tier lost the candidate: $est")
  }
}
