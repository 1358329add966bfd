package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization (PqModel + Similarity.pqEncode/pqDecode/
  * pqPack/pqTopKWithinLabel). Encode/decode/pack arithmetic is
  * oracle-checked bit-for-bit by q95; this spec pins the model
  * invariants, a Scala-reference encode, and the search-quality half
  * (ADC recall against exact brute force) the oracle cannot express. */
class PqSpec extends SparkSpec {

  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")

  test("codebook shape and code range invariants") {
    assert(PqModel.codebooks.length === PqModel.m)
    assert(PqModel.codebooks.forall(_.length === PqModel.k))
    assert(PqModel.codebooks.forall(_.forall(_.length === PqModel.sub)))
    val codes = emb.select(Similarity.pqEncode(col("embedding")).as("c"))
    val bad = codes.filter(
      size(col("c")) =!= PqModel.m ||
        exists(col("c"), x => x < 0 || x >= PqModel.k)).count()
    assert(bad === 0L)
  }

  test("encode matches an independent Scala reference on real vectors") {
    val rows = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"),
        Similarity.pqEncode(col("embedding")).as("codes"))
      .orderBy("vec_id").limit(25).collect()
    rows.foreach { r =>
      val e = r.getSeq[Double](1)
      val got = r.getSeq[Int](2)
      val want = (0 until PqModel.m).map { mm =>
        var best = 0; var bestD = Double.MaxValue
        for (kk <- 0 until PqModel.k) {
          var d = 0.0
          for (j <- 0 until PqModel.sub) {
            val diff = e(mm * PqModel.sub + j) - PqModel.codebooks(mm)(kk)(j)
            d += diff * diff
          }
          if (d < bestD) { bestD = d; best = kk }
        }
        best
      }
      assert(got === want, s"vec ${r.getLong(0)}")
    }
  }

  test("pack is the base-16 positional encoding, within 16^M, unpackable") {
    val rows = emb.select(
        Similarity.pqEncode(col("embedding")).as("codes"))
      .select(col("codes"), Similarity.pqPack(col("codes")).as("p"))
      .limit(50).collect()
    rows.foreach { r =>
      val codes = r.getSeq[Int](0)
      val p = r.getLong(1)
      assert(p === codes.zipWithIndex.map { case (c, i) =>
        c.toLong * math.pow(16, i).toLong }.sum)
      assert(p >= 0 && p < math.pow(16, PqModel.m).toLong)
      // unpack round-trips
      val un = (0 until PqModel.m).map(i => ((p >> (4 * i)) & 0xf).toInt)
      assert(un === codes)
    }
  }

  test("reconstruction error is bounded on the training distribution") {
    val err = emb.select(
      array_max(zip_with(
        Similarity.pqDecode(Similarity.pqEncode(col("embedding"))),
        transform(col("embedding"), x => x.cast("double")),
        (a, b) => abs(a - b))).as("e"))
    val mx = err.agg(max(col("e"))).head().getDouble(0)
    // measured 0.43 max on sf0.01; a drifted codebook or a broken
    // argmin shows up as a multiple of this
    assert(mx < 0.6, s"max reconstruction error $mx")
  }

  test("ADC search recalls most exact-cosine neighbors at 32x compression") {
    val k = 5
    val exact = Similarity.topKWithinLabel(emb, "vec_id", "embedding",
        "label", k = k, queryPred = col("vec_id") % 10 === 0)
      .select(col("query_id"), col("neighbor_id"))
    val adc = Similarity.pqTopKWithinLabel(emb, "vec_id", "embedding",
        "label", k = k, queryPred = col("vec_id") % 10 === 0)
      .select(col("query_id"), col("neighbor_id"))
    val nExact = exact.count()
    val hit = exact.intersect(adc).count()
    val recall = hit.toDouble / nExact
    // 4-bit-per-subvector codes on 64-dim synthetic vectors: measured
    // recall@5 ~0.5+; a broken decode/rank collapses it toward the
    // random baseline (k / label-population ≈ 0.08)
    assert(recall >= 0.35, s"recall@5 = $recall ($hit / $nExact)")
    // and the ADC ranking is deterministic
    val again = Similarity.pqTopKWithinLabel(emb, "vec_id", "embedding",
      "label", k = k, queryPred = col("vec_id") % 10 === 0)
      .select(col("query_id"), col("neighbor_id"))
    assert(adc.exceptAll(again).count() === 0L)
  }

  test("exact re-rank repairs ADC recall monotonically, to brute force at full width") {
    val k = 5
    val pred = col("vec_id") % 10 === 0
    val exact = Similarity.topKWithinLabel(emb, "vec_id", "embedding",
        "label", k = k, queryPred = pred)
      .select(col("query_id"), col("neighbor_id"))
    val nExact = exact.count()
    def recallAt(cands: Int): Double = {
      val rr = Similarity.pqTopKReranked(emb, "vec_id", "embedding",
          "label", k = k, candidates = cands, queryPred = pred)
        .select(col("query_id"), col("neighbor_id"))
      exact.intersect(rr).count().toDouble / nExact
    }
    val raw = {
      val adc = Similarity.pqTopKWithinLabel(emb, "vec_id", "embedding",
          "label", k = k, queryPred = pred)
        .select(col("query_id"), col("neighbor_id"))
      exact.intersect(adc).count().toDouble / nExact
    }
    val r2 = recallAt(2 * k)
    val r8 = recallAt(8 * k)
    assert(r2 >= raw - 1e-9, s"re-rank@${2 * k} ($r2) below raw ADC ($raw)")
    assert(r8 >= r2 - 1e-9, s"recall must be monotone in width: $r8 < $r2")
    // candidates >= label population ⇒ stage 1 passes every in-label
    // pair through and the exact re-rank IS brute force
    val labelMax = emb.groupBy("label").count()
      .agg(max("count")).head().getLong(0).toInt
    assert(recallAt(labelMax + k) == 1.0,
      "full-width re-rank must recover the exact top-k")
    // and re-ranked scores are exact cosines: bit-equal to the
    // brute-force scores on the recovered pairs
    val full = Similarity.pqTopKReranked(emb, "vec_id", "embedding",
        "label", k = k, candidates = labelMax + k, queryPred = pred)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    val bf = Similarity.topKWithinLabel(emb, "vec_id", "embedding",
        "label", k = k, queryPred = pred)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    assert(full.exceptAll(bf).count() === 0L,
      "exact stage must reproduce brute-force scores bit-for-bit")
  }

  test("fused packed-code ADC cosine is bit-equal to the pqDecode/dot/sqrt chain") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val v = Similarity.withNorm(emb, "vec_id", "embedding")
      .withColumn("code", Similarity.pqPack(Similarity.pqEncode(col("e"))))
    // pair every 7th vector (as the "query") with itself+3 (as the
    // "candidate") — arbitrary deterministic pairs covering the corpus
    val q = v.filter(col("id") % 7 === 0)
      .select(col("id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
    val c = v.select((col("id") - 3).as("qid"), col("code"))
    val pairs = q.join(c, Seq("qid"))
    val unfused = pairs
      .withColumn("de", Similarity.pqDecode(Similarity.pqUnpack(col("code"))))
      .withColumn("dn", sqrt(Similarity.dot(col("de"), col("de"))))
      .filter(col("dn") > 0.0)
      .select(col("qid"),
        (Similarity.dot(col("qe"), col("de")) / (col("qn") * col("dn"))).as("sim"))
    val fused = pairs
      .select(col("qid"), Similarity.pqCosine(col("qe"), col("qn"), col("code")).as("sim"))
      .filter(col("sim").isNotNull)
    val a = unfused.orderBy("qid").collect().toSeq
    val b = fused.orderBy("qid").collect().toSeq
    assert(a.nonEmpty && a == b,
      "fused ADC cosine must replay the unfused chain bit-for-bit")
  }
}
