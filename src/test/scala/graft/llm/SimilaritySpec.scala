package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bruteForceTopK ranks by true cosine (hand-checked tiny corpus)") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 1L)
    val got = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 3)
      .orderBy("rank")
      .select("neighbor_id").as[Long].collect()
    assert(got.toSeq == Seq(2L, 3L, 4L)) // by descending cosine to (1,0)
  }

  test("topKWithinLabel only pairs vectors sharing the coarse cell") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.99f, 0.0f), 1), // closer, but other cell
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.topKWithinLabel(
      df, "vec_id", "embedding", "label", k = 5, queryPred = col("vec_id") === 1L)
      .select("neighbor_id").as[Long].collect()
    assert(got.toSeq == Seq(2L))
  }

  test("ANN sign-LSH recall vs brute force on real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pred = col("vec_id") % 10 === 0
    val k = 5
    val brute = Similarity.bruteForceTopK(
      emb, emb.filter(pred), "vec_id", "embedding", k)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    // multi-probe (own bucket + 1-bit flips) over 4 planes probes
    // 5/16 of the space; recall must beat that baseline meaningfully
    val ann = Similarity.annTopK(
      emb, "vec_id", "embedding", dim = 64, numPlanes = 4, k = k,
      queryPred = pred, probes = 1)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (ann & brute).size.toDouble / brute.size
    assert(recall > 0.3, s"ANN recall $recall vs brute ${brute.size} pairs")
    assert(ann.nonEmpty)
    // hamming-2 probing recovers the two-hyperplane-intersection tail:
    // recall must be monotone in probes, and with 2 flips over 4 planes
    // (11/16 of the space probed) it should approach brute force
    val ann2 = Similarity.annTopK(
      emb, "vec_id", "embedding", dim = 64, numPlanes = 4, k = k,
      queryPred = pred, probes = 2)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall2 = (ann2 & brute).size.toDouble / brute.size
    assert(recall2 >= recall, s"probes=2 recall $recall2 < probes=1 $recall")
    assert(recall2 > 0.6, s"hamming-2 recall $recall2")
  }

  test("ANN plan contains no cartesian product") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = Similarity.annTopK(
      emb, "vec_id", "embedding", 64, 4, 5, col("vec_id") % 10 === 0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("IVF (label-cell) plan joins on the cell key, no cartesian product") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = Similarity.topKWithinLabel(
      emb, "vec_id", "embedding", "label", 5, col("vec_id") % 10 === 0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the top-k is the bounded heap with a map-side partial stage, not
    // a window sort over every scored candidate
    assert(plan.contains("partial_graft_top_k") && !plan.contains("Window"), plan)
  }

  test("heap top-k is pointwise equal to the window formulation on real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pred = col("vec_id") % 7 === 0
    val viaAgg = Similarity.topKWithinLabel(
      emb, "vec_id", "embedding", "label", 5, pred)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val viaWin = Similarity.topKWithinLabelViaWindow(
      emb, "vec_id", "embedding", "label", 5, pred)
      .select("query_id", "neighbor_id", "sim", "rank")
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(viaAgg.nonEmpty && viaAgg == viaWin)
  }

  test("codegen DotProduct is bit-identical to the interpreted fold") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val both = emb.select(
      Similarity.dot($"e", $"e").as("fast"),
      Similarity.dotFold($"e", $"e").as("fold"))
    assert(both.filter($"fast" =!= $"fold").count() == 0)
  }

  test("graft_dot is SQL-callable via SparkSessionExtensions") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .as[Double].head()
    assert(r == 32.0)
  }

  test("cosine of identical vectors is 1.0 after normalization") {
    val df = Seq((1L, Array(3.0f, 4.0f))).toDF("vec_id", "embedding")
    val v = Similarity.withNorm(df, "vec_id", "embedding")
    val sim = v.select(
      Similarity.cosine(col("e"), col("e"), col("nrm"), col("nrm")).as("s"))
      .as[Double].head()
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("int8 quantization: per-component error bound and search recall") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    // range: every quantized component in [-127, 127]
    val outOfRange = q.select(explode(col("qvec")).as("c"))
      .filter(abs(col("c")) > 127).count()
    assert(outOfRange == 0)
    // reconstruction error <= half a quantization step (scale/254)
    val viol = q.join(emb, "vec_id")
      .select(col("scale"),
        array_max(zip_with(
          Similarity.dequantizeInt8(col("qvec"), col("scale")),
          transform(col("embedding"), x => x.cast("double")),
          (a, b) => abs(a - b))).as("err"))
      .filter(col("err") > col("scale") / 254 + 1e-9).count()
    assert(viol == 0, "reconstruction error must stay within half a quant step")
    // search consequence: exact top-5 within cells over DEQUANTIZED
    // vectors recovers almost all of the float top-5 — int8 is a
    // storage format, not a recall trade at 64 dims
    val deq = q.join(emb.select("vec_id", "label"), "vec_id")
      .select(col("vec_id"),
        Similarity.dequantizeInt8(col("qvec"), col("scale")).as("embedding"),
        col("label"))
    val pred = col("vec_id") % 10 === 0
    def pairs(df: org.apache.spark.sql.DataFrame) =
      Similarity.topKWithinLabel(df, "vec_id", "embedding", "label", 5, pred)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(emb)
    val approx = pairs(deq)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.9, s"int8 recall too low: $recall")
  }
  test("centroids are exact means, order- and partition-invariant") {
    val df = Seq(
      ("a", Seq(1.0f, 2.0f)), ("a", Seq(3.0f, 6.0f)),
      ("b", Seq(10.0f, 0.0f))).toDF("label", "embedding")
    def m(d: org.apache.spark.sql.DataFrame) =
      Similarity.centroidByLabel(d, "label", "embedding").collect()
        .map(r => (r.getString(0), r.getInt(1)) -> ((r.getDouble(2), r.getLong(3)))).toMap
    val c = m(df)
    assert(c(("a", 0)) == ((2.0, 2L)) && c(("a", 1)) == ((4.0, 2L)))
    assert(c(("b", 0)) == ((10.0, 1L)) && c(("b", 1)) == ((0.0, 1L)))
    // decimal component sums: bit-identical under any partitioning
    assert(m(df.repartition(7)) == c)
    assert(m(df.orderBy(col("label").desc)) == c)
  }

  test("maxSimTopK: per-query-vector best matches sum (hand-computed), self wins") {
    // group A = axis vectors e1, e2; group B = e1 only; group C = e3.
    // queries = all of A. MaxSim(A→A) = 1+1 = 2 (each vector's best
    // match is itself); MaxSim(A→B) = cos(e1,e1) + cos(e2,e1) = 1+0;
    // MaxSim(A→C) = 0. One strongly-matching member contributes its
    // full cosine — the pooled-vector average would halve it.
    val df = Seq(
      (1L, Seq(1f, 0f, 0f), "A"), (2L, Seq(0f, 1f, 0f), "A"),
      (10L, Seq(1f, 0f, 0f), "B"),
      (20L, Seq(0f, 0f, 1f), "C"),
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.maxSimTopK(df, "vec_id", "embedding", "label",
        queryPred = col("label") === "A", k = 3)
      .select($"query_label", $"doc_label", $"maxsim", $"rank")
      .as[(String, String, Double, Int)].collect()
      .map(r => (r._2, r._4) -> r._3).toMap
    assert(got(("A", 1)) == 2.0, got.toString) // self: both vectors match
    assert(got(("B", 2)) == 1.0, got.toString) // one full-strength chunk
    assert(got(("C", 3)) == 0.0, got.toString)
    // repartition invariance: the one float reduction folds in qid order
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.maxSimTopK(d, "vec_id", "embedding", "label",
          queryPred = col("vec_id") % 5 === 0, k = 3)
        .select($"query_label", $"doc_label", $"maxsim", $"rank")
        .as[(Int, Int, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(run(base.repartition(13)) == run(base.repartition(2)))
  }

  test("maxSimTwoStage reaches the all-pairs form when candidates cover the groups") {
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val nGroups = base.select("label").distinct().count().toInt
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select($"query_label", $"doc_label", $"maxsim", $"rank")
        .as[(Int, Int, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val full = rows(Similarity.maxSimTopK(base, "vec_id", "embedding",
      "label", queryPred = col("vec_id") % 5 === 0, k = 3))
    // candidates = |groups| → the pruning grid is the full grid: every
    // surviving score is bit-equal and the result is identical
    val covered = rows(Similarity.maxSimTwoStage(base, "vec_id", "embedding",
      "label", queryPred = col("vec_id") % 5 === 0,
      candidates = nGroups, k = 3))
    assert(covered == full)
    // aggressive pruning: output shape holds, every kept score equals
    // the all-pairs score for that pair (recall can drop, scores can't)
    val pruned = rows(Similarity.maxSimTwoStage(base, "vec_id", "embedding",
      "label", queryPred = col("vec_id") % 5 === 0, candidates = 3, k = 3))
    val fullScores = full.map(r => (r._1, r._2) -> r._3).toMap ++
      rows(Similarity.maxSimTopK(base, "vec_id", "embedding", "label",
        queryPred = col("vec_id") % 5 === 0, k = nGroups))
        .map(r => (r._1, r._2) -> r._3).toMap
    pruned.foreach { case (q, d2, s2, _) =>
      assert(fullScores((q, d2)) == s2, s"pair ($q,$d2)")
    }
  }

  test("maxSimAnn: probe-monotone recall, bit-equal scores, all-pairs at full coverage") {
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val nGroups = base.select("label").distinct().count().toInt
    val pred = col("vec_id") % 5 === 0
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select($"query_label", $"doc_label", $"maxsim", $"rank")
        .as[(Int, Int, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val full = rows(Similarity.maxSimTopK(base, "vec_id", "embedding",
      "label", queryPred = pred, k = 3))
    // 2 planes + 2-bit probing covers all 4 buckets; candidates =
    // |groups| keeps every ANN survivor → identical to all-pairs
    val covered = rows(Similarity.maxSimAnn(base, "vec_id", "embedding",
      "label", queryPred = pred, dim = 64, numPlanes = 2,
      candidates = nGroups, k = 3, probes = 2))
    assert(covered == full)
    // 3 planes, own-bucket + 1-flip probing: recall vs the all-pairs
    // top-3 is monotone in probes, and kept scores never drift
    val fullPairs = full.map(r => (r._1, r._2)).toSet
    val allScores = rows(Similarity.maxSimTopK(base, "vec_id", "embedding",
      "label", queryPred = pred, k = nGroups))
      .map(r => (r._1, r._2) -> r._3).toMap
    def recallAt(probes: Int): Double = {
      val got = rows(Similarity.maxSimAnn(base, "vec_id", "embedding",
        "label", queryPred = pred, dim = 64, numPlanes = 3,
        candidates = 4, k = 3, probes = probes))
      got.foreach { case (q, d2, s2, _) =>
        assert(allScores((q, d2)) == s2, s"pair ($q,$d2) drifted")
      }
      (got.map(r => (r._1, r._2)).toSet & fullPairs).size.toDouble /
        fullPairs.size
    }
    val r0 = recallAt(0); val r1 = recallAt(1); val r2 = recallAt(2)
    assert(r0 <= r1 && r1 <= r2, s"recall not monotone: $r0 $r1 $r2")
    assert(r2 > 0.5, s"2-flip probing over 3 planes recalls only $r2")
    // the own group always survives as a candidate (the diagonal ride)
    val own = rows(Similarity.maxSimAnn(base, "vec_id", "embedding",
      "label", queryPred = pred, dim = 64, numPlanes = 3,
      candidates = 4, k = 1, probes = 0))
    own.foreach { case (q, d2, _, rk) =>
      assert(rk > 1 || q == d2 || allScores((q, d2)) >= allScores((q, q)),
        s"query $q lost its own group to a worse candidate")
    }
  }

  test("binarizeWords packs sign bits into 32-bit words exactly (Scala reference)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val got = emb.select($"vec_id", $"embedding",
        Similarity.binarizeWords($"embedding".cast("array<double>"), 64).as("bw"))
      .as[(Long, Array[Float], Array[Long])].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, e, bw) =>
      assert(bw.length == 2, s"vec $id: ${bw.length} words")
      val want = (0 until 2).map { w =>
        (0 until 32).map(j => if (e(w * 32 + j) >= 0.0f) 1L << j else 0L).sum
      }
      assert(bw.toSeq == want, s"vec $id packed wrong")
      bw.foreach(v => assert(v >= 0L, s"vec $id: word went negative"))
    }
    // an odd dim pads the top word with zero bits
    val odd = Seq((1L, Array.fill(33)(1.0f))).toDF("vec_id", "embedding")
      .select(Similarity.binarizeWords($"embedding".cast("array<double>"), 33))
      .as[Array[Long]].head()
    assert(odd.toSeq == Seq(0xFFFFFFFFL, 1L))
  }

  test("hammingWords matches a popcount reference and pigeonhole blocking finds every close pair") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val coded = emb.select($"vec_id",
        Similarity.binarizeWords($"embedding".cast("array<double>"), 64).as("bw"))
      .as[(Long, Array[Long])].collect().toMap
    def ref(a: Array[Long], b: Array[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val a = coded.keys.min; val b = coded.keys.max
    val gotH = emb.filter($"vec_id" === a).crossJoin(
        emb.filter($"vec_id" === b).select($"embedding".as("e2")))
      .select(Similarity.hammingWords(
        Similarity.binarizeWords($"embedding".cast("array<double>"), 64),
        Similarity.binarizeWords($"e2".cast("array<double>"), 64)))
      .as[Int].head()
    assert(gotH == ref(coded(a), coded(b)))
    // plant a near-duplicate of vector `a` with 3 sign flips: exactly
    // Hamming 3 from `a`, so with blocks=4 (maxHamming=3) the
    // pigeonhole guarantee says the pair MUST surface
    val base = emb.select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val src = base.filter($"vec_id" === a)
      .select($"embedding").as[Array[Double]].head()
    val planted = src.clone()
    Seq(0, 21, 50).foreach(j => planted(j) = -(planted(j) + 1e-9))
    val plantedId = coded.keys.max + 1000L
    val df = base.union(Seq((plantedId, planted)).toDF("vec_id", "embedding"))
    val pairs = Similarity.binaryNearDupPairs(df, "vec_id", "embedding",
        dim = 64, blocks = 4, maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    val hit = pairs.find(p => p._1 == a && p._2 == plantedId)
    assert(hit.isDefined, s"planted 3-flip neighbor missed: ${pairs.toSeq}")
    assert(hit.get._3 == 3, s"hamming ${hit.get._3} != 3 flips")
    // and its plan blocks on the slice-key equi-join, never all pairs
    val plan = Similarity.binaryNearDupPairs(df, "vec_id", "embedding", 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("binaryTopK: recall monotone in pool, surviving sims bit-equal brute force, code-only candidate exchanges") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pred = col("vec_id") % 10 === 0
    val k = 5
    val brute = Similarity.bruteForceTopK(
        emb, emb.filter(pred), "vec_id", "embedding", k)
      .select($"query_id", $"neighbor_id", $"sim")
      .as[(Long, Long, Double)].collect()
    val brutePairs = brute.map(r => (r._1, r._2)).toSet
    val bruteSim = brute.map(r => (r._1, r._2) -> r._3).toMap
    def run(pool: Int) = Similarity.binaryTopK(emb, "vec_id", "embedding",
        dim = 64, k = k, queryPred = pred, pool = pool)
      .select($"query_id", $"neighbor_id", $"sim")
      .as[(Long, Long, Double)].collect()
    val narrow = run(16); val wide = run(64); val full = run(499)
    // exact re-rank: any pair both tiers kept scores identically
    (narrow ++ wide ++ full).foreach { case (q, n, s) =>
      bruteSim.get((q, n)).foreach(bs => assert(bs == s, s"($q,$n) drifted"))
    }
    def recall(got: Array[(Long, Long, Double)]): Double =
      (got.map(r => (r._1, r._2)).toSet & brutePairs).size.toDouble / brutePairs.size
    val rNarrow = recall(narrow); val rWide = recall(wide)
    assert(rWide >= rNarrow, s"pool=64 recall $rWide < pool=16 $rNarrow")
    assert(rNarrow > 0.3, s"pool=16 recall only $rNarrow")
    // pool = corpus−1 keeps every candidate: the binary tier is a
    // pass-through and the exact re-rank IS brute force, exactly
    assert(full.map(r => (r._1, r._2, r._3)).sorted.toSeq ==
      brute.map(r => (r._1, r._2, r._3)).sorted.toSeq,
      "full-pool binaryTopK != brute force")
    // the candidate tier moves packed words only: no double-array
    // column crosses an exchange in the pool subplan
    val poolPlan = Similarity.binaryPool(emb, "vec_id", "embedding",
      64, pred, 32).queryExecution.executedPlan
    assert(!poolPlan.toString.contains("CartesianProduct"), poolPlan.toString)
    poolPlan.foreach {
      case e: org.apache.spark.sql.execution.exchange.Exchange =>
        e.output.foreach { a =>
          assert(!a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
              || a.name == "bw" || a.name == "qw",
            s"exchange carries a non-code array ${a.name}: ${a.dataType}")
          a.dataType match {
            case org.apache.spark.sql.types.ArrayType(et, _) =>
              assert(et == org.apache.spark.sql.types.LongType,
                s"exchange carries non-packed array ${a.name}: $et")
            case _ =>
          }
        }
      case _ =>
    }
  }
}
