package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Random sign projection (X227): deterministic matrix, exact hand
  * replay, and the JL property — pairwise inner products are
  * approximately preserved at k=16 over d=64. */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("projection replays by hand: signs from md5 parity, scaled dot") {
    val d = 8
    val k = 4
    val vec = Array.tabulate(d)(i => (i + 1).toFloat / 4f)
    val signs = Projection.signMatrix(k, d)
    // the matrix is deterministic and mixed (not all one sign)
    assert(signs.flatten.toSet == Set(1.0, -1.0))
    assert(Projection.signMatrix(k, d).map(_.toSeq).toSeq ==
      signs.map(_.toSeq).toSeq)
    val got = Seq((1L, vec)).toDF("id", "e")
      .select(Projection.projectColumn(col("e"), k, d).as("p"))
      .head().getSeq[Double](0)
    val want = (0 until k).map { j =>
      var acc = 0.0
      (0 until d).foreach(i => acc += vec(i).toDouble * signs(j)(i))
      acc * (1.0 / math.sqrt(k.toDouble))
    }
    assert(got == want)
  }

  test("JL property: inner products approximately preserved at k=16") {
    val d = 64
    val k = 16
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 40).map { i =>
      val raw = Array.fill(d)(rnd.nextGaussian())
      val n = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(x => (x / n).toFloat))
    }
    val proj = Projection.project(vecs.toDF("id", "e"), "id", "e", k, d)
      .as[(Long, Seq[Double])].collect().toMap
    def dotD(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    // unit vectors: |<pa,pb>·k/k − <a,b>| stays within a loose JL band
    // on average (individual pairs fluctuate; the MEAN error is small)
    val errs = for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
    } yield {
      val exact = dotD(va.map(_.toDouble).toSeq, vb.map(_.toDouble).toSeq)
      val approx = dotD(proj(ia), proj(ib))
      math.abs(approx - exact)
    }
    val mean = errs.sum / errs.size
    assert(mean < 0.25, s"mean inner-product distortion too large: $mean")
    // self inner product ≈ 1 on average
    val selfs = vecs.map { case (i, v) => dotD(proj(i), proj(i)) }
    val meanSelf = selfs.sum / selfs.size
    assert(math.abs(meanSelf - 1.0) < 0.3, s"mean self-norm² drifted: $meanSelf")
  }

  test("projected-rerank ANN: recall monotone in pool, full pool ≡ exact") {
    val d = 64
    val rnd = new scala.util.Random(5)
    // clustered vectors so neighborhoods are meaningful
    val centers = Array.fill(4)(Array.fill(d)(rnd.nextGaussian()))
    val vecs = (0 until 120).map { i =>
      val c = centers(i % 4)
      val raw = c.zip(Array.fill(d)(rnd.nextGaussian() * 0.3)).map(t => t._1 + t._2)
      val n = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(x => (x / n).toFloat), i % 2) // 2 label cells
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    val pred = col("vec_id") % 10 === 0
    val exact = Similarity.topKWithinLabel(df, "vec_id", "embedding", "label",
        k = 5, queryPred = pred)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def servedAt(poolK: Int): Set[(Long, Long)] =
      Projection.annProjectedRerank(df, "vec_id", "embedding", "label",
          k = 5, poolK = poolK, projK = 16, d = d, queryPred = pred)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val r8 = (servedAt(8) intersect exact).size.toDouble / exact.size
    val r20 = (servedAt(20) intersect exact).size.toDouble / exact.size
    assert(r20 >= r8, s"recall must not fall as the pool widens: $r8 -> $r20")
    assert(r8 > 0.5, s"projected pool at 8 should already recall half: $r8")
    // corpus-wide pool: stage 1 cannot lose anyone → exact equality
    assert(servedAt(120) == exact, "full pool must reproduce exact search")
  }

  test("contracts refuse: bad dims") {
    intercept[IllegalArgumentException] {
      Projection.projectColumn(col("e"), 0, 8)
    }
  }
}
