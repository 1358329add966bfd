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

  test("contracts refuse: bad dims") {
    intercept[IllegalArgumentException] {
      Projection.projectColumn(col("e"), 0, 8)
    }
  }
}
