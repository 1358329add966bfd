package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualityFitSpec extends SparkSpec {
  import spark.implicits._

  test("planted linear label is recovered exactly (zero-residual system)") {
    // y = 5 + 3*x1 - 2*x2 exactly, on integer features already in
    // [0,1]-scaled form: feed signals so floor(signal*scale) == x.
    val rows = for {
      a <- 0 to 9; b <- 0 to 9
    } yield (a * 10L + b, a / 100.0, b / 100.0, 5L + 3L * a - 2L * b)
    val df = rows.toDF("doc_id", "s1", "s2", "y")
    val f = QualityFit.fit(df, Seq("s1", "s2"), "y", scale = 100L)
    // exact rational weights: intercept 5, w1 3, w2 -2
    val ws = f.features.zip(f.nums.map(n => (n, f.den))).toMap
    assert(f.den > 0)
    assert(ws("intercept")._1 == BigInt(5) * f.den)
    assert(ws("s1")._1 == BigInt(3) * f.den)
    assert(ws("s2")._1 == BigInt(-2) * f.den)
  }

  test("normal equations hold exactly: G * beta_num == den * m") {
    val rows = Seq(
      (1L, 0.11, 0.92, 1L), (2L, 0.45, 0.33, 0L), (3L, 0.99, 0.01, 0L),
      (4L, 0.02, 0.88, 1L), (5L, 0.50, 0.50, 1L), (6L, 0.73, 0.21, 0L),
      (7L, 0.05, 0.95, 1L), (8L, 0.61, 0.44, 0L), (9L, 0.37, 0.66, 1L),
    )
    val df = rows.toDF("doc_id", "s1", "s2", "y")
    val f = QualityFit.fit(df, Seq("s1", "s2"), "y")
    // rebuild X, y on the driver exactly as the operator scales them
    val data = rows.map { case (_, s1, s2, y) =>
      (Array(BigInt(1),
        BigInt(math.floor(s1 * 100.0).toLong),
        BigInt(math.floor(s2 * 100.0).toLong)), BigInt(y))
    }
    val k = 3
    val g = Array.tabulate(k, k)((i, j) =>
      data.map { case (x, _) => x(i) * x(j) }.sum)
    val m = Array.tabulate(k)(i => data.map { case (x, y) => x(i) * y }.sum)
    for (i <- 0 until k) {
      val lhs = (0 until k).map(j => g(i)(j) * f.nums(j)).sum
      assert(lhs == f.den * m(i), s"normal equation row $i violated")
    }
  }

  test("scoreDetScaled keep is the exact rational decision at threshold 1/2") {
    val rows = Seq(
      (1L, 0.10, 0.90, 1L), (2L, 0.80, 0.10, 0L), (3L, 0.20, 0.70, 1L),
      (4L, 0.90, 0.05, 0L), (5L, 0.15, 0.85, 1L), (6L, 0.70, 0.30, 0L),
    )
    val df = rows.toDF("doc_id", "s1", "s2", "y")
    val f = QualityFit.fit(df, Seq("s1", "s2"), "y")
    val scored = QualityFit.scoreDetScaled(df, f)
      .orderBy("doc_id").collect()
    scored.foreach { r =>
      val scoreNum = BigInt(r.getDecimal(1).toBigInteger)
      // keep ⟺ score_num/den ≥ 1/2 ⟺ 2·score_num ≥ den exactly
      assert(r.getBoolean(2) == (scoreNum * 2 >= f.den),
        s"${r.getLong(0)}: $scoreNum vs den ${f.den}")
    }
    // the clean separation keeps the y=1 rows and drops the y=0 rows
    val kept = scored.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 5L), kept.toString)
    // a custom threshold moves the decision line exactly
    val strict = QualityFit.scoreDetScaled(df, f, "doc_id", 9L, 10L)
      .orderBy("doc_id").collect()
    strict.foreach { r =>
      val scoreNum = BigInt(r.getDecimal(1).toBigInteger)
      assert(r.getBoolean(2) == (scoreNum * 10 >= f.den * 9))
    }
  }

  test("fit is partitioning-invariant (order-free decimal Gram)") {
    val rows = (1 to 200).map { i =>
      (i.toLong, (i % 17) / 17.0, (i % 23) / 23.0, (i % 3).toLong)
    }
    val df = rows.toDF("doc_id", "s1", "s2", "y")
    val f1 = QualityFit.fit(df, Seq("s1", "s2"), "y")
    val f2 = QualityFit.fit(df.repartition(13, col("s2")), Seq("s1", "s2"), "y")
    assert(f1.nums == f2.nums && f1.den == f2.den)
  }

  test("collinear features are refused loudly") {
    val df = Seq((1L, 0.5, 0.5, 1L), (2L, 0.5, 0.5, 0L))
      .toDF("doc_id", "s1", "s2", "y")
    val e = intercept[IllegalArgumentException] {
      QualityFit.fit(df, Seq("s1", "s2"), "y")
    }
    assert(e.getMessage.contains("singular"))
  }

  test("21-signal-wide fit: Gram solve stays exact at catalog width") {
    // 8 features exercises the BigInt path well past the oracle's 4x4
    val rows = (1 to 300).map { i =>
      val fs = (1 to 8).map(j => ((i * j) % 101) / 101.0)
      (i.toLong, fs, if ((i * 7) % 5 < 2) 1L else 0L)
    }
    val df = rows.toDF("doc_id", "fs", "y")
      .select(col("doc_id") +: (0 until 8)
        .map(j => col("fs").getItem(j).as(s"f$j")) :+ col("y"): _*)
    val f = QualityFit.fit(df, (0 until 8).map(j => s"f$j"), "y")
    assert(f.den > 0 && f.nums.length == 9)
    // residual orthogonality: Xᵀ(den*y - X*nums) == 0 exactly
    val data = rows.map { case (_, fs, y) =>
      (BigInt(1) +: fs.map(v => BigInt(math.floor(v * 100.0).toLong)),
        BigInt(y))
    }
    for (i <- 0 until 9) {
      val lhs = data.map { case (x, y) =>
        x(i) * (f.den * y - x.zip(f.nums).map { case (a, b) => a * b }.sum)
      }.sum
      assert(lhs == 0, s"orthogonality violated at feature $i")
    }
  }

  test("weightsDf encodes det-scaled integers past 20 digits (the sf0.1 regression)") {
    // dets grow ~ (N·scale²)^k: real fits exceed DECIMAL(38,18)'s 20
    // integral digits fast — the artifact table must carry (38,0)
    val wide = BigInt("123456789012345678901234567890") // 30 digits
    val f = QualityFit.Fit(Seq("intercept", "a"), Seq(wide, -wide), wide * 7,
      nRows = 10L, scale = 100L)
    val got = QualityFit.weightsDf(spark, f)
      .select(col("feature"), col("num").cast("string"),
        col("den").cast("string"))
      .as[(String, String, String)].collect().toList
    assert(got == List(
      ("a", (-wide).toString, (wide * 7).toString),
      ("intercept", wide.toString, (wide * 7).toString)), got.toString)
    // a fit past 38 digits refuses loudly instead of corrupting
    val over = BigInt(10).pow(39)
    val e = intercept[IllegalArgumentException] {
      QualityFit.weightsDf(spark,
        QualityFit.Fit(Seq("intercept"), Seq(over), over, 1L, 100L))
    }
    assert(e.getMessage.contains("DECIMAL(38,0)"), e.getMessage)
  }
}
