package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style tests: ScalaCheck generators sampled deterministically
  * (fixed seed, no flake) against library invariants that single
  * examples cannot pin down. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val vocab = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi")
  private val docGen: Gen[String] =
    Gen.chooseNum(3, 60).flatMap(k => Gen.listOfN(k, vocab)).map(_.mkString(" "))

  test("property: minhash agreement tracks true shingle jaccard") {
    val docs = sample(docGen, 30, seed = 7L)
    // pair each doc with a mutation of itself (high jaccard) and with
    // the next doc (arbitrary jaccard)
    val pairs = docs.sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq ++
      docs.map(d => (d, d.split(" ").updated(0, "MUT").mkString(" ")))
    val df = pairs.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "ta", "tb")
      .select(
        col("id"),
        TextOps.shingleHashes(col("ta"), 3).as("sa"),
        TextOps.shingleHashes(col("tb"), 3).as("sb"))
      .filter(size(col("sa")) > 0 && size(col("sb")) > 0)
    val withSig = df.select(
      col("id"),
      Dedup.jaccard(col("sa"), col("sb")).as("truej"),
      Dedup.minhashSignature(col("sa").cast("array<string>"), 48).as("siga"),
      Dedup.minhashSignature(col("sb").cast("array<string>"), 48).as("sigb"))
    val rows = withSig.collect()
    assert(rows.length > 20)
    val errs = rows.map { r =>
      val est = r.getSeq[Long](2).zip(r.getSeq[Long](3)).count { case (x, y) => x == y } / 48.0
      math.abs(est - r.getDouble(1))
    }
    // individual estimates are ±1/sqrt(48)≈0.14-grade noisy; the MEAN
    // error over 20+ pairs must be well inside that
    assert(errs.sum / errs.length < 0.12, s"mean err ${errs.sum / errs.length}")
  }

  test("property: shingle count bounded by token count and free of dups") {
    val docs = sample(docGen, 40, seed = 11L)
    val rows = docs.zipWithIndex.map(_.swap).toDF("id", "text")
      .select(
        TextOps.tokenCount(col("text")).as("tc"),
        TextOps.shingleHashes(col("text"), 3).as("sh"))
      .collect()
    rows.foreach { r =>
      val tc = r.getInt(0)
      val sh = r.getSeq[Long](1)
      assert(sh.length <= math.max(tc - 2, 0))
      assert(sh.distinct.length == sh.length)
      assert(sh.forall(h => h >= 0 && h < TextOps.ShingleM))
    }
  }

  test("property: salted aggregation equals plain aggregation on random frames") {
    val kv = for {
      k <- Gen.chooseNum(0, 8)
      v <- Gen.chooseNum(-1000, 1000)
    } yield (s"k$k", v.toLong)
    val data = sample(kv, 400, seed = 23L)
    val df = data.toDF("key", "v")
    val plain = df.groupBy("key")
      .agg(sum($"v").as("s"), min($"v").as("mn"), max($"v").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val salted = graft.ops.Skew.saltedAgg(
      df, Seq("key"), $"v",
      Map("s" -> ($"v", "sum"), "mn" -> ($"v", "min"), "mx" -> ($"v", "max")),
      salts = 5)
      .select("key", "s", "mn", "mx")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(plain == salted)
  }

  test("property: text ops never throw and stay in range on arbitrary unicode") {
    val weird = sample(Gen.listOfN(30, Gen.asciiPrintableChar).map(_.mkString) :| "ascii", 20, 31L) ++
      sample(Gen.listOfN(10, Gen.choose(0x20.toChar, 0x2FFF.toChar)).map(_.mkString), 20, 37L) ++
      Seq("", " ", "\t\n", "ç”° 中 æ–‡  mixed ascii", "emoji 🙂 text")
    val rows = weird.zipWithIndex.map(_.swap).toDF("id", "text")
      .select(
        TextOps.alphaRatio(col("text")).as("ar"),
        TextOps.stopwordRatio(TextOps.tokens(col("text")), "en").as("sr"),
        TextOps.langGuess(TextOps.tokens(col("text"))).as("lg"),
        TextOps.qualityKeep(col("text")).as("keep"),
        TextOps.shingleHashes(col("text"), 3).as("sh"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
      assert(Set("en", "es", "de", "fr", "zh", "und").contains(r.getString(2)))
    }
  }
}
